"""Host-side visualization (2D trajectory, track overlays, pause/step UI,
optional 3D map view). Not TPU compute — kept API-compatible with the
reference's visualization layer (slam/core/visualization_utils.py)."""
from .trajectory2d import Trajectory2D  # noqa: F401
from .ui import VizUI  # noqa: F401
from .tracks import draw_tracks  # noqa: F401
from .viz3d import Visualizer3D  # noqa: F401
