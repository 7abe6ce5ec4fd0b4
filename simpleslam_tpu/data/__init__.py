"""Host-side dataset layer: sequences, calibration, ground truth.

Behavior-compatible with the reference data layer
(reference: slam/core/dataloader.py:23-346). IO is host-side by design —
SURVEY.md §2 keeps image decode on the host; the TPU compute path starts at
the feature front-end.
"""
from .dataloader import (  # noqa: F401
    load_sequence,
    load_frame_pair,
    load_stereo_paths,
    load_calibration,
    load_groundtruth,
    Prefetcher,
    Sequence,
)
