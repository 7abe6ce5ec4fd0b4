"""Learned-pipeline e2e robustness: the full driver must run headless with
the ALIKED+LightGlue front-end (random weights) without crashing — the
bootstrap gate is expected to reject weak/untrained matches gracefully
rather than corrupting state."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from simpleslam_tpu.config import SLAMConfig
from simpleslam_tpu.data import Sequence
from simpleslam_tpu.run_slam import SLAMSystem
from simpleslam_tpu.tools.synth import generate_kitti_sequence


def test_learned_pipeline_runs_headless(tmp_path):
    base = str(tmp_path)
    generate_kitti_sequence(base, n_frames=6, seed=9, hw=(128, 256), speed=0.5)
    cfg = SLAMConfig(dataset="kitti", base_dir=base, use_lightglue=True,
                     max_features=256, headless=True, no_viz3d=True,
                     min_conf=0.1)
    seq = Sequence.load(cfg)
    sys_ = SLAMSystem(cfg, seq.K, seq.D, img_hw=seq.frame(0).shape[:2])
    prev = sys_.process_frame(0, seq.frame(0), None)
    for i in range(1, 6):
        prev = sys_.process_frame(i, seq.frame(i), prev)
    # with random weights the bootstrap may or may not fire; the invariant is
    # graceful state: no crash, pose list consistent with frame ids
    assert len(sys_.world_map.poses) == len(sys_.frame_ids)
    assert sys_.detector.learned and sys_.matcher.learned
