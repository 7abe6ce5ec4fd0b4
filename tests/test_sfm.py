"""Offline SfM batch API test (reference prototype parity: keyframe
pre-pass, E-chained poses, triangulation, ATE/RTE report, checkpoint PNGs)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from simpleslam_tpu.config import SLAMConfig
from simpleslam_tpu.tools.sfm import StructureFromMotion
from simpleslam_tpu.tools.synth import (DEFAULT_K, CorridorScene,
                                        make_trajectory)


def test_sfm_batch_pipeline(tmp_path):
    n_frames = 10
    # full sensor width: the narrow crop sees only the far wall, whose
    # parallax is legitimately below the triangulation gate
    scene = CorridorScene(seed=4, hw=(160, 1226))
    T_wc = make_trajectory(n_frames, speed=0.8, yaw_rate_deg=0.0)
    frames = [scene.render(T_wc[i]) for i in range(n_frames)]

    cfg = SLAMConfig(max_features=512, headless=True)
    # low survival threshold -> KF gaps reach max_gap, giving the 3x
    # baselines forward motion needs to clear the parallax gate
    sfm = StructureFromMotion(cfg, DEFAULT_K, kf_survival=0.4, kf_max_gap=3)
    sfm.add_frames(frames)
    gt = T_wc[:, :3, :4]
    res = sfm.run(gt_T=gt, out_dir=str(tmp_path), run_gba=True)

    assert len(res.kf_frames) >= 4
    assert res.n_landmarks > 40
    assert res.ate is not None and res.ate < 1.0
    assert res.rte_rot_deg is not None and res.rte_rot_deg < 5.0
    assert os.path.exists(os.path.join(tmp_path, "sfm_final.png"))
