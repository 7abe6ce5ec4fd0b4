"""Keyframe 2D-3D relocalization (the reference's unimplemented
'trigger relocalization here in the future' hook, main_revamped.py:501).

Mechanism test: bootstrap a map on a synthetic corridor, then ask the
driver to relocalize a frame whose features are exactly the last
keyframe's — with a badly wrong pose prediction. The KF keypoints observe
known landmarks, so PnP must recover the keyframe's pose regardless of the
prediction.
"""
import numpy as np
import pytest

from simpleslam_tpu.config import parse_config
from simpleslam_tpu.run_slam import SLAMSystem
from simpleslam_tpu.tools.synth import (CorridorScene, DEFAULT_K,
                                        make_trajectory)


@pytest.fixture(scope="module")
def bootstrapped():
    H, W = 180, 410
    s = W / 1232.0
    K = DEFAULT_K.copy()
    K[0] *= s
    K[1] *= s
    K[1, 2] = 0.487 * H
    scene = CorridorScene(seed=0, hw=(H, W), K=K)
    T = make_trajectory(8, speed=0.5, yaw_rate_deg=0.3)
    frames = [scene.render(T[i]) for i in range(8)]

    cfg = parse_config(["--dataset", "kitti", "--headless", "--no_viz3d",
                        "--max_features", "512", "--map_capacity", "2048"])
    system = SLAMSystem(cfg, K, None, img_hw=(H, W))
    prev = system.process_frame(0, frames[0], None)
    i = 1
    while i < len(frames) and not system.initialised:
        prev = system.process_frame(i, frames[i], prev)
        i += 1
    assert system.initialised
    return system


def test_relocalize_recovers_kf_pose(bootstrapped):
    system = bootstrapped
    kf = system.kfs[-1]
    T_kf = np.asarray(kf.pose, np.float64)
    # wildly wrong prediction: translated 5 m and rotated
    T_bad = T_kf.copy()
    T_bad[:3, 3] += [5.0, 2.0, -3.0]

    n_poses = len(system.world_map.poses)
    ok = system._relocalize(99, kf.feats, T_bad)
    assert ok
    T_rec = system.world_map.poses[-1]
    assert len(system.world_map.poses) == n_poses + 1
    # recovered the keyframe's pose, not the bad prediction (the 6-m-off
    # guess). Bound reflects the low-res fixture's PnP precision: measured
    # 7 cm on the anti-aliased render (was 2 cm on the old aliased one,
    # whose fake far-field corners over-constrained PnP).
    err_t = np.linalg.norm(T_rec[:3, 3] - T_kf[:3, 3])
    assert err_t < 0.15
    err_bad = np.linalg.norm(T_rec[:3, 3] - T_bad[:3, 3])
    assert err_bad > 1.0


def test_no_reloc_flag():
    cfg = parse_config(["--dataset", "kitti", "--no_reloc"])
    assert cfg.reloc is False
    assert parse_config(["--dataset", "kitti"]).reloc is True
