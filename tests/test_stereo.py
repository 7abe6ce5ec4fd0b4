"""Stereo disparity + metric stereo VO tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from simpleslam_tpu.config import SLAMConfig
from simpleslam_tpu.ops.stereo import (depth_from_disparity,
                                       disparity_block_match,
                                       keypoints_to_3d, sample_disparity)
from simpleslam_tpu.stereo import StereoTracker
from simpleslam_tpu.tools.synth import CorridorScene, make_trajectory


def _texture(rng, H, W):
    img = np.zeros((H, W), np.float32)
    for _ in range(30):
        fx, fy = rng.uniform(0.05, 0.5, 2)
        ph = rng.uniform(0, 6.28)
        yy, xx = np.mgrid[0:H, 0:W]
        img += rng.uniform(5, 20) * np.sin(fx * xx + fy * yy + ph)
    img -= img.min()
    return img / img.max() * 255


def test_disparity_constant_shift():
    rng = np.random.default_rng(0)
    H, W, d_true = 64, 160, 12
    left = _texture(rng, H, W)
    right = np.zeros_like(left)
    right[:, :W - d_true] = left[:, d_true:]   # right view shifted left
    disp, valid = disparity_block_match(jnp.asarray(left), jnp.asarray(right),
                                        max_disp=32, block=9)
    disp = np.asarray(disp)
    valid = np.array(valid)                    # writable host copy
    valid[:, W - d_true - 8:] = False          # ignore the wrap border
    assert valid.sum() > 1000
    err = np.abs(disp[valid] - d_true)
    assert np.median(err) < 0.3


def test_depth_and_backprojection():
    disp = jnp.asarray(np.full((10, 10), 10.0, np.float32))
    valid = jnp.ones((10, 10), bool)
    z = depth_from_disparity(disp, fx=500.0, baseline=0.5, valid=valid)
    np.testing.assert_allclose(np.asarray(z), 25.0)
    K = jnp.asarray(np.array([[500.0, 0, 5], [0, 500.0, 5], [0, 0, 1]]),
                    jnp.float32)
    kp = jnp.asarray(np.array([[5.0, 5.0]]), jnp.float32)
    d_at, ok = sample_disparity(disp, valid, kp)
    X = keypoints_to_3d(kp, d_at, K, 0.5)
    np.testing.assert_allclose(np.asarray(X)[0], [0, 0, 25.0], atol=1e-4)


@pytest.mark.slow
def test_stereo_tracker_metric_scale():
    cv2 = pytest.importorskip("cv2")
    # corridor sequence rendered from left + right (baseline 0.5 m) cameras
    baseline = 0.54
    hw = (150, 400)
    scene = CorridorScene(seed=2, hw=hw)
    T = make_trajectory(6, speed=0.5, yaw_rate_deg=0.0)
    offs = np.eye(4); offs[0, 3] = baseline     # right cam at +x in cam frame
    lefts = [scene.render(T[i]) for i in range(6)]
    rights = [scene.render(T[i] @ offs) for i in range(6)]

    cfg = SLAMConfig(max_features=512, pnp_min_inliers=20, headless=True)
    from simpleslam_tpu.tools.synth import DEFAULT_K
    tr = StereoTracker(cfg, DEFAULT_K, baseline=baseline, max_disp=64)
    for L, R in zip(lefts, rights):
        tr.step(L, R)
    assert len(tr.poses) == 6
    assert tr.n_tracked >= 4
    # METRIC translation magnitude ~0.5 m per frame (monocular can't do this)
    steps = []
    for a, b in zip(tr.poses[:-1], tr.poses[1:]):
        rel = b @ np.linalg.inv(a)
        steps.append(np.linalg.norm(rel[:3, 3]))
    steps = np.asarray(steps[1:])   # first step may include init
    assert np.abs(np.median(steps) - 0.5) < 0.1, steps
