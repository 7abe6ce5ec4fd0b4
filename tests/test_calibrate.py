"""Zhang-calibration tests on synthetic boards with exact ground truth."""
import numpy as np
import jax.numpy as jnp

from simpleslam_tpu.ops import se3
from simpleslam_tpu.tools.calibrate import (calibrate_camera,
                                            chessboard_object_points,
                                            zhang_intrinsics)


def _render_views(K_gt, D_gt, n_views=6, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    obj = chessboard_object_points(9, 6, 0.03)
    img_pts = []
    for v in range(n_views):
        w = rng.normal(size=3) * 0.25
        t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1),
                      rng.uniform(0.4, 0.8)])
        R = np.asarray(se3.so3_exp(jnp.asarray(w, jnp.float32)))
        pc = obj @ R.T + t
        x = pc[:, 0] / pc[:, 2]
        y = pc[:, 1] / pc[:, 2]
        r2 = x * x + y * y
        k1, k2, p1, p2, k3 = D_gt
        rad = 1 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
        xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        uv = np.stack([K_gt[0, 0] * xd + K_gt[0, 2],
                       K_gt[1, 1] * yd + K_gt[1, 2]], -1)
        uv += rng.normal(0, noise, uv.shape)
        img_pts.append(uv)
    return obj, np.stack(img_pts)


def test_calibrate_no_distortion():
    K_gt = np.array([[600.0, 0, 320], [0, 610.0, 240], [0, 0, 1]])
    obj, img_pts = _render_views(K_gt, np.zeros(5), noise=0.0)
    K, D, rms, Ts = calibrate_camera(obj, img_pts, refine_iters=25)
    assert rms < 0.05
    assert abs(K[0, 0] - 600) < 2.0 and abs(K[1, 1] - 610) < 2.0
    assert abs(K[0, 2] - 320) < 2.0 and abs(K[1, 2] - 240) < 2.0
    assert np.abs(D[:2]).max() < 0.01


def test_calibrate_with_distortion_and_noise():
    K_gt = np.array([[580.0, 0, 310], [0, 585.0, 250], [0, 0, 1]])
    D_gt = np.array([-0.25, 0.08, 1e-3, -5e-4, 0.0])
    obj, img_pts = _render_views(K_gt, D_gt, n_views=8, noise=0.3, seed=1)
    K, D, rms, Ts = calibrate_camera(obj, img_pts, refine_iters=40)
    assert rms < 0.6                  # down to the injected noise level
    assert abs(K[0, 0] - 580) < 10.0  # ~1.5% with 0.3 px corner noise
    assert abs(D[0] - (-0.25)) < 0.03
    assert abs(D[1] - 0.08) < 0.1


def test_zhang_closed_form_alone():
    K_gt = np.array([[500.0, 0, 300], [0, 505.0, 220], [0, 0, 1]])
    obj, img_pts = _render_views(K_gt, np.zeros(5), n_views=5, seed=2)
    from simpleslam_tpu.ops.epipolar import fit_homography
    Hs = [np.asarray(fit_homography(jnp.asarray(obj[:, :2], jnp.float32),
                                    jnp.asarray(img_pts[v], jnp.float32)),
                     np.float64) for v in range(5)]
    K0 = zhang_intrinsics(Hs)
    assert abs(K0[0, 0] - 500) < 15.0   # closed form is a coarse init
    assert abs(K0[0, 2] - 300) < 15.0
