import numpy as np
import jax.numpy as jnp

from simpleslam_tpu.ops import projection, se3

K = jnp.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])


def test_project_points_identity():
    X = jnp.array([[0.0, 0.0, 2.0], [0.5, -0.25, 5.0], [0.0, 0.0, -1.0]])
    uv, z, front = projection.project_points(X, jnp.eye(4), K)
    np.testing.assert_allclose(np.asarray(uv[0]), [320.0, 240.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(uv[1]), [320 + 500 * 0.1, 240 - 500 * 0.05], atol=1e-4)
    assert bool(front[0]) and bool(front[1]) and not bool(front[2])
    np.testing.assert_allclose(np.asarray(z[:2]), [2.0, 5.0], atol=1e-6)


def test_project_points_with_pose():
    rng = np.random.default_rng(0)
    w = rng.normal(size=3) * 0.2
    t = rng.normal(size=3)
    T = se3.rt_to_T(se3.so3_exp(jnp.asarray(w)), jnp.asarray(t))
    X = jnp.asarray(rng.normal(size=(20, 3)) + np.array([0, 0, 10.0]))
    uv, z, front = projection.project_points(X, T, K)
    # manual
    R = np.asarray(T[:3, :3]); tt = np.asarray(T[:3, 3])
    Xc = np.asarray(X) @ R.T + tt
    exp_uv = Xc[:, :2] / Xc[:, 2:3] * 500.0 + np.array([320.0, 240.0])
    np.testing.assert_allclose(np.asarray(uv)[Xc[:, 2] > 0], exp_uv[Xc[:, 2] > 0], atol=1e-3)


def test_undistort_distort_roundtrip():
    D = jnp.array([-0.3, 0.1, 1e-3, -5e-4, 0.0])
    uv = jnp.array([[100.0, 80.0], [320.0, 240.0], [500.0, 400.0]])
    dist = projection.distort_points(uv, K, D)
    und = projection.undistort_points(dist, K, D, P=K, iters=20)
    np.testing.assert_allclose(np.asarray(und), np.asarray(uv), atol=1e-3)


def test_undistort_points_no_dist_is_normalize():
    uv = jnp.array([[320.0, 240.0], [820.0, 740.0]])
    xy = projection.undistort_points(uv, K)
    np.testing.assert_allclose(np.asarray(xy), [[0, 0], [1.0, 1.0]], atol=1e-6)


def test_remap_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 255, size=(24, 32), dtype=np.uint8))
    yy, xx = np.mgrid[0:24, 0:32].astype(np.float32)
    out = projection.remap_bilinear(img, jnp.asarray(xx), jnp.asarray(yy))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_undistort_rectify_map_zero_dist():
    mapx, mapy = projection.undistort_rectify_map(K, jnp.zeros(5), K, (32, 24))
    yy, xx = np.mgrid[0:24, 0:32].astype(np.float32)
    np.testing.assert_allclose(np.asarray(mapx), xx, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mapy), yy, atol=1e-4)
