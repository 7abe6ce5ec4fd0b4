"""SE(3)/SO(3) ops tests.

Carries forward the reference test strategy (tests/test_pose_utils.py:4-10:
random SO(3)+t, T^{-1}T ~ I) and extends it to the Lie-group machinery the
TPU solvers use.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpleslam_tpu.ops import se3


def _random_rotation(rng: np.random.Generator) -> np.ndarray:
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pose_inverse_roundtrip(seed):
    rng = np.random.default_rng(seed)
    R = _random_rotation(rng)
    t = rng.normal(size=3)
    T = np.asarray(se3.rt_to_T(jnp.asarray(R), jnp.asarray(t)))
    Tinv = np.asarray(se3.T_inverse(jnp.asarray(T)))
    np.testing.assert_allclose(Tinv @ T, np.eye(4), atol=1e-6)


def test_pose_inverse_batched():
    rng = np.random.default_rng(0)
    Rs = np.stack([_random_rotation(rng) for _ in range(5)])
    ts = rng.normal(size=(5, 3))
    T = se3.rt_to_T(jnp.asarray(Rs), jnp.asarray(ts))
    Tinv = se3.T_inverse(T)
    np.testing.assert_allclose(np.asarray(Tinv @ T), np.broadcast_to(np.eye(4), (5, 4, 4)), atol=1e-6)


def test_project_to_SO3():
    rng = np.random.default_rng(1)
    R = _random_rotation(rng) + 0.05 * rng.normal(size=(3, 3))
    Rp = np.asarray(se3.project_to_SO3(jnp.asarray(R)))
    np.testing.assert_allclose(Rp @ Rp.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(Rp) > 0.99


def test_quat_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(20):
        R = _random_rotation(rng)
        q = np.asarray(se3.rotmat_to_quat(jnp.asarray(R)))
        assert q[3] >= 0.0  # xyzw, w >= 0 sign-canonical (reference convention)
        R2 = np.asarray(se3.quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-6)


def test_quat_trans_pose_roundtrip():
    rng = np.random.default_rng(3)
    R = _random_rotation(rng)
    t = rng.normal(size=3)
    T = np.asarray(se3.rt_to_T(jnp.asarray(R), jnp.asarray(t)))
    q, tt = se3.pose_to_quat_trans(jnp.asarray(T))
    T2 = np.asarray(se3.quat_trans_to_pose(q, tt))
    np.testing.assert_allclose(T2, T, atol=1e-6)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(4)
    for scale in [1e-8, 1e-4, 0.1, 1.0, 3.0]:
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * scale
        R = np.asarray(se3.so3_exp(jnp.asarray(w)))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        w2 = np.asarray(se3.so3_log(jnp.asarray(R)))
        np.testing.assert_allclose(w2, w, atol=1e-5)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(5)
    for _ in range(10):
        xi = rng.normal(size=6)
        T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
        xi2 = np.asarray(se3.se3_log(jnp.asarray(T)))
        np.testing.assert_allclose(xi2, xi, atol=1e-5)


def test_se3_exp_small_angle():
    xi = jnp.zeros(6).at[0].set(0.5)  # pure translation
    T = np.asarray(se3.se3_exp(xi))
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-8)
    np.testing.assert_allclose(T[:3, 3], [0.5, 0, 0], atol=1e-8)


def test_rotation_angle_deg():
    w = np.array([0.0, 0.0, np.deg2rad(30.0)])
    R = se3.so3_exp(jnp.asarray(w))
    assert abs(float(se3.rotation_angle_deg(R)) - 30.0) < 1e-4


def test_camera_center():
    rng = np.random.default_rng(6)
    R = _random_rotation(rng)
    C = rng.normal(size=3)          # camera center in world
    t = -R @ C                       # T_cw translation
    T = se3.rt_to_T(jnp.asarray(R), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(se3.camera_center(T)), C, atol=1e-6)


def test_transform_points_convention():
    # x_cam = R @ X_w + t  (reference convention, ba_utils.py:6)
    rng = np.random.default_rng(7)
    R = _random_rotation(rng)
    t = rng.normal(size=3)
    X = rng.normal(size=(10, 3))
    T = se3.rt_to_T(jnp.asarray(R), jnp.asarray(t))
    got = np.asarray(se3.transform_points(T, jnp.asarray(X)))
    np.testing.assert_allclose(got, X @ R.T + t, atol=1e-6)


def test_jit_compatible():
    f = jax.jit(lambda T: se3.se3_log(se3.T_inverse(T)))
    T = se3.rt_to_T(jnp.eye(3), jnp.ones(3))
    out = f(T)
    assert out.shape == (6,)
