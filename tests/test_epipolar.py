"""Epipolar geometry tests on synthetic two-view scenes with exact GT.

Covers the cv2 replacements: find_homography / find_fundamental /
find_essential (batched RANSAC), recover_pose_essential (cheirality vote),
decompose_homography (Faugeras) — reference: two_view_bootstrap.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpleslam_tpu.ops import epipolar, se3

K = jnp.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])


def _two_view_scene(rng, n=100, planar=False, rot=(0.02, -0.03, 0.01),
                    trans=(0.5, 0.1, 0.05), n_out=0, noise=0.0):
    """World = cam0. Returns (p0, p1, R, t, X)."""
    if planar:
        X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      np.full(n, 6.0)], axis=1)
        # tilt the plane a little
        X[:, 2] += 0.3 * X[:, 0]
    else:
        X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      rng.uniform(4, 10, n)], axis=1)
    R = np.asarray(se3.so3_exp(jnp.asarray(rot, jnp.float32)))
    t = np.asarray(trans)
    Kn = np.asarray(K)
    p0 = (X @ Kn.T)
    p0 = p0[:, :2] / p0[:, 2:3]
    X1 = X @ R.T + t
    p1 = (X1 @ Kn.T)
    p1 = p1[:, :2] / p1[:, 2:3]
    if noise:
        p0 = p0 + rng.normal(scale=noise, size=p0.shape)
        p1 = p1 + rng.normal(scale=noise, size=p1.shape)
    if n_out:
        out = rng.choice(n, n_out, replace=False)
        p1[out] += rng.uniform(30, 120, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return (jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32),
            R, t, X, (np.zeros(n, bool) if not n_out else np.isin(np.arange(n), out)))


def test_fit_fundamental_epipolar_constraint():
    rng = np.random.default_rng(0)
    p0, p1, R, t, X, _ = _two_view_scene(rng, n=40)
    F = epipolar.fit_fundamental(p0, p1)
    res = np.asarray(epipolar.sampson_error_sq(F, p0, p1))
    assert np.sqrt(res).max() < 0.05


def test_fit_homography_planar():
    rng = np.random.default_rng(1)
    p0, p1, *_ = _two_view_scene(rng, n=30, planar=True)
    H = epipolar.fit_homography(p0, p1)
    res = np.asarray(epipolar.symmetric_transfer_error_sq(H, p0, p1))
    assert np.sqrt(res).max() < 0.05


def test_find_fundamental_with_outliers():
    rng = np.random.default_rng(2)
    p0, p1, R, t, X, is_out = _two_view_scene(rng, n=120, n_out=30, noise=0.3)
    valid = jnp.ones(120, bool)
    F, inl, ok = epipolar.find_fundamental(
        jax.random.PRNGKey(0), p0, p1, valid, thresh_px=2.0, n_hyp=256)
    inl = np.asarray(inl)
    assert bool(ok)
    # must reject (almost) all outliers and keep most inliers
    assert inl[is_out].sum() <= 2
    assert inl[~is_out].sum() >= 75


def test_find_homography_with_outliers():
    rng = np.random.default_rng(3)
    p0, p1, *_rest = _two_view_scene(rng, n=100, planar=True, n_out=25, noise=0.3)
    is_out = _rest[-1]
    H, inl, ok = epipolar.find_homography(
        jax.random.PRNGKey(1), p0, p1, jnp.ones(100, bool), thresh_px=2.5, n_hyp=256)
    inl = np.asarray(inl)
    assert bool(ok)
    assert inl[is_out].sum() <= 2
    assert inl[~is_out].sum() >= 60


def test_find_essential_and_recover_pose():
    rng = np.random.default_rng(4)
    p0, p1, R, t, X, _ = _two_view_scene(rng, n=150, noise=0.2,
                                         trans=(0.8, 0.0, 0.1))
    E, inl, ok = epipolar.find_essential(
        jax.random.PRNGKey(2), p0, p1, jnp.ones(150, bool), K, thresh_px=2.0)
    assert bool(ok) and np.asarray(inl).sum() > 100
    Rr, tr, good, n_good = epipolar.recover_pose_essential(E, p0, p1, inl, K)
    # rotation accuracy
    dR = np.asarray(Rr) @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0
    # translation direction (sign-corrected unit vector)
    tdir = np.asarray(tr)
    tgt = t / np.linalg.norm(t)
    assert min(np.linalg.norm(tdir - tgt), np.linalg.norm(tdir + tgt)) < 0.05
    assert int(n_good) > 100


def test_recover_pose_cheirality_majority_in_front():
    rng = np.random.default_rng(5)
    p0, p1, R, t, X, _ = _two_view_scene(rng, n=80, trans=(0.5, 0, 0))
    E_gt = np.asarray(se3.hat(jnp.asarray(t / np.linalg.norm(t), jnp.float32))) @ R
    Rr, tr, good, n_good = epipolar.recover_pose_essential(
        jnp.asarray(E_gt, jnp.float32), p0, p1, jnp.ones(80, bool), K)
    assert int(n_good) >= 78  # nearly all points in front for the true pose


def test_decompose_homography_recovers_motion():
    rng = np.random.default_rng(6)
    # plane z=6 with normal ~ (0,0,1) in cam0; H = K (R + t n^T / d) K^-1
    rot = np.array([0.03, -0.02, 0.01], np.float32)
    t = np.array([0.4, -0.1, 0.2])
    n = np.array([0.0, 0.0, -1.0])   # plane normal pointing to camera
    d = 6.0
    R = np.asarray(se3.so3_exp(jnp.asarray(rot)))
    Kn = np.asarray(K)
    H = Kn @ (R + np.outer(t / d, -n)) @ np.linalg.inv(Kn)
    Rs, ts, ns = epipolar.decompose_homography(jnp.asarray(H, jnp.float32), K)
    # one candidate must match R (up to numerical error)
    errs = []
    for i in range(4):
        dR = np.asarray(Rs[i]) @ R.T
        errs.append(np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))))
    assert min(errs) < 0.5
    # and its translation direction matches t (up to sign/scale)
    i = int(np.argmin(errs))
    td = np.asarray(ts[i])
    tgt = t / np.linalg.norm(t)
    assert min(np.linalg.norm(td - tgt), np.linalg.norm(td + tgt)) < 0.1


def test_decompose_homography_pure_rotation():
    rot = np.array([0.0, 0.05, 0.0], np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(rot)))
    Kn = np.asarray(K)
    H = Kn @ R @ np.linalg.inv(Kn)
    Rs, ts, _ = epipolar.decompose_homography(jnp.asarray(H, jnp.float32), K)
    assert np.linalg.norm(np.asarray(ts)) < 1e-5
    dR = np.asarray(Rs[0]) @ R.T
    assert np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))) < 0.1


def test_essential_from_fundamental():
    rng = np.random.default_rng(7)
    p0, p1, R, t, X, _ = _two_view_scene(rng, n=60)
    F = epipolar.fit_fundamental(p0, p1)
    E = epipolar.essential_from_fundamental(F, K)
    # E must satisfy the normalized epipolar constraint
    Kn = np.asarray(K)
    x0 = np.concatenate([np.asarray(p0), np.ones((60, 1))], 1) @ np.linalg.inv(Kn).T
    x1 = np.concatenate([np.asarray(p1), np.ones((60, 1))], 1) @ np.linalg.inv(Kn).T
    resid = np.abs(np.einsum("ni,ij,nj->n", x1, np.asarray(E), x0))
    assert resid.max() < 1e-4
