"""P3P minimal solver tests (incl. the planar configs that break DLT pose)."""
import numpy as np
import jax.numpy as jnp
import pytest

from simpleslam_tpu.ops import se3
from simpleslam_tpu.ops.p3p import p3p_grunert, solve_quartic_real


def test_quartic_known_roots():
    # (x-1)(x+2)(x-3)(x+4) = x^4 + 2x^3 - 13x^2 - 14x + 24
    roots, is_real = solve_quartic_real(
        jnp.float32(1), jnp.float32(2), jnp.float32(-13),
        jnp.float32(-14), jnp.float32(24))
    r = np.sort(np.asarray(roots))
    assert np.asarray(is_real).all()
    np.testing.assert_allclose(r, [-4, -2, 1, 3], atol=1e-2)


@pytest.mark.parametrize("planar", [False, True])
def test_p3p_recovers_pose(planar):
    rng = np.random.default_rng(1)
    hits = 0
    trials = 0
    for _ in range(20):
        if planar:
            X = np.stack([rng.uniform(-2, 2, 3), rng.uniform(-2, 2, 3),
                          np.full(3, 6.0)], 1)
        else:
            X = np.stack([rng.uniform(-2, 2, 3), rng.uniform(-2, 2, 3),
                          rng.uniform(4, 9, 3)], 1)
        w = rng.normal(size=3) * 0.3
        t = rng.normal(size=3) * 0.5
        T = np.asarray(se3.rt_to_T(se3.so3_exp(jnp.asarray(w, jnp.float32)),
                                   jnp.asarray(t, jnp.float32)))
        pc = X @ T[:3, :3].T + T[:3, 3]
        if (pc[:, 2] <= 0.5).any():
            continue
        trials += 1
        bearings = pc / np.linalg.norm(pc, axis=1, keepdims=True)
        poses, valid = p3p_grunert(jnp.asarray(X, jnp.float32),
                                   jnp.asarray(bearings, jnp.float32))
        best = 1e9
        for i in range(4):
            if bool(valid[i]):
                Te = np.asarray(poses[i])
                ang = np.degrees(np.arccos(np.clip(
                    (np.trace(Te[:3, :3] @ T[:3, :3].T) - 1) / 2, -1, 1)))
                best = min(best, ang)
        if best < 0.5:
            hits += 1
    # per-sample success rate is what RANSAC needs; > 80% is ample
    assert hits / max(trials, 1) > 0.6, (hits, trials)


def test_pnp_ransac_on_pure_plane():
    """The scenario that kills DLT pose: ALL points on one plane."""
    import jax
    from simpleslam_tpu.ops import pnp

    rng = np.random.default_rng(2)
    K = jnp.asarray(np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]),
                    jnp.float32)
    X = np.stack([np.full(120, -4.0), rng.uniform(-2, 2, 120),
                  rng.uniform(5, 20, 120)], 1)   # a single wall x = -4
    w = np.array([0.02, -0.05, 0.01])
    t = np.array([0.3, 0.0, -0.5])
    T = np.asarray(se3.rt_to_T(se3.so3_exp(jnp.asarray(w, jnp.float32)),
                               jnp.asarray(t, jnp.float32)))
    pc = X @ T[:3, :3].T + T[:3, 3]
    uv = pc @ np.asarray(K).T
    uv = (uv[:, :2] / uv[:, 2:3] + rng.normal(0, 0.4, (120, 2))).astype(np.float32)
    Te, inl, n, ok = pnp.solve_pnp_ransac(
        jax.random.PRNGKey(0), jnp.asarray(X, jnp.float32), jnp.asarray(uv),
        jnp.ones(120, bool), K, 2.5)
    assert bool(ok) and int(n) > 90
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(Te)[:3, :3] @ T[:3, :3].T) - 1) / 2, -1, 1)))
    assert ang < 0.5
    assert np.linalg.norm(np.asarray(Te)[:3, 3] - t) < 0.05
