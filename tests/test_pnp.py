"""PnP / tracking-op tests.

Carries the reference test strategy forward (tests/test_pnp_utils.py:84-240:
random camera poses, synthetic projections +- pixel noise, convention checks,
rot err < 2-2.5 deg, ||t err|| < 0.1-0.15, empty/insufficient inputs) onto the
TPU implementations, plus coverage for the vectorized 2D-3D association.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpleslam_tpu.ops import pnp, se3

K = jnp.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])


def _scene(rng, n=80, rot_scale=0.3, noise_px=0.0, n_out=0):
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(4, 10, n)], 1)
    w = rng.normal(size=3); w = w / np.linalg.norm(w) * rot_scale
    t = rng.normal(size=3) * 0.5
    T = np.asarray(se3.rt_to_T(se3.so3_exp(jnp.asarray(w, jnp.float32)),
                               jnp.asarray(t, jnp.float32)))
    Xc = X @ T[:3, :3].T + T[:3, 3]
    # keep the scene in front of the camera
    Xc[:, 2] = np.abs(Xc[:, 2]) + 2.0
    X = (Xc - T[:3, 3]) @ T[:3, :3]        # back to world with fixed depths
    uv = Xc @ np.asarray(K).T
    uv = uv[:, :2] / uv[:, 2:3]
    if noise_px:
        uv = uv + rng.normal(scale=noise_px, size=uv.shape)
    out_mask = np.zeros(n, bool)
    if n_out:
        out = rng.choice(n, n_out, replace=False)
        uv[out] += rng.uniform(25, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
        out_mask[out] = True
    return X, uv, T, out_mask


def _rot_err_deg(Ra, Rb):
    c = (np.trace(Ra @ Rb.T) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def test_predict_pose_const_vel():
    # camera translating +1 z per frame
    T1 = np.eye(4); T1[2, 3] = -1.0
    T2 = np.eye(4); T2[2, 3] = -2.0
    Tp = np.asarray(pnp.predict_pose_const_vel(jnp.asarray(T1, jnp.float32),
                                               jnp.asarray(T2, jnp.float32)))
    assert abs(Tp[2, 3] + 3.0) < 1e-5
    np.testing.assert_allclose(Tp[:3, :3], np.eye(3), atol=1e-6)


def test_dlt_pose_exact():
    rng = np.random.default_rng(0)
    X, uv, T, _ = _scene(rng, n=12)
    uv_n = (uv - [320.0, 240.0]) / 500.0
    Te = np.asarray(pnp.dlt_pose(jnp.asarray(X, jnp.float32),
                                 jnp.asarray(uv_n, jnp.float32)))
    assert _rot_err_deg(Te[:3, :3], T[:3, :3]) < 0.2
    assert np.linalg.norm(Te[:3, 3] - T[:3, 3]) < 0.02


def test_gn_refine_pose_converges():
    rng = np.random.default_rng(1)
    X, uv, T, _ = _scene(rng, n=60, noise_px=0.0)
    # perturb the pose and refine back
    xi = np.concatenate([rng.normal(size=3) * 0.1, rng.normal(size=3) * 0.05])
    T0 = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32))) @ T
    Tr = np.asarray(pnp.gn_refine_pose(
        jnp.asarray(T0, jnp.float32), jnp.asarray(X, jnp.float32),
        jnp.asarray(uv, jnp.float32), K, jnp.ones(60), iters=15))
    assert _rot_err_deg(Tr[:3, :3], T[:3, :3]) < 0.05
    assert np.linalg.norm(Tr[:3, 3] - T[:3, 3]) < 5e-3


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_solve_pnp_ransac_noise(seed):
    rng = np.random.default_rng(seed)
    X, uv, T, _ = _scene(rng, n=100, noise_px=1.0)
    Te, inl, n, ok = pnp.solve_pnp_ransac(
        jax.random.PRNGKey(seed), jnp.asarray(X, jnp.float32),
        jnp.asarray(uv, jnp.float32), jnp.ones(100, bool), K, 2.5)
    assert bool(ok) and int(n) > 80
    assert _rot_err_deg(np.asarray(Te)[:3, :3], T[:3, :3]) < 2.0
    assert np.linalg.norm(np.asarray(Te)[:3, 3] - T[:3, 3]) < 0.1


def test_solve_pnp_ransac_outliers_and_guess():
    rng = np.random.default_rng(3)
    X, uv, T, out_mask = _scene(rng, n=120, noise_px=0.5, n_out=40)
    T_guess = T.copy(); T_guess[:3, 3] += 0.05
    Te, inl, n, ok = pnp.solve_pnp_ransac(
        jax.random.PRNGKey(0), jnp.asarray(X, jnp.float32),
        jnp.asarray(uv, jnp.float32), jnp.ones(120, bool), K, 2.5,
        Tcw_init=jnp.asarray(T_guess, jnp.float32))
    assert bool(ok)
    inl = np.asarray(inl)
    assert inl[out_mask].sum() <= 2          # outliers rejected
    assert inl[~out_mask].sum() >= 70
    assert _rot_err_deg(np.asarray(Te)[:3, :3], T[:3, :3]) < 2.0
    assert np.linalg.norm(np.asarray(Te)[:3, 3] - T[:3, 3]) < 0.15


def test_solve_pnp_too_few_points():
    X = jnp.zeros((8, 3)); uv = jnp.zeros((8, 2))
    valid = jnp.zeros(8, bool).at[0].set(True).at[1].set(True)
    _, _, n, ok = pnp.solve_pnp_ransac(jax.random.PRNGKey(0), X, uv, valid, K, 2.5)
    assert not bool(ok)


def test_refine_pose_pnp_host_api():
    rng = np.random.default_rng(4)
    X, uv, T, _ = _scene(rng, n=40, noise_px=0.5)
    R, t = pnp.refine_pose_pnp(np.asarray(K), X, uv, ransac_px=2.0)
    assert R is not None
    assert _rot_err_deg(R, T[:3, :3]) < 2.5
    assert np.linalg.norm(t - T[:3, 3]) < 0.15
    # insufficient points -> None
    R2, t2 = pnp.refine_pose_pnp(np.asarray(K), X[:3], uv[:3])
    assert R2 is None and t2 is None


def test_associate_landmarks_convention_and_greedy():
    # pose_w_c convention: camera at +1x looking down +z
    T_wc = np.eye(4); T_wc[0, 3] = 1.0
    X = np.array([[1.0, 0, 5.0], [1.5, 0, 5.0], [-50.0, 0, -5.0]])
    # keypoints at the exact projections of points 0 and 1
    Tcw = np.linalg.inv(T_wc)
    uv = pnp.project_points_wc(np.asarray(K), T_wc, X)
    kps = [uv[0], uv[1] + 1.0]   # second kp 1px off
    p3, p2, ids = pnp.associate_landmarks(np.asarray(K), T_wc, X, kps,
                                          search_rad=5.0)
    assert len(ids) == 2
    np.testing.assert_allclose(p3[0], X[0], atol=1e-5)
    # behind-camera landmark produced no match
    assert all(i in (0, 1) for i in ids)
    # empty inputs
    p3e, p2e, idse = pnp.associate_landmarks(np.asarray(K), T_wc,
                                             np.zeros((0, 3)), kps)
    assert len(idse) == 0


def test_reproject_and_match_2d3d_vectorized():
    rng = np.random.default_rng(5)
    C, N, D = 64, 32, 16
    X = np.stack([rng.uniform(-2, 2, C), rng.uniform(-1.5, 1.5, C),
                  rng.uniform(4, 10, C)], 1).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    uv_all = X @ np.asarray(K).T
    uv_all = uv_all[:, :2] / uv_all[:, 2:3]

    # build keypoints = projections of the first N landmarks (+small offset)
    kpts = (uv_all[:N] + rng.normal(scale=1.0, size=(N, 2))).astype(np.float32)
    descs = rng.normal(size=(C, D)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)
    desc_cur = descs[:N].copy()

    ring = np.zeros((C, 6, D), np.float32)
    ring[:, 0, :] = descs
    n_desc = np.ones(C, np.int32)

    out = pnp.reproject_and_match_2d3d(
        jnp.asarray(X), jnp.ones(C, bool), jnp.asarray(ring),
        jnp.asarray(n_desc), jnp.asarray(kpts), jnp.asarray(desc_cur),
        jnp.ones(N, bool), K, jnp.asarray(T),
        img_w=640, img_h=480, radius_px=8.0, max_l2=0.5)
    valid = np.asarray(out.valid)
    kp_idx = np.asarray(out.kp_idx)
    # the first N landmarks should match their own keypoints
    matched = np.flatnonzero(valid)
    assert len(matched) >= N - 4
    assert (kp_idx[matched[matched < N]] == matched[matched < N]).all()
    # one-to-one: no keypoint used twice
    used = kp_idx[valid]
    assert len(np.unique(used)) == len(used)


def test_reproject_and_match_binary_descriptors():
    rng = np.random.default_rng(6)
    C, N = 16, 16
    X = np.stack([rng.uniform(-1, 1, C), rng.uniform(-1, 1, C),
                  rng.uniform(5, 8, C)], 1).astype(np.float32)
    uv = X @ np.asarray(K).T
    uv = (uv[:, :2] / uv[:, 2:3]).astype(np.float32)
    descs = rng.integers(0, 256, (C, 32), np.uint8)
    ring = np.zeros((C, 6, 32), np.uint8)
    ring[:, 0] = descs
    out = pnp.reproject_and_match_2d3d(
        jnp.asarray(X), jnp.ones(C, bool), jnp.asarray(ring),
        jnp.ones(C, np.int32), jnp.asarray(uv), jnp.asarray(descs),
        jnp.ones(N, bool), K, jnp.eye(4),
        img_w=640, img_h=480, radius_px=5.0, max_hamm=64)
    assert np.asarray(out.valid).sum() == C
    np.testing.assert_array_equal(np.asarray(out.kp_idx), np.arange(C))


def test_reproject_and_match_respects_thresholds():
    # descriptor distance above max_hamm -> no match even in-window
    X = np.array([[0.0, 0, 5.0]], np.float32)
    uv = X @ np.asarray(K).T
    uv = (uv[:, :2] / uv[:, 2:3]).astype(np.float32)
    d_map = np.zeros((1, 32), np.uint8)
    d_cur = np.full((1, 32), 255, np.uint8)   # 256 bits away
    ring = np.zeros((1, 6, 32), np.uint8); ring[:, 0] = d_map
    out = pnp.reproject_and_match_2d3d(
        jnp.asarray(X), jnp.ones(1, bool), jnp.asarray(ring),
        jnp.ones(1, np.int32), jnp.asarray(uv), jnp.asarray(d_cur),
        jnp.ones(1, bool), K, jnp.eye(4),
        img_w=640, img_h=480, radius_px=5.0, max_hamm=64)
    assert not bool(out.valid[0])


def test_wide_window_retry_recovers_yaw_onset():
    """The widened-association retry (config.assoc_wide_factor): when yaw
    ONSET makes the const-vel prediction miss by more than proj_radius
    (first corner frame: ~15-22 px of rotation flow at fixture scale), the
    narrow pass starves but the same compiled program re-run at
    radius * factor associates nearly everything and PnP recovers the true
    pose. Mirrors the fused/host drivers' retry (core/fused.py track,
    run_slam._track)."""
    rng = np.random.default_rng(7)
    C = 128
    X = np.stack([rng.uniform(-3, 3, C), rng.uniform(-2, 2, C),
                  rng.uniform(6, 14, C)], 1).astype(np.float32)
    # true camera: yawed by 2 deg (rotation flow ~ f*yaw = 17.5 px)
    yaw = np.radians(2.0)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                               [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
    Xc = X @ T_true[:3, :3].T
    uv = Xc @ np.asarray(K).T
    kpts = (uv[:, :2] / uv[:, 2:3]).astype(np.float32)
    inb = ((kpts[:, 0] >= 0) & (kpts[:, 0] < 640) &
           (kpts[:, 1] >= 0) & (kpts[:, 1] < 480) & (Xc[:, 2] > 0))
    descs = rng.integers(0, 256, (C, 32), np.uint8)
    ring = np.zeros((C, 6, 32), np.uint8)
    ring[:, 0] = descs
    T_pred = jnp.eye(4)          # const-vel seed that missed the yaw onset

    def attempt(radius_px):
        return pnp.reproject_and_match_2d3d(
            jnp.asarray(X), jnp.ones(C, bool), jnp.asarray(ring),
            jnp.ones(C, np.int32), jnp.asarray(kpts), jnp.asarray(descs),
            jnp.asarray(inb), K, T_pred,
            img_w=640, img_h=480, radius_px=radius_px, max_hamm=64)

    narrow = attempt(10.0)
    wide = attempt(25.0)
    n_narrow = int(np.asarray(narrow.valid).sum())
    n_wide = int(np.asarray(wide.valid).sum())
    assert n_narrow < 30                       # starved: PnP cannot run
    assert n_wide >= 0.9 * inb.sum()           # retry recovers the frame
    T_est, _inl, n_inl, ok = pnp.solve_pnp_ransac(
        jax.random.PRNGKey(0), jnp.asarray(X),
        jnp.asarray(kpts)[wide.kp_idx], wide.valid, K, 2.5,
        Tcw_init=T_pred, n_hyp=128)
    assert bool(ok) and int(n_inl) >= 30
    assert _rot_err_deg(np.asarray(T_est)[:3, :3], T_true[:3, :3]) < 0.5
