"""Loop closure (core/loop.py): place recognition, Sim(3) verification,
pose-graph correction, and full map rewrite on a synthetic drifted loop.

The reference lists loop closure + pose-graph optimization as future work
(reference: README.md:317, slam/monocular/main_revamped.py:501); these tests
pin the behavior of our TPU-native implementation.

Fixture: a K-keyframe circular trajectory whose estimate accumulates a smooth
Sim(3) drift (rotation + translation + 15% scale). The last keyframe revisits
the first one's viewpoint and re-triangulates DUPLICATE landmarks at drifted
positions — exactly the monocular-drift situation loop closure exists to fix.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpleslam_tpu.config import SLAMConfig, parse_config
from simpleslam_tpu.core.frontend import Matcher
from simpleslam_tpu.run_slam import run
from simpleslam_tpu.tools.synth import generate_kitti_sequence
from simpleslam_tpu.core.keyframe import Keyframe
from simpleslam_tpu.core.loop import LoopCloser, place_vector
from simpleslam_tpu.core.map import Map
from simpleslam_tpu.core.types import Features
from simpleslam_tpu.ops import sim3
from simpleslam_tpu.ops.matching import bf_match

IMG_HW = (480, 640)
K_INTR = np.array([[300.0, 0, 320.0], [0, 300.0, 240.0], [0, 0, 1]])
N_LM = 80          # landmarks seen at both loop endpoints
N_PAD = 128
N_KF = 20
DRIFT_XI = np.array([0.5, 0.3, 0.0, 0.0, 0.05, 0.0, 0.15], np.float64)


def _feats(kpts_xy: np.ndarray, desc: np.ndarray) -> Features:
    n = kpts_xy.shape[0]
    kp = np.zeros((N_PAD, 2), np.float32)
    dc = np.zeros((N_PAD, desc.shape[1]), np.float32)
    vl = np.zeros((N_PAD,), bool)
    kp[:n], dc[:n], vl[:n] = kpts_xy, desc, True
    return Features(kpts=jnp.asarray(kp), desc=jnp.asarray(dc),
                    scores=jnp.ones((N_PAD,), jnp.float32),
                    valid=jnp.asarray(vl))


def _project(X_cam: np.ndarray) -> np.ndarray:
    uv = (K_INTR @ X_cam.T).T
    return (uv[:, :2] / uv[:, 2:3]).astype(np.float32)


def _gt_pose(k: int) -> np.ndarray:
    """Circular loop in the x-z plane, full turn over N_KF keyframes;
    KF 0 and KF N_KF-1 share the same viewpoint. World = cam0."""
    th = 2.0 * np.pi * k / (N_KF - 1)
    c, s = np.cos(th), np.sin(th)
    R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
    center = 5.0 * np.array([np.sin(th), 0.0, 1.0 - np.cos(th)])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = -R @ center
    return T


def _drift_warp(k: int) -> sim3.Sim3:
    """World-warp W_k = exp(k/(K-1) * xi): est world = W_k(gt world)."""
    xi = jnp.asarray(DRIFT_XI * (k / (N_KF - 1)), jnp.float32)
    return sim3.exp(xi)


def _est_pose(k: int) -> np.ndarray:
    """Estimated SE(3) pose consistent with the warped map:
    S_est = S_gt o W_k^{-1}, projected to SE(3) via to_se3."""
    S = sim3.compose(sim3.from_se3(jnp.asarray(_gt_pose(k), jnp.float32)),
                     sim3.inverse(_drift_warp(k)))
    return np.asarray(sim3.to_se3(S), np.float64)


@pytest.fixture(scope="module")
def loop_world():
    rng = np.random.default_rng(7)
    X_gt = np.column_stack([rng.uniform(-2, 2, N_LM),
                            rng.uniform(-2, 2, N_LM),
                            rng.uniform(4, 8, N_LM)])      # cam0 frame = world
    desc = rng.normal(size=(N_LM, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)

    W_end = _drift_warp(N_KF - 1)
    X_drift = np.asarray(sim3.act(W_end, jnp.asarray(X_gt, jnp.float32)),
                         np.float64)

    kfs, wm = [], Map()
    uv0 = _project(X_gt)                                   # KF0 pixels
    for k in range(N_KF):
        T_est = _est_pose(k)
        if k == 0 or k == N_KF - 1:
            feats = _feats(uv0, desc)   # revisit: same pixels, same desc
        else:
            kp = np.column_stack([rng.uniform(0, 640, N_LM),
                                  rng.uniform(0, 480, N_LM)])
            d = rng.normal(size=(N_LM, 64)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            feats = _feats(kp, d)
        kfs.append(Keyframe(idx=k, frame_idx=k, path="", feats=feats,
                            pose=T_est.copy(), thumb=b""))
        wm.add_pose(T_est.copy(), is_keyframe=True)

    pids_old = wm.add_points(X_gt, keyframe_idx=0)
    for kp_i, pid in enumerate(pids_old):
        wm.points[pid].add_observation(0, kp_i, desc[kp_i])
    pids_new = wm.add_points(X_drift, keyframe_idx=N_KF - 1)
    for kp_i, pid in enumerate(pids_new):
        wm.points[pid].add_observation(N_KF - 1, kp_i, desc[kp_i])
    return kfs, wm, X_gt, np.asarray(pids_old), np.asarray(pids_new)


def _cfg(**kw):
    cfg = SLAMConfig()
    cfg.loop_closure = True
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _matcher():
    return Matcher(name="test-l2nn", fn=lambda f0, f1: bf_match(f0, f1))


def _centers(kfs):
    return np.stack([-kf.pose[:3, :3].T @ kf.pose[:3, 3] for kf in kfs])


def test_place_vectors_discriminate(loop_world):
    kfs, _, _, _, _ = loop_world
    vs = [place_vector(kf.feats, IMG_HW, grid=4) for kf in kfs]
    sim_loop = float(vs[0] @ vs[-1])
    sim_mid = max(float(vs[0] @ vs[k]) for k in range(5, 15))
    assert sim_loop > 0.95          # revisited viewpoint
    assert sim_mid < 0.5            # unrelated views
    assert sim_loop > sim_mid + 0.4


def test_detect_gap_and_cooldown(loop_world):
    kfs, wm, _, _, _ = loop_world
    lc = LoopCloser(_cfg(), K_INTR, _matcher())
    # too-recent keyframes are excluded by the gap
    assert lc.detect(kfs[:10], IMG_HW) == []
    cands = lc.detect(kfs, IMG_HW)
    assert cands and cands[0][0] == 0 and cands[0][1] > 0.9
    lc._cooldown_until = N_KF + 5
    assert lc.detect(kfs, IMG_HW) == []


def test_scale_gate_rejects_implausible(loop_world):
    """The Sim3 scale plausibility gate (config.loop_max_scale) must reject
    verified-but-implausible alignments BEFORE any map rewrite. Measured on
    TPU: a repetitive-texture false positive passed RANSAC with s=0.024 and
    its PGO rewrite wrecked the trajectory. The fixture's true revisit has
    s ~= e^0.15 ~= 1.16; with the gate tightened to 1.1 it must be rejected
    and the map left untouched (runs before the e2e test, which mutates the
    module-scoped fixture map)."""
    kfs, wm, X_gt, _, _ = loop_world
    pos_before = wm.get_point_array().copy()
    lc = LoopCloser(_cfg(loop_max_scale=1.1), K_INTR, _matcher())
    out = lc.on_new_keyframe(kfs, wm, IMG_HW, jax.random.PRNGKey(3))
    assert out is None and lc.closures == []
    np.testing.assert_array_equal(wm.get_point_array(), pos_before)


def test_loop_close_end_to_end(loop_world):
    kfs, wm, X_gt, pids_old, pids_new = loop_world
    kfs = [Keyframe(idx=kf.idx, frame_idx=kf.frame_idx, path="",
                    feats=kf.feats, pose=kf.pose.copy(), thumb=b"")
           for kf in kfs]

    centers_gt = np.stack(
        [-(_gt_pose(k)[:3, :3].T @ _gt_pose(k)[:3, 3]) for k in range(N_KF)])
    err_before = np.linalg.norm(_centers(kfs)[-1] - centers_gt[-1])
    assert err_before > 0.3         # fixture sanity: the drift is material

    dup_before = np.median(np.linalg.norm(
        wm.get_point_array()[N_LM:] - X_gt, axis=1))
    assert dup_before > 0.3         # duplicates really are displaced

    lc = LoopCloser(_cfg(), K_INTR, _matcher())
    out = lc.on_new_keyframe(kfs, wm, IMG_HW, jax.random.PRNGKey(3))

    assert out is not None, "loop must be detected and accepted"
    assert out.cand_kf == 0 and out.cur_kf == N_KF - 1
    assert out.n_inliers >= SLAMConfig().loop_min_inliers
    # measured relative scale ~ e^{+sigma_drift}: the endpoint pose's scale
    # drift collapses into translation under to_se3, so its camera sees the
    # revisited scene enlarged by e^{sigma}
    assert abs(out.scale - np.exp(DRIFT_XI[6])) < 0.1
    assert out.cost_after < 0.25 * out.cost_before

    # endpoint keyframe snaps back to ground truth (gauge = node 0 = GT)
    err_after = np.linalg.norm(_centers(kfs)[-1] - centers_gt[-1])
    assert err_after < 0.2 * err_before
    assert err_after < 0.25

    # duplicate landmarks (anchored at the drifted endpoint) land on their
    # ground-truth twins after the anchored rewrite
    pos = wm.get_point_array()
    dup_after = np.median(np.linalg.norm(pos[N_LM:] - X_gt, axis=1))
    assert dup_after < 0.25 * dup_before
    # originals (anchored at the pinned node) stay put
    assert np.max(np.linalg.norm(pos[:N_LM] - X_gt, axis=1)) < 1e-3

    # the per-frame trajectory was rewritten consistently with the keyframes
    traj_end = -(wm.poses[-1][:3, :3].T @ wm.poses[-1][:3, 3])
    assert np.linalg.norm(traj_end - _centers(kfs)[-1]) < 1e-6

    # cooldown armed + closure recorded
    assert lc.closures and lc._cooldown_until == (N_KF - 1
                                                  + SLAMConfig().loop_gap_kfs)


def test_second_lap_closes_again_and_stays_consistent():
    """TWO revisits in one run (double lap) must yield TWO accepted closures,
    and the second PGO must leave the whole graph globally consistent —
    VERDICT r3 item 2's multi-closure requirement. Lap 2 is built
    sequentially AFTER closure 1's rewrite (as a live run would), with fresh
    drift accumulating on the corrected map."""
    rng = np.random.default_rng(11)
    X_gt = np.column_stack([rng.uniform(-2, 2, N_LM),
                            rng.uniform(-2, 2, N_LM),
                            rng.uniform(4, 8, N_LM)])
    desc = rng.normal(size=(N_LM, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    uv0 = _project(X_gt)
    revisit_feats = _feats(uv0, desc)

    def mid_feats():
        kp = np.column_stack([rng.uniform(0, 640, N_LM),
                              rng.uniform(0, 480, N_LM)])
        d = rng.normal(size=(N_LM, 64)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return _feats(kp, d)

    kfs, wm = [], Map()
    # ---- lap 1 (drifted), revisit at KF N_KF-1
    for k in range(N_KF):
        T_est = _est_pose(k)
        feats = revisit_feats if k in (0, N_KF - 1) else mid_feats()
        kfs.append(Keyframe(idx=k, frame_idx=k, path="", feats=feats,
                            pose=T_est.copy(), thumb=b""))
        wm.add_pose(T_est.copy(), is_keyframe=True)
    pids0 = wm.add_points(X_gt, keyframe_idx=0)
    for kp_i, pid in enumerate(pids0):
        wm.points[pid].add_observation(0, kp_i, desc[kp_i])
    W1 = _drift_warp(N_KF - 1)
    X_d1 = np.asarray(sim3.act(W1, jnp.asarray(X_gt, jnp.float32)), np.float64)
    pids1 = wm.add_points(X_d1, keyframe_idx=N_KF - 1)
    for kp_i, pid in enumerate(pids1):
        wm.points[pid].add_observation(N_KF - 1, kp_i, desc[kp_i])

    lc = LoopCloser(_cfg(loop_gap_kfs=10), K_INTR, _matcher())
    first = lc.on_new_keyframe(kfs, wm, IMG_HW, jax.random.PRNGKey(3))
    assert first is not None and first.cand_kf == 0

    # ---- lap 2: drives the same circle again, accumulating FRESH drift on
    # top of the corrected lap-1 graph; revisits KF0's viewpoint at the end
    for j in range(1, N_KF):
        k = N_KF - 1 + j
        S = sim3.compose(
            sim3.from_se3(jnp.asarray(_gt_pose(j), jnp.float32)),
            sim3.inverse(_drift_warp(j)))
        T_est = np.asarray(sim3.to_se3(S), np.float64)
        feats = revisit_feats if j == N_KF - 1 else mid_feats()
        kfs.append(Keyframe(idx=k, frame_idx=k, path="", feats=feats,
                            pose=T_est.copy(), thumb=b""))
        wm.add_pose(T_est.copy(), is_keyframe=True)
    X_d2 = np.asarray(sim3.act(W1, jnp.asarray(X_gt, jnp.float32)), np.float64)
    pids2 = wm.add_points(X_d2, keyframe_idx=2 * (N_KF - 1))
    for kp_i, pid in enumerate(pids2):
        wm.points[pid].add_observation(2 * (N_KF - 1), kp_i, desc[kp_i])

    second = lc.on_new_keyframe(kfs, wm, IMG_HW, jax.random.PRNGKey(5))
    assert second is not None, "second revisit must close too"
    assert second.cur_kf == 2 * (N_KF - 1)
    assert second.cand_kf in (0, N_KF - 1)    # either co-located endpoint
    assert len(lc.closures) == 2

    # post-second-PGO global consistency: EVERY revisit keyframe sits at
    # KF0's center, and both duplicate landmark sets coincide with the
    # originals (which stay pinned at ground truth)
    centers = _centers(kfs)
    assert np.linalg.norm(centers[N_KF - 1] - centers[0]) < 0.3
    assert np.linalg.norm(centers[2 * (N_KF - 1)] - centers[0]) < 0.3
    pos = wm.get_point_array()
    assert np.max(np.linalg.norm(pos[:N_LM] - X_gt, axis=1)) < 1e-3
    assert np.median(np.linalg.norm(pos[N_LM:2 * N_LM] - X_gt, axis=1)) < 0.3
    assert np.median(np.linalg.norm(pos[2 * N_LM:] - X_gt, axis=1)) < 0.3
    # trajectory tail rewritten consistently with its anchor keyframe
    traj_end = -(wm.poses[-1][:3, :3].T @ wm.poses[-1][:3, 3])
    assert np.linalg.norm(traj_end - centers[-1]) < 1e-6


def test_no_false_closure_on_distinct_views(loop_world):
    """Middle keyframes (random descriptors) must not trigger closures."""
    kfs, wm, _, _, _ = loop_world
    lc = LoopCloser(_cfg(), K_INTR, _matcher())
    sub = list(kfs[:N_KF - 1])      # drop the revisit keyframe
    out = lc.on_new_keyframe(sub, wm, IMG_HW, jax.random.PRNGKey(0))
    assert out is None and lc.closures == []


# --------------------------------------------------------------------------- #
# Confirmation gating (perceptual-aliasing defense, round-5 soak fix):
# a verified closure in the ambiguous inlier band must be HELD pending until
# a later verification implies the SAME drift correction through odometry.
# --------------------------------------------------------------------------- #

def _se3(R, t):
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    return T


def _roty(deg):
    th = np.radians(deg)
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


class _StubKF:
    def __init__(self, pose, n_valid=1000, n_pad=1024):
        valid = np.zeros(n_pad, bool)
        valid[:n_valid] = True
        self.pose = np.asarray(pose, np.float64)
        self.feats = type("F", (), {"valid": valid})()


class _GateCloser(LoopCloser):
    """LoopCloser with the map rewrite stubbed out — unit-tests the
    _gate_and_apply pending/confirm/bypass state machine in isolation."""

    def __init__(self, cfg):
        super().__init__(cfg, K_INTR, _matcher())
        self.close_calls = []

    def close(self, kfs, world_map, cur, cand, S):
        self.close_calls.append((cur, cand))
        return 1.0, 0.1, 0.5


def _gate_fixture():
    from simpleslam_tpu.core.loop import _s_comp, _s_inv, _s_from_se3
    cfg = _cfg(loop_confirm=2, loop_confirm_strong=0.15,
               loop_confirm_window=12, loop_min_inlier_frac=0.0)
    # 30 stub keyframes along +z with mild yaw: "estimated" poses T_cw
    kfs = [_StubKF(_se3(_roty(3 * k), [0.1 * k, 0, 2.0 * k]))
           for k in range(30)]
    # the TRUE drift correction both genuine verifications must imply
    E = (_roty(5.0), np.array([1.0, 0.0, 0.5]), 1.2)

    def measured(cur, cand, corr=E):
        # S(cur <- cand) = corr o (T_cur o T_cand^-1): a verification whose
        # implied correction (in cur's frame) is exactly `corr`
        Mhat = _s_comp(_s_from_se3(kfs[cur].pose),
                       _s_inv(_s_from_se3(kfs[cand].pose)))
        R, t, s = _s_comp(corr, Mhat)
        return sim3.Sim3(R=R, t=t, s=np.float64(s))

    def transported(cur, cand, base_cur):
        # genuine later verification: the SAME correction E, expressed in
        # cur's frame after transporting from base_cur through odometry
        G = _s_comp(_s_from_se3(kfs[cur].pose),
                    _s_inv(_s_from_se3(kfs[base_cur].pose)))
        corr = _s_comp(G, _s_comp(E, _s_inv(G)))
        return measured(cur, cand, corr=corr)

    return cfg, kfs, measured, transported


def test_confirm_gate_parks_then_closes_on_consistent_evidence():
    cfg, kfs, measured, transported = _gate_fixture()
    lc = _GateCloser(cfg)
    wm = None      # close() is stubbed; the gate itself never touches the map
    # ambiguous-band verification (30/1000 = 3% < strong 15%): parked
    out = lc._gate_and_apply(kfs, wm, 20, 2, 0.9, (measured(20, 2), 30, 10.0))
    assert out is None and len(lc._pending) == 1 and not lc.close_calls
    # an INCONSISTENT second fit (different aliased correction) also parks
    bad = (_roty(40.0), np.array([5.0, 0.0, -3.0]), 0.4)
    out = lc._gate_and_apply(kfs, wm, 22, 11, 0.9,
                             (measured(22, 11, corr=bad), 30, 10.0))
    assert out is None and len(lc._pending) == 2 and not lc.close_calls
    # an odometry-CONSISTENT verification on a later KF closes
    out = lc._gate_and_apply(kfs, wm, 23, 5, 0.9,
                             (transported(23, 5, base_cur=20), 30, 10.0))
    assert out is not None and lc.close_calls == [(23, 5)]
    assert len(lc.closures) == 1 and lc.closures[0].n_inliers == 30
    assert lc._pending == []      # rewrite invalidates stored poses


def test_confirm_gate_strong_evidence_bypass():
    cfg, kfs, measured, _ = _gate_fixture()
    lc = _GateCloser(cfg)
    # 300/1000 = 30% coverage >= strong 15%: applies immediately, no wait
    out = lc._gate_and_apply(kfs, None, 20, 2, 0.9,
                             (measured(20, 2), 300, 10.0))
    assert out is not None and lc.close_calls == [(20, 2)]


def test_confirm_gate_pending_expires():
    cfg, kfs, measured, transported = _gate_fixture()
    lc = _GateCloser(cfg)
    lc._gate_and_apply(kfs, None, 5, 1, 0.9, (measured(5, 1), 30, 10.0))
    assert len(lc._pending) == 1
    # 14 KFs later (> window 12): the stale pending must not confirm
    out = lc._gate_and_apply(kfs, None, 19, 3, 0.9,
                             (transported(19, 3, base_cur=5), 30, 10.0))
    assert out is None and not lc.close_calls
    assert [p["cur"] for p in lc._pending] == [19]


def test_loop_closes_through_archived_landmarks():
    """A revisit AFTER the old map region was evicted from the live store
    (device compaction -> sync_to_host archives it) must still verify and
    close: _kp2pid and the 3D-3D lift read archived observations/positions,
    and close() rewrites archived positions alongside live ones. This is
    the 1200-frame-soak failure mode (candidate side '0 kps mapped')."""
    rng = np.random.default_rng(13)
    X_gt = np.column_stack([rng.uniform(-2, 2, N_LM),
                            rng.uniform(-2, 2, N_LM),
                            rng.uniform(4, 8, N_LM)])
    desc = rng.normal(size=(N_LM, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    W_end = _drift_warp(N_KF - 1)
    X_drift = np.asarray(sim3.act(W_end, jnp.asarray(X_gt, jnp.float32)),
                         np.float64)
    uv0 = _project(X_gt)

    kfs, wm = [], Map()
    for k in range(N_KF):
        T_est = _est_pose(k)
        if k == 0 or k == N_KF - 1:
            feats = _feats(uv0, desc)
        else:
            kp = np.column_stack([rng.uniform(0, 640, N_LM),
                                  rng.uniform(0, 480, N_LM)])
            d = rng.normal(size=(N_LM, 64)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            feats = _feats(kp, d)
        kfs.append(Keyframe(idx=k, frame_idx=k, path="", feats=feats,
                            pose=T_est.copy(), thumb=b""))
        wm.add_pose(T_est.copy(), is_keyframe=True)

    pids_old = wm.add_points(X_gt, keyframe_idx=0)
    for kp_i, pid in enumerate(pids_old):
        wm.points[pid].add_observation(0, kp_i, desc[kp_i])
    pids_new = wm.add_points(X_drift, keyframe_idx=N_KF - 1)
    for kp_i, pid in enumerate(pids_new):
        wm.points[pid].add_observation(N_KF - 1, kp_i, desc[kp_i])

    # device compaction evicted the ENTIRE old region before the revisit
    for pid in pids_old:
        wm.archive_point(pid)
    assert len(wm) == N_LM and len(wm.archived) == N_LM

    lc = LoopCloser(_cfg(), K_INTR, _matcher())
    out = lc.on_new_keyframe(kfs, wm, IMG_HW, jax.random.PRNGKey(3))
    assert out is not None, "closure must verify through the archive"
    assert out.cand_kf == 0 and out.cur_kf == N_KF - 1
    assert out.cost_after < 0.25 * out.cost_before

    # live duplicates (anchored at the drifted endpoint) snap onto GT
    dup_after = np.median(np.linalg.norm(wm.get_point_array() - X_gt, axis=1))
    assert dup_after < 0.25
    # archived points (anchored at the pinned gauge node 0) stay on GT
    arch = np.stack([wm.archived[p][0] for p in pids_old])
    assert np.max(np.linalg.norm(arch - X_gt, axis=1)) < 1e-3


def test_host_vs_fused_loop_closure_parity(tmp_path_factory, tmp_path,
                                           monkeypatch):
    """The host driver (detect per new KF) and the fused driver (scan at
    every periodic sync, core/fused sync cadence) share LoopCloser but
    diverge in WHEN keyframe features reach the host and HOW the PGO rewrite
    is applied (run_slam._run_fused_loop + core/fused.apply_host_correction
    vs the in-place host rewrite). VERDICT r4 item 6: prove both paths
    accept the SAME loop edge on one fixture and land on consistent
    post-PGO trajectories.

    Fixture = the BASELINE.md square-loop fixture (boxes scene, seed 5,
    180x410, 512 kpts): a KITTI-shaped closed lap whose monocular drift the
    closure corrects. Measured (virtual-8-device mesh, the conftest env):
    host closes KF 37 <-> 3 (s=0.366), fused closes KF 36 <-> 3 (s=0.303);
    Sim3-aligned inter-mode deltas med 1.98 m / max 5.59 m on the ~65 m path.

    Run with --loop_confirm 1: this test pins DRIVER parity (the two modes'
    integration of the shared LoopCloser), not the confirmation policy. At
    this miniature scale the closure evidence is marginal (~30 inliers,
    ~6%% of kpts — inside the ambiguous band), so the round-5 aliasing gate
    correctly parks it pending and (the fits being noisy) never confirms;
    the gate itself is unit-tested above on constructed Sim3 evidence."""
    base = str(tmp_path_factory.mktemp("lc_parity_seq"))
    generate_kitti_sequence(base, n_frames=130, seed=5, hw=(180, 410),
                            scene="boxes", trajectory="square")
    monkeypatch.chdir(tmp_path)
    argv = ["--dataset", "kitti", "--base_dir", base, "--headless",
            "--no_viz3d", "--max_features", "512", "--map_capacity", "4096",
            "--loop_closure", "--loop_confirm", "1"]
    res_host = run(parse_config(argv))
    res_fused = run(parse_config(argv + ["--fused"]))

    # both modes accept exactly one closure on this lap
    assert res_host.loop_closures == 1, "host mode must close the loop"
    assert res_fused.loop_closures == 1, "fused mode must close the loop"
    ch, cf = res_host.closure_events[0], res_fused.closure_events[0]

    # ... over the SAME edge: identical candidate region, and the revisit
    # keyframe within one fused sync period (the fused scan only sees new
    # keyframes every lc_every=32 dispatched frames)
    cand_f_h = res_host.kf_frames[ch.cand_kf]
    cand_f_f = res_fused.kf_frames[cf.cand_kf]
    cur_f_h = res_host.kf_frames[ch.cur_kf]
    cur_f_f = res_fused.kf_frames[cf.cur_kf]
    assert abs(cand_f_h - cand_f_f) <= 8, (cand_f_h, cand_f_f)
    assert abs(cur_f_h - cur_f_f) <= 32, (cur_f_h, cur_f_f)
    # ... measuring consistent Sim3 drift (scale within 55%: the consensus
    # sets differ between modes, the drift they measure must not)
    assert 0.65 < ch.scale / cf.scale < 1.55, (ch.scale, cf.scale)

    # post-PGO trajectories tell the same story (gauge-aligned): the two
    # modes' RANSAC/BA histories legitimately differ, but after each one's
    # closure rewrite the shapes must agree to a few % of the ~65 m path
    chc = {f: -p[:3, :3].T @ p[:3, 3]
           for f, p in zip(res_host.frame_ids, res_host.poses_cw)}
    cfc = {f: -p[:3, :3].T @ p[:3, 3]
           for f, p in zip(res_fused.frame_ids, res_fused.poses_cw)}
    common = sorted(set(chc) & set(cfc))
    assert len(common) == 130
    A = np.stack([cfc[f] for f in common])
    B = np.stack([chc[f] for f in common])
    from simpleslam_tpu.viz.trajectory2d import umeyama_sim3
    s, R, t = umeyama_sim3(A, B)
    d = np.linalg.norm(s * A @ R.T + t - B, axis=1)
    assert np.median(d) < 2.5, f"median inter-mode delta {np.median(d):.2f}"
    assert d.max() < 7.0, f"max inter-mode delta {d.max():.2f}"
    # neither mode fell apart (corners are the hard part of this fixture)
    assert res_host.tracking_lost_count <= 12
    assert res_fused.tracking_lost_count <= 12
