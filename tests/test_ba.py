"""Bundle adjustment tests.

Mirrors the reference BA test strategy (tests/test_ba_utils_T_c_w.py:103-314):
synthetic yaw-arc camera path + box of 3-D points, ground-truth measurements,
independently noised initial poses/points; asserts reprojection RMSE
decreases and that the noise-free case stays at ~0. Uses duck-typed map/
keyframe stubs (like the reference, :59-74) plus the real Map.
"""
import math
from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np
import jax.numpy as jnp
import pytest

from simpleslam_tpu.core.ba import (global_bundle_adjustment,
                                    local_bundle_adjustment, pose_only_ba,
                                    two_view_ba)
from simpleslam_tpu.ops import se3

WIDTH, HEIGHT = 1280, 960
K = np.array([[800.0, 0, 640.0], [0, 800.0, 480.0], [0, 0, 1.0]])


# ---- duck-typed stubs (solver must work without the real Map) -------------

@dataclass
class _MP:
    position: np.ndarray
    observations: List = field(default_factory=list)


class _WorldMap:
    def __init__(self):
        self.points: Dict[int, _MP] = {}
        self.poses: List[np.ndarray] = []


@dataclass
class _KP:
    pt: tuple


@dataclass
class _KF:
    kps: List[_KP]
    pose: np.ndarray
    feats = None


def _yaw_R(deg):
    th = math.radians(deg)
    c, s = math.cos(th), math.sin(th)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def generate_scene(n_frames, n_points=50, pix_noise=0.0, pose_trans_noise=0.0,
                   pose_rot_noise_deg=0.0, point_noise=0.0, seed=42):
    """Yaw-arc trajectory + box of points; returns (wmap, kfs, gt)."""
    rng = np.random.default_rng(seed)
    pts_gt = np.column_stack([rng.uniform(-1, 1, n_points),
                              rng.uniform(-0.7, 0.7, n_points),
                              rng.uniform(4, 8, n_points)])
    T_wc_gt = []
    for i in range(n_frames):
        T = np.eye(4)
        T[:3, :3] = _yaw_R(i * 2.0)
        T[:3, 3] = [i * 0.10, 0, 0]
        T_wc_gt.append(T)

    wmap = _WorldMap()
    kfs = []
    for T_wc in T_wc_gt:
        # noisy initial pose
        ax = rng.normal(size=3); ax /= np.linalg.norm(ax)
        ang = math.radians(pose_rot_noise_deg) * rng.normal()
        Rn = np.asarray(se3.so3_exp(jnp.asarray(ax * ang, jnp.float32)))
        T_wc_n = np.eye(4)
        T_wc_n[:3, :3] = Rn @ T_wc[:3, :3]
        T_wc_n[:3, 3] = T_wc[:3, 3] + rng.normal(0, pose_trans_noise, 3)
        T_cw_n = np.linalg.inv(T_wc_n)
        wmap.poses.append(T_cw_n.copy())
        kfs.append(_KF(kps=[], pose=T_cw_n.copy()))

    for pid, X in enumerate(pts_gt):
        mp = _MP(position=X + rng.normal(0, point_noise, 3))
        wmap.points[pid] = mp
        for f, T_wc in enumerate(T_wc_gt):
            Xc = T_wc[:3, :3].T @ (X - T_wc[:3, 3])
            if Xc[2] <= 0:
                continue
            uv = (K @ (Xc / Xc[2]))[:2]
            if not (0 <= uv[0] < WIDTH and 0 <= uv[1] < HEIGHT):
                continue
            uv = uv + rng.normal(0, pix_noise, 2)
            kp_idx = len(kfs[f].kps)
            kfs[f].kps.append(_KP(pt=(float(uv[0]), float(uv[1]))))
            mp.observations.append((f, kp_idx, np.zeros(8)))
    return wmap, kfs, (pts_gt, T_wc_gt)


def reproj_rmse(wmap, kfs):
    se = 0.0
    n = 0
    for mp in wmap.points.values():
        for f, kp_idx, _ in mp.observations:
            T = kfs[f].pose
            Xc = T[:3, :3] @ mp.position + T[:3, 3]
            if Xc[2] <= 0:
                continue
            uv = (K @ (Xc / Xc[2]))[:2]
            u, v = kfs[f].kps[kp_idx].pt
            se += (uv[0] - u) ** 2 + (uv[1] - v) ** 2
            n += 2
    return math.sqrt(se / max(n, 1))


def test_two_view_ba_noise_free_stays_zero():
    wmap, kfs, _ = generate_scene(2)
    before = reproj_rmse(wmap, kfs)
    assert before < 1e-3
    assert two_view_ba(wmap, K, kfs, max_iters=5)
    assert reproj_rmse(wmap, kfs) < 1e-2


def test_two_view_ba_reduces_noise():
    wmap, kfs, _ = generate_scene(2, pix_noise=0.5, pose_trans_noise=0.05,
                                  pose_rot_noise_deg=2.0, point_noise=0.05)
    before = reproj_rmse(wmap, kfs)
    assert two_view_ba(wmap, K, kfs, max_iters=15)
    after = reproj_rmse(wmap, kfs)
    assert after < before * 0.5
    assert after < 2.0  # down to ~pixel-noise level


def test_pose_only_ba():
    wmap, kfs, _ = generate_scene(3, pose_trans_noise=0.0)
    # perturb only the last pose
    T = kfs[2].pose.copy()
    T[:3, 3] += [0.08, -0.05, 0.04]
    kfs[2].pose = T
    wmap.poses[2] = T.copy()
    before = reproj_rmse(wmap, kfs)
    assert pose_only_ba(wmap, K, kfs, kf_idx=2, max_iters=10)
    after = reproj_rmse(wmap, kfs)
    assert after < before * 0.1
    # other poses untouched
    np.testing.assert_allclose(kfs[0].pose, wmap.poses[0])


def test_pose_only_ba_too_few_residuals():
    wmap, kfs, _ = generate_scene(2, n_points=3)
    assert not pose_only_ba(wmap, K, kfs, kf_idx=1)


def test_local_ba_window_and_gauge():
    wmap, kfs, _ = generate_scene(6, pix_noise=0.3, pose_trans_noise=0.05,
                                  pose_rot_noise_deg=3.0, point_noise=0.05)
    poses_before = [kf.pose.copy() for kf in kfs]
    before = reproj_rmse(wmap, kfs)
    assert local_bundle_adjustment(wmap, K, kfs, center_kf_idx=5,
                                   window_size=3, max_iters=15)
    after = reproj_rmse(wmap, kfs)
    assert after < before
    # KFs outside the window [3..5] must be untouched (gauge)
    for k in range(0, 3):
        np.testing.assert_allclose(kfs[k].pose, poses_before[k])
    # at least one in-window pose moved
    assert any(not np.allclose(kfs[k].pose, poses_before[k]) for k in (3, 4, 5))


def test_global_ba_converges():
    wmap, kfs, (pts_gt, T_wc_gt) = generate_scene(
        5, pix_noise=0.0, pose_trans_noise=0.08, pose_rot_noise_deg=4.0,
        point_noise=0.08)
    before = reproj_rmse(wmap, kfs)
    assert global_bundle_adjustment(wmap, K, kfs, max_iters=25, fix_first=True)
    after = reproj_rmse(wmap, kfs)
    assert after < before * 0.05
    assert after < 0.5
    # first KF fixed (gauge anchor)
    np.testing.assert_allclose(kfs[0].pose, wmap.poses[0])


def test_core_ba_with_real_map_keyframe_indices():
    """Write-back must map KF index -> frame index via keyframe_indices."""
    from simpleslam_tpu.core.map import Map

    wmap_stub, kfs, _ = generate_scene(3, pix_noise=0.3,
                                       pose_trans_noise=0.03,
                                       pose_rot_noise_deg=1.0,
                                       point_noise=0.03)
    m = Map()
    # frames: 0 (KF0), 1 (plain), 2 (KF1), 3 (plain), 4 (KF2)
    frame_of_kf = [0, 2, 4]
    poses_frames = []
    for f in range(5):
        if f in frame_of_kf:
            k = frame_of_kf.index(f)
            m.add_pose(kfs[k].pose, is_keyframe=True)
        else:
            m.add_pose(np.eye(4), is_keyframe=False)
        poses_frames.append(m.poses[-1].copy())
    for pid, mp in wmap_stub.points.items():
        (nid,) = m.add_points(mp.position[None, :])
        for f, kp_idx, d in mp.observations:
            m.points[nid].add_observation(f, kp_idx, np.zeros(8, np.float32))

    assert local_bundle_adjustment(m, K, kfs, center_kf_idx=2,
                                   window_size=2, max_iters=8)
    # optimized KF2's pose written to FRAME 4 (not index 2 = the KF count)
    np.testing.assert_allclose(m.poses[4], kfs[2].pose)
    # KF1 (frame 2) is also in the window and must match its keyframe
    np.testing.assert_allclose(m.poses[2], kfs[1].pose)
    # plain (non-KF) frames are untouched
    np.testing.assert_allclose(m.poses[1], poses_frames[1])
    np.testing.assert_allclose(m.poses[3], poses_frames[3])


def test_point_major_path_matches_generic():
    """ba_solve(point_major_obs=O) must produce the SAME solve as the
    generic one-hot path on an identical (L, O) obs-table problem — the
    reshape/einsum reductions are an exact re-association of the one-hot
    matmuls (core/fused.local_ba's hot layout)."""
    from simpleslam_tpu.ops.ba import BAProblem, ba_solve

    rng = np.random.default_rng(3)
    P, L, O = 6, 128, 4
    E = L * O
    pts = np.stack([rng.uniform(-4, 4, L), rng.uniform(-2, 2, L),
                    rng.uniform(5, 25, L)], 1)
    poses = np.tile(np.eye(4), (P, 1, 1))
    poses[:, 0, 3] = np.arange(P) * 0.4
    cam_idx = rng.integers(0, P, E).astype(np.int32)
    pt_idx = np.repeat(np.arange(L, dtype=np.int32), O)
    Kb = jnp.asarray(K, jnp.float32)
    pc = np.einsum("eij,ej->ei", poses[cam_idx][:, :3, :3],
                   pts[pt_idx]) + poses[cam_idx][:, :3, 3]
    uv = (pc[:, :2] / pc[:, 2:3]) * 800.0 + np.array([640.0, 480.0])
    uv = uv + rng.normal(0, 0.8, (E, 2))
    e_valid = rng.random(E) > 0.1               # some dead edges too
    prob = BAProblem(
        poses=jnp.asarray(poses, jnp.float32),
        points=jnp.asarray(pts + rng.normal(0, 0.05, (L, 3)), jnp.float32),
        cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv, jnp.float32), e_valid=jnp.asarray(e_valid),
        cam_free=jnp.ones(P, bool).at[0].set(False),
        pt_free=jnp.ones(L, bool))

    pg, xg, c0g, c1g, ng = ba_solve(prob, Kb, max_iters=8)
    pm, xm, c0m, c1m, nm = ba_solve(prob, Kb, max_iters=8,
                                    point_major_obs=O)
    assert float(c1g) < 0.5 * float(c0g)        # a real optimization
    np.testing.assert_allclose(np.asarray(c0m), np.asarray(c0g), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c1m), np.asarray(c1g), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pg), atol=1e-4)
    np.testing.assert_allclose(np.asarray(xm), np.asarray(xg), atol=1e-3)

    with pytest.raises(ValueError):
        ba_solve(prob, Kb, max_iters=2, point_major_obs=3)  # E != L*3
