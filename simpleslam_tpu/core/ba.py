"""Bundle-adjustment orchestration: reference-parity API over the on-device
Schur-LM solver.

Mirrors the reference surface (slam/core/ba_utils.py:74-306):
  * :func:`two_view_ba` — refine KF0/KF1 + bootstrap landmarks (:74-84).
  * :func:`pose_only_ba` — one keyframe pose, points constant, Huber(2.0),
    skipped below 10 residuals (:89-140).
  * :func:`local_bundle_adjustment` — sliding window
    [center - window + 1, center] optimized, older KFs fixed as gauge
    (:146-165).
  * :func:`global_bundle_adjustment` — all KFs, optional fix-first (:170-215).

Assembly differences from the reference (deliberate, TPU-first):
  * the problem is packed into padded edge arrays once on host, then the
    entire LM solve runs as one jitted program (ops/ba.py) instead of
    per-residual Ceres factor graph construction;
  * pad sizes are bucketed to powers of two to bound recompilations;
  * the write-back indexes ``world_map.poses`` through
    ``world_map.keyframe_indices`` (KF -> frame), fixing the reference's
    latent KF-vs-frame indexing quirk (ba_utils.py:299-300; SURVEY.md §7
    sanctions this fix) while remaining compatible with duck-typed maps
    that lack keyframe bookkeeping.
"""
from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.ops.ba import BAProblem, ba_solve, pose_only_refine

logger = logging.getLogger("ba")


def _kp_uv(kf, kp_idx: int) -> Optional[np.ndarray]:
    """Measured pixel of keypoint kp_idx in a keyframe; supports our padded
    Features keyframes and duck-typed stubs with .kps lists of .pt objects."""
    feats = getattr(kf, "feats", None)
    if feats is not None:
        kpts = np.asarray(feats.kpts)
        if 0 <= kp_idx < len(kpts):
            return kpts[kp_idx]
        return None
    kps = getattr(kf, "kps", None)
    if kps is not None and 0 <= kp_idx < len(kps):
        kp = kps[kp_idx]
        return np.asarray(kp.pt if hasattr(kp, "pt") else kp, np.float64)
    return None


def _pad_to_bucket(n: int, minimum: int = 256) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _core_ba(world_map, K, kfs, *, opt_kf_idx: Sequence[int],
             fix_kf_idx: Sequence[int], max_points: Optional[int] = None,
             max_iters: int = 15, huber: float = 2.0,
             freeze_points: bool = False, info_tag: str = "[BA]") -> bool:
    """Assemble + solve + write back. Returns True if a solve ran."""
    opt_kf_idx = list(opt_kf_idx)
    fix_kf_idx = list(fix_kf_idx)
    cams = fix_kf_idx + opt_kf_idx            # local camera ordering
    cam_of_kf = {k: i for i, k in enumerate(cams)}
    n_cams = len(cams)
    if not opt_kf_idx or n_cams == 0:
        return False

    poses = np.stack([np.asarray(kfs[k].pose, np.float64) for k in cams])
    cam_free = np.array([k in set(opt_kf_idx) for k in cams], bool)

    # points observed by at least one optimizable KF (ba_utils.py:262-266)
    opt_set = set(opt_kf_idx)
    sel_pts, edges = [], []
    for pid, mp in world_map.points.items():
        obs = mp.observations
        if not obs:
            continue
        if not any(f in opt_set for f, _, _ in obs):
            continue
        li = len(sel_pts)
        sel_pts.append((pid, np.asarray(mp.position, np.float64)))
        for f, kp_idx, _ in obs:
            ci = cam_of_kf.get(f)
            if ci is None:
                continue
            uv = _kp_uv(kfs[f], kp_idx)
            if uv is None:
                continue
            edges.append((ci, li, float(uv[0]), float(uv[1])))
        if max_points is not None and len(sel_pts) >= max_points:
            break

    if len(edges) < 10 or not sel_pts:
        logger.info("%s skipped - %d residuals", info_tag, len(edges))
        return False

    L = _pad_to_bucket(len(sel_pts))
    E = _pad_to_bucket(len(edges))
    pts = np.zeros((L, 3), np.float32)
    pts[:len(sel_pts)] = np.stack([p for _, p in sel_pts])
    pt_free = np.zeros((L,), bool)
    pt_free[:len(sel_pts)] = not freeze_points

    earr = np.asarray(edges, np.float64)
    cam_idx = np.zeros((E,), np.int32)
    pt_idx = np.zeros((E,), np.int32)
    uv = np.zeros((E, 2), np.float32)
    e_valid = np.zeros((E,), bool)
    ne = len(edges)
    cam_idx[:ne] = earr[:, 0]
    pt_idx[:ne] = earr[:, 1]
    uv[:ne] = earr[:, 2:4]
    e_valid[:ne] = True

    problem = BAProblem(
        poses=jnp.asarray(poses, jnp.float32), points=jnp.asarray(pts),
        cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv), e_valid=jnp.asarray(e_valid),
        cam_free=jnp.asarray(cam_free),
        pt_free=jnp.asarray(pt_free))
    new_poses, new_points, c0, c1, n_good = ba_solve(
        problem, jnp.asarray(K, jnp.float32), huber=huber, max_iters=max_iters)

    new_poses = np.asarray(new_poses, np.float64)
    new_points = np.asarray(new_points, np.float64)
    logger.info("%s edges=%d pts=%d cams=%d cost %.1f -> %.1f (%d good iters)",
                info_tag, ne, len(sel_pts), n_cams, float(c0), float(c1),
                int(n_good))

    # write back poses (KFs + map trajectory) and points
    kf_to_frame = None
    kf_indices = getattr(world_map, "keyframe_indices", None)
    if kf_indices:
        kf_to_frame = {k: f for k, f in enumerate(kf_indices)}
    for i, k in enumerate(cams):
        if not cam_free[i]:
            continue
        kfs[k].pose = new_poses[i]
        frame = kf_to_frame.get(k, k) if kf_to_frame else k
        if 0 <= frame < len(world_map.poses):
            world_map.poses[frame][:] = new_poses[i]
    if not freeze_points:
        for li, (pid, _) in enumerate(sel_pts):
            world_map.points[pid].position = new_points[li]
    return True


# --------------------------------------------------------------------------- #
# Public API (reference parity)
# --------------------------------------------------------------------------- #

def two_view_ba(world_map, K, kfs, max_iters: int = 20) -> bool:
    """Refine the two bootstrap poses + all landmarks (ba_utils.py:74-84)."""
    assert len(world_map.poses) >= 2, "two_view_ba expects at least 2 poses"
    return _core_ba(world_map, K, kfs, opt_kf_idx=[0, 1], fix_kf_idx=[],
                    max_iters=max_iters, info_tag="[2-view BA]")


def pose_only_ba(world_map, K, kfs, kf_idx: int, max_iters: int = 8,
                 huber_thr: float = 2.0) -> bool:
    """Optimize one keyframe pose with landmarks constant (ba_utils.py:89-140)."""
    pts, uvs = [], []
    for mp in world_map.points.values():
        for f, kp_idx, _ in mp.observations:
            if f != kf_idx:
                continue
            uv = _kp_uv(kfs[kf_idx], kp_idx)
            if uv is None:
                continue
            pts.append(np.asarray(mp.position, np.float64))
            uvs.append(uv)
    if len(pts) < 10:
        logger.warning("[Pose-only BA] skipped - not enough residuals")
        return False

    E = _pad_to_bucket(len(pts))
    P3 = np.zeros((E, 3), np.float32)
    UV = np.zeros((E, 2), np.float32)
    V = np.zeros((E,), bool)
    P3[:len(pts)] = np.stack(pts)
    UV[:len(uvs)] = np.stack(uvs)
    V[:len(pts)] = True

    T, c0, c1 = pose_only_refine(
        jnp.asarray(np.asarray(kfs[kf_idx].pose, np.float32)),
        jnp.asarray(P3), jnp.asarray(UV), jnp.asarray(V),
        jnp.asarray(K, jnp.float32), huber=huber_thr, max_iters=max_iters)
    T = np.asarray(T, np.float64)
    kfs[kf_idx].pose = T
    kf_indices = getattr(world_map, "keyframe_indices", None)
    frame = kf_indices[kf_idx] if kf_indices and kf_idx < len(kf_indices) else kf_idx
    if 0 <= frame < len(world_map.poses):
        world_map.poses[frame][:] = T
    logger.debug("[Pose-only BA] residuals=%d cost %.1f -> %.1f",
                 len(pts), float(c0), float(c1))
    return True


def local_bundle_adjustment(world_map, K, kfs, center_kf_idx: int,
                            window_size: int = 6, max_points: int = 10000,
                            max_iters: int = 15) -> bool:
    """Sliding-window BA (ba_utils.py:146-165): KFs in
    [center - window + 1, center] optimized, all older KFs fixed (gauge)."""
    first_opt = max(1, center_kf_idx - window_size + 1)
    opt_kf = list(range(first_opt, center_kf_idx + 1))
    fix_kf = list(range(0, first_opt))
    logger.debug("[Local BA window] opt_kf=%s fix_kf=%s center=%d",
                 opt_kf, fix_kf, center_kf_idx)
    return _core_ba(world_map, K, kfs, opt_kf_idx=opt_kf, fix_kf_idx=fix_kf,
                    max_points=max_points, max_iters=max_iters,
                    info_tag=f"[Local BA @ KF {center_kf_idx}]")


def global_bundle_adjustment(world_map, K, kfs, max_points: Optional[int] = None,
                             max_iters: int = 30, fix_first: bool = True) -> bool:
    """Full-map BA (ba_utils.py:170-215; scaffolded-but-disabled in the
    reference's live loop — provided here fully working)."""
    n = len(kfs)
    if n < 2:
        return False
    fix_kf = [0] if fix_first else []
    opt_kf = list(range(1 if fix_first else 0, n))
    return _core_ba(world_map, K, kfs, opt_kf_idx=opt_kf, fix_kf_idx=fix_kf,
                    max_points=max_points, max_iters=max_iters,
                    info_tag="[Global BA]")
