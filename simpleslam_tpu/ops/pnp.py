"""Frame-to-map tracking ops: constant-velocity prediction, vectorized
2D-3D data association, and PnP-RANSAC with on-device Gauss-Newton refinement.

TPU-native replacement for the reference's PnP layer (slam/core/pnp_utils.py):

  * ``predict_pose_const_vel`` — identical formula,
    ``T_pred = T_prev @ inv(T_prevprev) @ T_prev`` (pnp_utils.py:26-30).
  * ``reproject_and_match_2d3d`` — the reference's Python loop over candidate
    landmarks x cKDTree window queries x per-observation descriptor distances
    (pnp_utils.py:224-304, the #2 hot spot per SURVEY.md §3) becomes one
    masked dense computation: project ALL landmarks, gate on the image window
    (radius_px), compute all landmark-ring x keypoint descriptor distances as
    MXU matmuls (best of the last <=6 observation descriptors,
    pnp_utils.py:115-127), threshold with the metric auto-switch
    (Hamming/uint8 vs L2/float, max_hamm=64 / max_l2=0.8), and resolve the
    one-keypoint-one-landmark constraint with a scatter-min by landmark order
    (the parallel analog of the reference's insertion-order greedy
    ``used_kps``; a landmark that loses its best keypoint to an earlier
    landmark is dropped for this frame rather than falling back to its
    second-best — immaterial at real keypoint densities).
  * ``solve_pnp_ransac`` — ``cv2.solvePnPRansac(SOLVEPNP_ITERATIVE)``
    (pnp_utils.py:307-341) becomes batched-hypothesis RANSAC (P3P minimal
    solves, ops/p3p.py — planar-safe, all quartic solutions of all samples
    scored at once; the extrinsic guess joins the pool) + LO-RANSAC
    Gauss-Newton refinement on the SE(3) tangent. The 6-point ``dlt_pose``
    remains available for non-degenerate overdetermined fits.
  * host-API parity helpers ``associate_landmarks`` / ``refine_pose_pnp`` /
    ``project_points_wc`` match the signatures the reference unit tests use
    (pnp_utils.py:147-221).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.ops import se3
from simpleslam_tpu.ops.matching import hamming_matrix, l2sq_matrix, unpack_bits
from simpleslam_tpu.ops.projection import project_points
from simpleslam_tpu.ops.ransac import sample_minimal_sets
from simpleslam_tpu.utils.precision import highest_precision

_EPS = 1e-12
_INF = jnp.float32(1e9)


# --------------------------------------------------------------------------- #
# Constant-velocity motion model
# --------------------------------------------------------------------------- #

@highest_precision
def predict_pose_const_vel(Tcw_prevprev: jax.Array,
                           Tcw_prev: jax.Array) -> jax.Array:
    """T_pred = T_prev @ inv(T_prevprev) @ T_prev (pnp_utils.py:26-30)."""
    return Tcw_prev @ se3.T_inverse(Tcw_prevprev) @ Tcw_prev


# --------------------------------------------------------------------------- #
# Vectorized 2D-3D association
# --------------------------------------------------------------------------- #

class Assoc2D3D(NamedTuple):
    """Per-landmark association result (padded to map capacity C)."""
    kp_idx: jax.Array     # (C,) int32 matched keypoint index (undefined if !valid)
    dist: jax.Array       # (C,) float32 descriptor distance
    uv_proj: jax.Array    # (C,2) projected landmark pixels
    valid: jax.Array      # (C,) bool


@partial(jax.jit, static_argnames=("img_w", "img_h", "chunk"))
def reproject_and_match_2d3d(
    positions: jax.Array,      # (C,3) f32 landmark positions
    alive: jax.Array,          # (C,)  bool
    desc_ring: jax.Array,      # (C,R,D) last-R observation descriptors
    n_desc: jax.Array,         # (C,)  int32 live ring slots
    kpts: jax.Array,           # (N,2) f32 current keypoints
    desc_cur: jax.Array,       # (N,D) current descriptors (u8 binary | float)
    kp_valid: jax.Array,       # (N,)  bool
    K: jax.Array, Tcw_pred: jax.Array,
    *, img_w: int, img_h: int,
    radius_px: float = 12.0, max_hamm: float = 64.0, max_l2: float = 0.8,
    chunk: int = 2048,
) -> Assoc2D3D:
    """Windowed descriptor association of map landmarks to frame keypoints.

    Semantics mirror pnp_utils.reproject_and_match_2d3d (:224-304); see
    module docstring for the one divergence (conflict losers drop out).
    Landmark chunks stream through VMEM-sized tiles via lax.map so the
    (C x N) work never materializes at full map capacity.
    """
    C = positions.shape[0]
    N = kpts.shape[0]
    binary = desc_cur.dtype == jnp.uint8
    thr = jnp.float32(max_hamm if binary else max_l2)
    r2 = jnp.float32(radius_px * radius_px)

    uv_all, z_all, in_front = project_points(positions, Tcw_pred, K)
    cand = (alive & in_front
            & (uv_all[:, 0] >= 0.0) & (uv_all[:, 0] < float(img_w))
            & (uv_all[:, 1] >= 0.0) & (uv_all[:, 1] < float(img_h))
            & (n_desc > 0))

    if binary:
        kp_bits = unpack_bits(desc_cur)                       # (N, 8D)
        kp_norm = jnp.sum(kp_bits, axis=1)
    else:
        kp_f = desc_cur.astype(jnp.float32)
        kp_norm = jnp.sum(kp_f * kp_f, axis=1)

    R = desc_ring.shape[1]
    D = desc_ring.shape[2]
    n_chunks = max(1, C // chunk)
    assert C % chunk == 0 or C < chunk, "map capacity must be chunk-aligned"

    def scored_chunk(chunk_data):
        """(CH, N) windowed best-over-ring distances (INF outside gates).

        The ring-slot mask folds into the self-norm term (invalid slots
        get +INF), so the (CH, R, N) distance tensor needs only ONE
        elementwise pass after the matmul — this op is HBM-bound.
        """
        uv_c, cand_c, ring_c, nd_c = chunk_data
        CH = uv_c.shape[0]
        d2 = (jnp.sum(uv_c * uv_c, axis=1)[:, None]
              + jnp.sum(kpts * kpts, axis=1)[None, :]
              - 2.0 * jax.lax.dot_general(
                  uv_c, kpts, (((1,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST))
        window = (d2 <= r2) & cand_c[:, None]

        flat = ring_c.reshape(CH * R, D)
        slot_ok = (jnp.arange(R)[None, :]
                   < jnp.minimum(nd_c, R)[:, None]).reshape(CH * R)
        if binary:
            bits = unpack_bits(flat)
            dot = jax.lax.dot_general(
                bits, kp_bits, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            self_n = jnp.where(slot_ok, jnp.sum(bits, axis=1), _INF)
            dd = self_n[:, None] + kp_norm[None, :] - 2.0 * dot
        else:
            ring_f = flat.astype(jnp.float32)
            # bf16-input matmul: descriptors are L2-normalized (entries
            # ~1e-1), so the ~0.4% dot rounding is far inside the max_l2
            # gate's tolerance — and it halves this HBM/MXU-bound op
            dot = jax.lax.dot_general(
                ring_f, kp_f, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            self_n = jnp.where(slot_ok, jnp.sum(ring_f * ring_f, axis=1),
                               _INF)
            dd = jnp.maximum(self_n[:, None] + kp_norm[None, :] - 2.0 * dot,
                             0.0)
        best_sq = jnp.min(dd.reshape(CH, R, N), axis=1)       # (CH, N)
        best = best_sq if binary else jnp.sqrt(best_sq)
        return jnp.where(window & (best <= thr), best, _INF)

    if C <= chunk:
        scored = scored_chunk((uv_all, cand, desc_ring, n_desc))
    else:
        def maybe_chunk(chunk_data):
            """Chunks with zero candidates (rows past n_points, or fully
            out-of-view) skip the two matmuls at RUNTIME: inside lax.map's
            scan a lax.cond stays a real branch, so the common case of a
            map filled well below capacity only pays for live chunks."""
            cand_c = chunk_data[1]
            return jax.lax.cond(
                jnp.any(cand_c),
                scored_chunk,
                lambda _c: jnp.full((cand_c.shape[0], N), _INF),
                chunk_data)

        ch = (uv_all.reshape(n_chunks, chunk, 2),
              cand.reshape(n_chunks, chunk),
              desc_ring.reshape(n_chunks, chunk, R, D),
              n_desc.reshape(n_chunks, chunk))
        scored = jax.lax.map(maybe_chunk, ch).reshape(C, N)

    def best_of(kp_mask):
        s = jnp.where(kp_mask[None, :], scored, _INF)
        best_kp = jnp.argmin(s, axis=1).astype(jnp.int32)
        best_d = jnp.take_along_axis(s, best_kp[:, None], axis=1)[:, 0]
        return best_kp, best_d

    def resolve(best_kp, best_d, eligible):
        """One-kp-one-landmark: earliest landmark (lowest row) wins among
        the eligible claimants (insertion-order greedy analog of the
        reference's used_kps set)."""
        has = (best_d < _INF) & eligible
        order = jnp.arange(C, dtype=jnp.int32)
        claim = jnp.where(has, best_kp, N)   # N = dummy no-claim bucket
        winner = jnp.full((N + 1,), C, jnp.int32).at[claim].min(order)
        return has, has & (winner[claim] == order)

    best_kp, best_d = best_of(kp_valid)
    has1, valid1 = resolve(best_kp, best_d, jnp.ones((C,), bool))

    # Round 2: conflict losers retry on the keypoints left unclaimed — the
    # parallel analog of the reference's greedy scan falling through to the
    # next-best in-window candidate for later landmarks. The scored matrix
    # is reused; only the argmin re-runs.
    taken = jnp.zeros((N + 1,), bool).at[
        jnp.where(valid1, best_kp, N)].set(True).at[N].set(False)[:N]
    best_kp2, best_d2 = best_of(kp_valid & ~taken)
    _, valid2 = resolve(best_kp2, best_d2, has1 & ~valid1)

    kp_idx = jnp.where(valid1, best_kp, best_kp2)
    dist = jnp.where(valid1, best_d, best_d2)
    valid = valid1 | valid2
    return Assoc2D3D(kp_idx=kp_idx, dist=dist, uv_proj=uv_all, valid=valid)


# --------------------------------------------------------------------------- #
# PnP solvers
# --------------------------------------------------------------------------- #

@highest_precision
def dlt_pose(pts3d: jax.Array, uv_n: jax.Array,
             w: jax.Array | None = None) -> jax.Array:
    """Direct linear transform camera pose from >=6 points.

    ``uv_n`` are K-normalized image coords. Solves P = [R|t] up to scale via
    the 2k x 12 homogeneous system, then projects onto SE(3) (SVD
    orthogonalization + cheirality sign fix). Returns a 4x4 T_cw.
    """
    k = pts3d.shape[0]
    if w is None:
        w = jnp.ones((k,), pts3d.dtype)
    Xh = jnp.concatenate([pts3d, jnp.ones((k, 1), pts3d.dtype)], axis=1)  # (k,4)
    zeros = jnp.zeros_like(Xh)
    r1 = jnp.concatenate([Xh, zeros, -uv_n[:, 0:1] * Xh], axis=1)
    r2 = jnp.concatenate([zeros, Xh, -uv_n[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0) * jnp.concatenate([w, w])[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=A.shape[0] < A.shape[1])
    P = Vt[-1, :].reshape(3, 4)

    # global sign from cheirality BEFORE orthogonalization: the projective
    # depth w_i = P[2] . Xh_i must be positive for in-front points
    depth_sign = jnp.sum(jnp.where(w > 0, jnp.sign(Xh @ P[2, :]), 0.0))
    P = jnp.where(depth_sign < 0, -P, P)

    M = P[:, :3]
    U, S, Vt2 = jnp.linalg.svd(M)
    scale = jnp.maximum(jnp.mean(S), _EPS)
    R = se3.project_to_SO3(M)
    t = P[:, 3] / scale
    return se3.rt_to_T(R, t)


@highest_precision
def pnp_residual_sq(Tcw: jax.Array, pts3d: jax.Array, uv: jax.Array,
                    K: jax.Array) -> jax.Array:
    """Squared pixel reprojection error per point; behind-camera -> +inf."""
    uvp, z, front = project_points(pts3d, Tcw, K)
    e = jnp.sum((uvp - uv) ** 2, axis=-1)
    return jnp.where(front, e, _INF)


@highest_precision
def gn_refine_pose(Tcw0: jax.Array, pts3d: jax.Array, uv: jax.Array,
                   K: jax.Array, weights: jax.Array,
                   iters: int = 10, damping: float = 1e-4) -> jax.Array:
    """Gauss-Newton (lightly damped) pose refinement on the SE(3) tangent.

    Left-multiplicative updates ``T <- exp(xi) T``; replaces the iterative
    half of cv2.solvePnPRansac(SOLVEPNP_ITERATIVE).
    """
    fx, fy = K[0, 0], K[1, 1]

    def step(_, T):
        R = T[:3, :3]
        t = T[:3, 3]
        pc = pts3d @ R.T + t                          # (M,3)
        z = jnp.maximum(pc[:, 2], 1e-6)
        x, y = pc[:, 0], pc[:, 1]
        u_pred = fx * x / z + K[0, 2]
        v_pred = fy * y / z + K[1, 2]
        r = jnp.stack([u_pred - uv[:, 0], v_pred - uv[:, 1]], axis=1)  # (M,2)

        # d(uv)/d(p_c)
        zi = 1.0 / z
        Ju = jnp.stack([fx * zi, jnp.zeros_like(z), -fx * x * zi * zi], axis=1)
        Jv = jnp.stack([jnp.zeros_like(z), fy * zi, -fy * y * zi * zi], axis=1)
        # d(p_c)/d(xi) = [I | -hat(p_c)] (left perturbation)
        Jp = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), (pc.shape[0], 3, 3)),
             -se3.hat(pc)], axis=2)                    # (M,3,6)
        J = jnp.stack([jnp.einsum("mi,mij->mj", Ju, Jp),
                       jnp.einsum("mi,mij->mj", Jv, Jp)], axis=1)  # (M,2,6)

        wv = weights * (pc[:, 2] > 1e-6)
        Jw = J * wv[:, None, None]
        H = jnp.einsum("mri,mrj->ij", Jw, J) + damping * jnp.eye(6, dtype=T.dtype)
        g = jnp.einsum("mri,mr->i", Jw, r)
        xi = -jnp.linalg.solve(H, g)
        return se3.se3_exp(xi) @ T

    return jax.lax.fori_loop(0, iters, step, Tcw0)


@partial(jax.jit, static_argnames=("n_hyp", "refine_iters", "lo_rounds"))
def solve_pnp_ransac(key: jax.Array,
                     pts3d: jax.Array, uv: jax.Array, valid: jax.Array,
                     K: jax.Array, ransac_px: float,
                     Tcw_init: Optional[jax.Array] = None,
                     n_hyp: int = 256, refine_iters: int = 6,
                     lo_rounds: int = 2):
    """Batched-hypothesis PnP-RANSAC -> (T_cw, inlier mask, n_inliers, ok).

    cv2.solvePnPRansac equivalent (pnp_utils.py:307-341): 6-point DLT
    hypotheses scored all at once; the extrinsic guess (``Tcw_init``, the
    const-velocity prediction at the call site, main_revamped.py:469-475)
    joins the hypothesis pool; the winner is polished with Gauss-Newton on
    its inliers and re-scored.
    """
    M = pts3d.shape[0]
    thresh_sq = jnp.float32(ransac_px) ** 2

    fx, fy = K[0, 0], K[1, 1]
    uv_n = jnp.stack([(uv[:, 0] - K[0, 2]) / fx,
                      (uv[:, 1] - K[1, 2]) / fy], axis=1)

    # P3P minimal hypotheses (planar-safe; the 6-point DLT degenerates on
    # coplanar samples — walls/ground planes — exactly like cv2's minimal
    # stage this uses 3-point pose with all quartic solutions scored)
    from simpleslam_tpu.ops.p3p import p3p_grunert

    idx, ok_h = sample_minimal_sets(key, valid, 3, n_hyp)
    ones = jnp.ones((M, 1), uv_n.dtype)
    rays = jnp.concatenate([uv_n, ones], axis=1)
    rays = rays / jnp.linalg.norm(rays, axis=1, keepdims=True)
    poses4, pvalid4 = jax.vmap(
        lambda i: p3p_grunert(pts3d[i], rays[i]))(idx)     # (S,4,4,4), (S,4)
    models = poses4.reshape(-1, 4, 4)
    ok_h = (ok_h[:, None] & pvalid4).reshape(-1)
    if Tcw_init is not None:
        models = jnp.concatenate([Tcw_init[None], models], axis=0)
        ok_h = jnp.concatenate([jnp.ones((1,), bool), ok_h])

    res = jax.vmap(lambda T: pnp_residual_sq(T, pts3d, uv, K))(models)
    inl = (res < thresh_sq) & valid[None, :]
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    counts = jnp.where(ok_h, counts, -1)
    best = jnp.argmax(counts)
    T_best = models[best]
    inl_best = inl[best]

    # LO-RANSAC polish: alternate (GN refine on inliers -> re-gate inliers),
    # keeping the best-by-count iterate. A single pass can get stuck on the
    # winner's possibly-biased inlier set; a second round lets the set
    # expand (each GN iteration is a sequential kernel chain on TPU, so the
    # round/iteration budget is deliberately tight).
    def lo_step(_, carry):
        T_cur, inl_cur, T_out, inl_out = carry
        T_ref = gn_refine_pose(T_cur, pts3d, uv, K,
                               inl_cur.astype(jnp.float32), iters=refine_iters)
        res_ref = pnp_residual_sq(T_ref, pts3d, uv, K)
        inl_ref = (res_ref < thresh_sq) & valid
        better = jnp.sum(inl_ref) >= jnp.sum(inl_out)
        T_out = jnp.where(better, T_ref, T_out)
        inl_out = jnp.where(better, inl_ref, inl_out)
        return T_ref, inl_ref, T_out, inl_out

    _, _, T_out, inl_out = jax.lax.fori_loop(
        0, lo_rounds, lo_step, (T_best, inl_best, T_best, inl_best))
    n = jnp.sum(inl_out.astype(jnp.int32))
    return T_out, inl_out, n, n >= 4


# --------------------------------------------------------------------------- #
# Host-API parity helpers (signatures used by the reference unit tests,
# pnp_utils.py:147-221)
# --------------------------------------------------------------------------- #

def project_points_wc(K, pose_w_c, pts_w) -> np.ndarray:
    """Project with a camera->world pose; invalid/behind points -> (-1,-1)
    (reference ``project_points``, pnp_utils.py:147-152)."""
    pts_w = np.asarray(pts_w, np.float64)
    if pts_w.size == 0:
        return np.empty((0, 2), np.float32)
    Tcw = np.asarray(se3.T_inverse(jnp.asarray(pose_w_c, jnp.float32)))
    uv, z, front = project_points(jnp.asarray(pts_w, jnp.float32),
                                  jnp.asarray(Tcw), jnp.asarray(K, jnp.float32))
    uv = np.array(uv, np.float32)   # writable host copy
    uv[~np.asarray(front)] = -1.0
    return uv


def associate_landmarks(K, pose_w_c, pts_w, kps_cur, search_rad: float = 5.0):
    """Greedy nearest-keypoint association within a pixel window
    (reference pnp_utils.associate_landmarks, :170-221). Host API: returns
    (pts3d (M,3), pts2d (M,2), kp_ids list)."""
    pts_w = np.asarray(pts_w, np.float32)
    kp_xy = np.asarray([k.pt if hasattr(k, "pt") else k for k in kps_cur],
                       np.float32).reshape(-1, 2)
    if pts_w.size == 0 or kp_xy.size == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 2), np.float32), [])

    proj = project_points_wc(K, pose_w_c, pts_w)
    used = np.zeros(len(kp_xy), bool)
    p3, p2, ids = [], [], []
    for i, uv in enumerate(proj):
        if uv[0] < 0 or uv[1] < 0:
            continue
        d = np.linalg.norm(kp_xy - uv, axis=1)
        d[used] = np.inf
        best = int(np.argmin(d))
        if d[best] > search_rad:
            continue
        used[best] = True
        p3.append(pts_w[i])
        p2.append(kp_xy[best])
        ids.append(best)
    if not p3:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 2), np.float32), [])
    return np.asarray(p3, np.float32), np.asarray(p2, np.float32), ids


def refine_pose_pnp(K, pts3d, pts2d, ransac_px: float = 2.0):
    """Estimate (R, t) world->camera from 2D-3D pairs; None on failure
    (reference pnp_utils.refine_pose_pnp, :195-221)."""
    pts3d = np.asarray(pts3d, np.float32)
    pts2d = np.asarray(pts2d, np.float32)
    if len(pts3d) < 4 or len(pts2d) < 4:
        return None, None
    # solve_pnp_ransac seeds from 3-point (P3P) minimal sets, so 4-5 point
    # calls run directly — no row padding needed.
    T, inl, n, ok = solve_pnp_ransac(
        jax.random.PRNGKey(0), jnp.asarray(pts3d), jnp.asarray(pts2d),
        jnp.ones(len(pts3d), bool), jnp.asarray(K, jnp.float32),
        float(ransac_px), n_hyp=128)
    if not bool(ok):
        return None, None
    T = np.asarray(T, np.float64)
    return T[:3, :3], T[:3, 3]


# --------------------------------------------------------------------------- #
# Reference-shaped host wrappers
# --------------------------------------------------------------------------- #

class Matches2D3D(NamedTuple):
    """Compact 2D-3D association result (reference pnp_utils.Matches2D3D,
    :51-57): world points, matched pixels, keypoint indices, landmark ids."""
    pts3d: np.ndarray
    pts2d: np.ndarray
    kp_indices: list
    mp_ids: list


def reproject_and_match_2d3d_host(world_map, K, Tcw_pred, feats,
                                  img_w: int, img_h: int, *,
                                  radius_px: float = 12.0,
                                  max_hamm: float = 64.0,
                                  max_l2: float = 0.8,
                                  capacity: int = 0) -> Matches2D3D:
    """Reference-shaped wrapper over the jitted association: takes the live
    Map + padded Features, returns a compact Matches2D3D."""
    desc = np.asarray(feats.desc)
    cap = capacity or max(1024, 1 << (len(world_map) - 1).bit_length())
    snap = world_map.snapshot(cap, desc.shape[1], desc.dtype)
    out = reproject_and_match_2d3d(
        jnp.asarray(snap["positions"]), jnp.asarray(snap["alive"]),
        jnp.asarray(snap["desc"]), jnp.asarray(snap["n_desc"]),
        feats.kpts, feats.desc, feats.valid,
        jnp.asarray(np.asarray(K), jnp.float32),
        jnp.asarray(np.asarray(Tcw_pred), jnp.float32),
        img_w=int(img_w), img_h=int(img_h), radius_px=radius_px,
        max_hamm=max_hamm, max_l2=max_l2)
    valid = np.asarray(out.valid)
    kp_idx = np.asarray(out.kp_idx)
    rows = np.flatnonzero(valid)
    kpts = np.asarray(feats.kpts)
    return Matches2D3D(
        pts3d=snap["positions"][rows].astype(np.float32),
        pts2d=kpts[kp_idx[rows]].astype(np.float32),
        kp_indices=[int(k) for k in kp_idx[rows]],
        mp_ids=[int(p) for p in snap["pid"][rows]])


def draw_reprojection_debug(img, uv_meas, uv_proj, inlier_mask=None):
    """Measured (green) vs projected (red) keypoints with connecting lines
    (reference pnp_utils.draw_reprojection_debug, :345-364); returns the
    drawn BGR image (no-op copy without cv2)."""
    try:
        import cv2
    except Exception:
        return np.asarray(img).copy()
    out = np.asarray(img)
    if out.ndim == 2:
        out = np.repeat(out[..., None], 3, axis=2)
    out = out.copy()
    uv_meas = np.asarray(uv_meas)
    uv_proj = np.asarray(uv_proj)
    for i, (m, p) in enumerate(zip(uv_meas, uv_proj)):
        ok = inlier_mask[i] if inlier_mask is not None else True
        pm = tuple(int(v) for v in m)
        pp = tuple(int(v) for v in p)
        cv2.circle(out, pm, 2, (0, 255, 0) if ok else (128, 128, 128), -1)
        cv2.circle(out, pp, 2, (0, 0, 255), -1)
        cv2.line(out, pm, pp, (0, 200, 255), 1)
    return out
