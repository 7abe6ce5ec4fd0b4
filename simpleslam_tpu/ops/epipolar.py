"""Two-view epipolar geometry in pure JAX: H / F / E estimation (batched
RANSAC), decompositions, and pose recovery.

TPU-native replacements (SURVEY.md §2 native table) for:
  * ``cv2.findHomography`` / ``cv2.findFundamentalMat``
    (reference: two_view_bootstrap.py:230-231, features_utils.py:195-196)
    -> :func:`find_homography` / :func:`find_fundamental` — batched-hypothesis
    RANSAC (4-pt / 8-pt minimal DLT fits, all hypotheses scored in parallel)
    + masked least-squares refit on the winning inlier set.
  * ``cv2.findEssentialMat`` (main_revamped.py:512) -> :func:`find_essential`
    (8-pt on K-normalized coords, projection onto the essential manifold,
    Sampson gating in normalized units).
  * ``cv2.recoverPose`` (two_view_bootstrap.py:202-220) ->
    :func:`recover_pose_essential` — closed-form E -> 4 (R, t) candidates +
    batched cheirality vote via DLT triangulation.
  * ``cv2.decomposeHomographyMat`` (two_view_bootstrap.py:174-200) ->
    :func:`decompose_homography` — Faugeras SVD-based analytical
    decomposition producing the standard candidate set.

Residuals match the reference's scoring: symmetric transfer error for H and
Sampson distance for F (two_view_bootstrap.py:74-105).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from simpleslam_tpu.ops import se3
from simpleslam_tpu.ops.ransac import ransac
from simpleslam_tpu.ops.triangulation import triangulate_two_view, projection_matrix
from simpleslam_tpu.utils.precision import highest_precision

_EPS = 1e-12


# --------------------------------------------------------------------------- #
# Hartley normalization + DLT fits (weighted => usable for minimal & refit)
# --------------------------------------------------------------------------- #

def _normalizing_transform(pts: jax.Array, w: jax.Array) -> jax.Array:
    """Similarity T mapping weighted points to centroid 0 / mean dist sqrt(2)."""
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    mean = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=1) + _EPS)
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / wsum, _EPS)
    return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]) \
        .at[0, 0].set(scale).at[1, 1].set(scale) \
        .at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])


def _apply_h(T: jax.Array, pts: jax.Array) -> jax.Array:
    x = T[0, 0] * pts[:, 0] + T[0, 1] * pts[:, 1] + T[0, 2]
    y = T[1, 0] * pts[:, 0] + T[1, 1] * pts[:, 1] + T[1, 2]
    return jnp.stack([x, y], axis=-1)


def _smallest_singular_vector(A: jax.Array) -> jax.Array:
    """Right-singular vector of the smallest singular value of A (m, n).

    Computed as the smallest eigenvector of the n x n Gram matrix A^T A:
    one small symmetric eigendecomposition instead of an (m, n) SVD — the
    batched minimal-fit SVDs were the dominant cost of every H/F/E RANSAC
    on TPU, and the refit SVD materialized a thrown-away (2N, 2N) U. The
    Gram formulation squares the condition number, which Hartley
    normalization keeps harmless at these sizes (n <= 9), and every RANSAC
    consumer re-gates inliers after the fit anyway.
    """
    G = jax.lax.dot_general(A, A, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    _, V = jnp.linalg.eigh(G)          # ascending eigenvalues
    return V[:, 0]


@highest_precision
def fit_homography(p0: jax.Array, p1: jax.Array,
                   w: jax.Array | None = None) -> jax.Array:
    """(Weighted) normalized DLT homography p1 ~ H p0. Works for the 4-point
    minimal case and masked least-squares refits alike."""
    n = p0.shape[0]
    if w is None:
        w = jnp.ones((n,), p0.dtype)
    T0 = _normalizing_transform(p0, w)
    T1 = _normalizing_transform(p1, w)
    a = _apply_h(T0, p0)
    b = _apply_h(T1, p1)
    zeros = jnp.zeros((n, 3), p0.dtype)
    ah = jnp.concatenate([a, jnp.ones((n, 1), p0.dtype)], axis=1)  # (n,3)
    r1 = jnp.concatenate([ah, zeros, -b[:, 0:1] * ah], axis=1)     # (n,9)
    r2 = jnp.concatenate([zeros, ah, -b[:, 1:2] * ah], axis=1)
    A = jnp.concatenate([r1, r2], axis=0) * jnp.concatenate([w, w])[:, None]
    h = _smallest_singular_vector(A)
    Hn = h.reshape(3, 3)
    H = jnp.linalg.inv(T1) @ Hn @ T0
    return H / jnp.where(jnp.abs(H[2, 2]) < _EPS, _EPS, H[2, 2])


@highest_precision
def fit_fundamental(p0: jax.Array, p1: jax.Array,
                    w: jax.Array | None = None) -> jax.Array:
    """(Weighted) normalized 8-point fundamental matrix with rank-2
    projection; p1^T F p0 = 0."""
    n = p0.shape[0]
    if w is None:
        w = jnp.ones((n,), p0.dtype)
    T0 = _normalizing_transform(p0, w)
    T1 = _normalizing_transform(p1, w)
    a = _apply_h(T0, p0)
    b = _apply_h(T1, p1)
    x0, y0 = a[:, 0], a[:, 1]
    x1, y1 = b[:, 0], b[:, 1]
    ones = jnp.ones_like(x0)
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, ones],
                  axis=1) * w[:, None]
    f = _smallest_singular_vector(A)
    Fn = f.reshape(3, 3)
    # rank-2 projection
    U, S, Vt = jnp.linalg.svd(Fn)
    Fn = (U * jnp.stack([S[0], S[1], jnp.zeros_like(S[2])])[None, :]) @ Vt
    F = T1.T @ Fn @ T0
    nrm = jnp.linalg.norm(F)
    return F / jnp.where(nrm < _EPS, _EPS, nrm)


@highest_precision
def fit_essential(p0n: jax.Array, p1n: jax.Array,
                  w: jax.Array | None = None) -> jax.Array:
    """8-point essential matrix on K-normalized coords: fit F-style then
    project onto the essential manifold (singular values (s, s, 0))."""
    E = fit_fundamental(p0n, p1n, w)
    U, S, Vt = jnp.linalg.svd(E)
    s = 0.5 * (S[0] + S[1])
    return (U * jnp.stack([s, s, jnp.zeros_like(s)])[None, :]) @ Vt


# --------------------------------------------------------------------------- #
# Residuals (match reference scoring: two_view_bootstrap.py:74-105)
# --------------------------------------------------------------------------- #

@highest_precision
def symmetric_transfer_error_sq(H: jax.Array, p0: jax.Array,
                                p1: jax.Array) -> jax.Array:
    """d(p1, H p0)^2 + d(p0, H^-1 p1)^2 per correspondence (px^2)."""
    Hinv = jnp.linalg.inv(H)

    def transfer(M, p):
        x = M[0, 0] * p[:, 0] + M[0, 1] * p[:, 1] + M[0, 2]
        y = M[1, 0] * p[:, 0] + M[1, 1] * p[:, 1] + M[1, 2]
        z = M[2, 0] * p[:, 0] + M[2, 1] * p[:, 1] + M[2, 2]
        z = jnp.where(jnp.abs(z) < _EPS, _EPS, z)
        return jnp.stack([x / z, y / z], axis=-1)

    e01 = jnp.sum((transfer(H, p0) - p1) ** 2, axis=-1)
    e10 = jnp.sum((transfer(Hinv, p1) - p0) ** 2, axis=-1)
    return e01 + e10


@highest_precision
def sampson_error_sq(F: jax.Array, p0: jax.Array, p1: jax.Array) -> jax.Array:
    """First-order geometric (Sampson) squared distance to the epipolar
    constraint p1^T F p0 = 0."""
    ones = jnp.ones((p0.shape[0], 1), p0.dtype)
    x0 = jnp.concatenate([p0, ones], axis=1)          # (N,3)
    x1 = jnp.concatenate([p1, ones], axis=1)
    Fx0 = x0 @ F.T                                     # F @ x0 per row
    Ftx1 = x1 @ F                                      # F^T @ x1 per row
    num = jnp.sum(x1 * Fx0, axis=1) ** 2
    den = Fx0[:, 0] ** 2 + Fx0[:, 1] ** 2 + Ftx1[:, 0] ** 2 + Ftx1[:, 1] ** 2
    return num / jnp.maximum(den, _EPS)


# --------------------------------------------------------------------------- #
# RANSAC front doors (cv2.findX equivalents)
# --------------------------------------------------------------------------- #

@partial(jax.jit, static_argnames=("n_hyp", "refit_iters"))
def find_homography(key: jax.Array, p0: jax.Array, p1: jax.Array,
                    valid: jax.Array, thresh_px: float,
                    n_hyp: int = 256, refit_iters: int = 2):
    """cv2.findHomography(RANSAC) equivalent -> (H, inliers, ok).

    Scoring uses symmetric transfer error; the winner is polished with
    ``refit_iters`` masked least-squares refits on its inlier set.
    """
    # symmetric transfer sums two squared distances -> use 2 * t^2 like cv2's
    # per-direction t each; the reference scores chi2 per-direction separately,
    # handled in the bootstrap module. Here: inlier iff sym err < 2 t^2.
    thresh_sq = 2.0 * thresh_px * thresh_px
    H, inl, score, ok = ransac(
        key, p0, p1, valid,
        fit_fn=lambda a, b: fit_homography(a, b),
        residual_fn=symmetric_transfer_error_sq,
        k=4, n_hyp=n_hyp, thresh_sq=thresh_sq, score="count")

    def refit(_, carry):
        H, inl = carry
        w = inl.astype(p0.dtype)
        H2 = fit_homography(p0, p1, w)
        r = symmetric_transfer_error_sq(H2, p0, p1)
        inl2 = (r < thresh_sq) & valid
        good = jnp.sum(inl2) >= 4
        return (jnp.where(good, H2, H), jnp.where(good, inl2, inl))

    H, inl = jax.lax.fori_loop(0, refit_iters, refit, (H, inl))
    return H, inl, ok & (jnp.sum(inl) >= 4)


@partial(jax.jit, static_argnames=("n_hyp", "refit_iters"))
def find_fundamental(key: jax.Array, p0: jax.Array, p1: jax.Array,
                     valid: jax.Array, thresh_px: float,
                     n_hyp: int = 256, refit_iters: int = 2):
    """cv2.findFundamentalMat(RANSAC) equivalent -> (F, inliers, ok)."""
    thresh_sq = thresh_px * thresh_px
    F, inl, score, ok = ransac(
        key, p0, p1, valid,
        fit_fn=lambda a, b: fit_fundamental(a, b),
        residual_fn=sampson_error_sq,
        k=8, n_hyp=n_hyp, thresh_sq=thresh_sq, score="count")

    def refit(_, carry):
        F, inl = carry
        w = inl.astype(p0.dtype)
        F2 = fit_fundamental(p0, p1, w)
        r = sampson_error_sq(F2, p0, p1)
        inl2 = (r < thresh_sq) & valid
        good = jnp.sum(inl2) >= 8
        return (jnp.where(good, F2, F), jnp.where(good, inl2, inl))

    F, inl = jax.lax.fori_loop(0, refit_iters, refit, (F, inl))
    return F, inl, ok & (jnp.sum(inl) >= 8)


@partial(jax.jit, static_argnames=("n_hyp",))
def find_essential(key: jax.Array, p0: jax.Array, p1: jax.Array,
                   valid: jax.Array, K: jax.Array, thresh_px: float,
                   n_hyp: int = 256):
    """cv2.findEssentialMat(RANSAC) equivalent -> (E, inliers, ok).

    Points are lifted through K^-1; the pixel threshold is converted to
    normalized units via the mean focal length (cv2's convention).
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    p0n = jnp.stack([(p0[:, 0] - cx) / fx, (p0[:, 1] - cy) / fy], axis=-1)
    p1n = jnp.stack([(p1[:, 0] - cx) / fx, (p1[:, 1] - cy) / fy], axis=-1)
    t_norm = thresh_px / (0.5 * (fx + fy))
    thresh_sq = t_norm * t_norm
    E, inl, score, ok = ransac(
        key, p0n, p1n, valid,
        fit_fn=lambda a, b: fit_essential(a, b),
        residual_fn=sampson_error_sq,
        k=8, n_hyp=n_hyp, thresh_sq=thresh_sq, score="count")
    w = inl.astype(p0.dtype)
    E2 = fit_essential(p0n, p1n, w)
    r = sampson_error_sq(E2, p0n, p1n)
    inl2 = (r < thresh_sq) & valid
    better = jnp.sum(inl2) >= jnp.sum(inl)
    E = jnp.where(better, E2, E)
    inl = jnp.where(better, inl2, inl)
    # nonlinear Sampson polish on the (R, t) manifold — brings the 8-point
    # linear estimate to 5-point-solver quality
    E3 = refine_essential_sampson(E, p0n, p1n, inl.astype(p0.dtype))
    r3 = sampson_error_sq(E3, p0n, p1n)
    inl3 = (r3 < thresh_sq) & valid
    better3 = jnp.sum(inl3) >= jnp.sum(inl)
    E = jnp.where(better3, E3, E)
    inl = jnp.where(better3, inl3, inl)
    return E, inl, ok & (jnp.sum(inl) >= 8)


def essential_from_fundamental(F: jax.Array, K: jax.Array) -> jax.Array:
    """E = K^T F K (reference: two_view_bootstrap.py:206)."""
    return K.T @ F @ K


@highest_precision
def refine_essential_sampson(E: jax.Array, p0n: jax.Array, p1n: jax.Array,
                             w: jax.Array, iters: int = 4) -> jax.Array:
    """Gauss-Newton refinement of an essential matrix on its 5-dof manifold
    (R in SO(3), t on the unit sphere), minimizing Sampson error over the
    weighted correspondences. Closes most of the accuracy gap between the
    8-point linear fit and a 5-point minimal solver + polish (the quality
    cv2.findEssentialMat delivers).
    """
    # initialize (R, t) from E by the cheirality vote on the weighted points
    R1, R2, t0 = decompose_essential(E)
    ones = jnp.ones((p0n.shape[0], 1), p0n.dtype)
    x0h = jnp.concatenate([p0n, ones], axis=1)
    x1h = jnp.concatenate([p1n, ones], axis=1)

    def cheir_count(R, t):
        z0, z1 = two_view_depths(R, t, x0h, x1h)
        return jnp.sum(((z0 > 0) & (z1 > 0)).astype(jnp.float32) * w)

    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t0, -t0, t0, -t0])
    counts = jax.vmap(cheir_count)(Rs, ts)
    best = jnp.argmax(counts)
    R = Rs[best]
    t = ts[best]

    def gn_step(_, carry):
        R_cur, t_cur = carry

        def res(params):
            w_rot, a, b = params[:3], params[3], params[4]
            Rc = se3.so3_exp(w_rot) @ R_cur
            e = jnp.where(jnp.abs(t_cur[0]) < 0.9,
                          jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
            b1 = jnp.cross(t_cur, e)
            b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), _EPS)
            b2 = jnp.cross(t_cur, b1)
            tc = t_cur + a * b1 + b * b2
            tc = tc / jnp.maximum(jnp.linalg.norm(tc), _EPS)
            Ec = se3.hat(tc) @ Rc
            return jnp.sqrt(sampson_error_sq(Ec, p0n, p1n) + 1e-12) * w

        p0_ = jnp.zeros(5)
        J = jax.jacfwd(res)(p0_)                 # (N, 5)
        r = res(p0_)
        H = J.T @ J + 1e-8 * jnp.eye(5)
        dp = -jnp.linalg.solve(H, J.T @ r)
        better = jnp.sum(res(dp) ** 2) < jnp.sum(r ** 2)
        dp = jnp.where(better, dp, 0.0)
        R_new = se3.so3_exp(dp[:3]) @ R_cur
        e = jnp.where(jnp.abs(t_cur[0]) < 0.9,
                      jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
        b1 = jnp.cross(t_cur, e)
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), _EPS)
        b2 = jnp.cross(t_cur, b1)
        t_new = t_cur + dp[3] * b1 + dp[4] * b2
        t_new = t_new / jnp.maximum(jnp.linalg.norm(t_new), _EPS)
        return R_new, t_new

    R, t = jax.lax.fori_loop(0, iters, gn_step, (R, t))
    return se3.hat(t) @ R


# --------------------------------------------------------------------------- #
# Pose recovery
# --------------------------------------------------------------------------- #

@highest_precision
def two_view_depths(R: jax.Array, t: jax.Array, x0h: jax.Array,
                    x1h: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Closed-form per-correspondence depths for pose (R, t).

    Solves min_z ||(R x0h) z0 - x1h z1 + t||^2 per point — a 2x2 normal
    system in closed form. Replaces full DLT triangulation (batched 4x4
    SVDs, the dominant cost of cheirality voting on TPU) wherever only the
    depth SIGNS/magnitudes are needed.
    x0h/x1h: (N, 3) homogeneous rays (K^-1 [u v 1]).
    """
    a = x0h @ R.T                                  # (N,3) rotated rays
    b = x1h
    aa = jnp.sum(a * a, axis=1)
    bb = jnp.sum(b * b, axis=1)
    ab = jnp.sum(a * b, axis=1)
    at = a @ t
    bt = b @ t
    det = aa * bb - ab * ab
    det = jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    z0 = (-at * bb + bt * ab) / det
    z1 = (bt * aa - at * ab) / det
    return z0, z1


@highest_precision
def decompose_essential(E: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """E -> (R1, R2, t_unit); candidate poses are (R1,t),(R1,-t),(R2,t),(R2,-t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), _EPS)
    return R1, R2, t


@partial(jax.jit, static_argnames=())
@highest_precision
def recover_pose_essential(E: jax.Array, p0: jax.Array, p1: jax.Array,
                           valid: jax.Array, K: jax.Array,
                           max_depth: float = 1e6):
    """cv2.recoverPose equivalent: pick the (R, t) with the best cheirality
    vote among the 4 candidates; returns (R, t, posdepth_mask, n_good).

    Cam0 is the identity; the pose maps cam0-frame points into cam1
    (x1 = R x0 + t), i.e. T_1from0 — same convention the reference feeds to
    the bootstrap (T1_cw = [R|t] with world = cam0).
    """
    R1, R2, t = decompose_essential(E)
    Rs = jnp.stack([R1, R1, R2, R2])                  # (4,3,3)
    ts = jnp.stack([t, -t, t, -t])                    # (4,3)

    # closed-form two-ray depths for the cheirality vote (same accept set
    # as DLT triangulation on clean rays, at a fraction of the cost)
    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones((p0.shape[0], 1), p0.dtype)
    x0h = jnp.concatenate([p0, ones], axis=1) @ Kinv.T
    x1h = jnp.concatenate([p1, ones], axis=1) @ Kinv.T

    def score(R, tv):
        z0, z1 = two_view_depths(R, tv, x0h, x1h)
        good = (z0 > 0) & (z1 > 0) & (z0 < max_depth) & (z1 < max_depth) & valid
        return jnp.sum(good.astype(jnp.int32)), good

    counts, goods = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], goods[best], counts[best]


@highest_precision
def decompose_homography(H: jax.Array, K: jax.Array):
    """cv2.decomposeHomographyMat equivalent (Faugeras SVD method).

    Returns (Rs (4,3,3), ts (4,3), ns (4,3)) candidate motions with unit
    plane normals. Degenerate (pure-rotation) homographies collapse to
    R = Hn (normalized), t = 0 candidates.
    """
    Hn = jnp.linalg.inv(K) @ H @ K
    U, S, Vt = jnp.linalg.svd(Hn)
    d1, d2, d3 = S[0], S[1], S[2]
    # work with M = Hn / d2 so the middle singular value is 1
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    V = Vt.T

    denom = jnp.maximum(d1 * d1 - d3 * d3, _EPS)
    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / denom, 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / denom, 0.0))

    d2s = jnp.maximum(d2, _EPS)
    sin_t = (d1 - d3) * x1 * x3 / d2s
    cos_t = (d1 * x3 * x3 + d3 * x1 * x1) / d2s

    def candidate(e1, e3):
        n = V @ jnp.stack([e1 * x1, jnp.zeros_like(x1), e3 * x3])
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-e1 * e3 * sin_t)
        Rp = Rp.at[2, 0].set(e1 * e3 * sin_t).at[2, 2].set(cos_t)
        R = s * (U @ Rp @ Vt)
        tp = (d1 - d3) * jnp.stack([e1 * x1, jnp.zeros_like(x1), -e3 * x3])
        t = U @ tp
        tn = jnp.linalg.norm(t)
        t = jnp.where(tn > _EPS, t / jnp.maximum(tn, _EPS), t)
        return R, t, n

    cands = [candidate(e1, e3) for e1 in (1.0, -1.0) for e3 in (1.0, -1.0)]
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    ns = jnp.stack([c[2] for c in cands])

    # pure-rotation fallback when the homography is (near) a rotation
    near_rot = (d1 - d3) / jnp.maximum(d2, _EPS) < 1e-4
    R_rot = se3.project_to_SO3(Hn / d2s)
    Rs = jnp.where(near_rot, jnp.broadcast_to(R_rot, Rs.shape), Rs)
    ts = jnp.where(near_rot, jnp.zeros_like(ts), ts)
    return Rs, ts, ns
