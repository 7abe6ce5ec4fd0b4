"""Sim(3) similarity-transform primitives + 3D-3D alignment in JAX.

Foundation for the loop-closure layer (core/loop.py) and the Sim(3)
pose-graph optimizer (ops/pgo.py). The reference lists loop closure and
pose-graph optimization as FUTURE WORK (reference: README.md:317,
slam/monocular/main_revamped.py:501) — this module goes beyond reference
parity. The design follows the standard monocular-SLAM treatment (Strasdat's
"Scale Drift-Aware Large Scale Monocular SLAM": loop constraints live in
Sim(3) because pure monocular VO drifts in scale as well as pose).

Conventions:
  * An element ``S = (R, t, s)`` acts on points as ``S . X = s * R @ X + t``.
    Camera nodes are ``S_cw`` (camera-from-world similarity), matching the
    project-wide ``T_cw`` pose convention (x_cam = R X_w + t).
  * Tangent vectors are 7-dim ``[rho(3), phi(3), sigma(1)]`` (translation,
    rotation, log-scale), with the Sophus/Strasdat exp/log closed forms.
  * Everything is jit-friendly: static shapes, branch-free small-angle /
    small-sigma handling via jnp.where, arbitrary leading batch dims.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from simpleslam_tpu.ops import se3
from simpleslam_tpu.ops.ransac import sample_minimal_sets
from simpleslam_tpu.utils.precision import highest_precision

_EPS = 1e-7


class Sim3(NamedTuple):
    """Batched Sim(3) element: R (..., 3, 3), t (..., 3), s (...,)."""
    R: jax.Array
    t: jax.Array
    s: jax.Array


def identity(batch: Tuple[int, ...] = (), dtype=jnp.float32) -> Sim3:
    return Sim3(
        R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3)),
        t=jnp.zeros(batch + (3,), dtype),
        s=jnp.ones(batch, dtype))


def from_se3(T: jax.Array) -> Sim3:
    """Lift a (..., 4, 4) rigid transform to Sim(3) with s = 1."""
    return Sim3(R=T[..., :3, :3], t=T[..., :3, 3],
                s=jnp.ones(T.shape[:-2], T.dtype))


def to_se3(S: Sim3) -> jax.Array:
    """Project a camera-from-world Sim(3) back to SE(3) for the trajectory:
    ``T = [R | t/s]``. This is the standard monocular loop-closure
    convention (the corrected camera CENTER is -R^T t / s, i.e. scale
    normalizes the translation, not the rotation)."""
    return se3.rt_to_T(S.R, S.t / S.s[..., None])


def to_matrix(S: Sim3) -> jax.Array:
    """(..., 4, 4) homogeneous matrix [[sR, t], [0, 1]]."""
    return se3.rt_to_T(S.R * S.s[..., None, None], S.t)


def compose(A: Sim3, B: Sim3) -> Sim3:
    """A ∘ B (apply B first): (sA RA, tA) ∘ (sB RB, tB)."""
    R = A.R @ B.R
    t = A.s[..., None] * jnp.einsum("...ij,...j->...i", A.R, B.t) + A.t
    return Sim3(R=R, t=t, s=A.s * B.s)


def inverse(S: Sim3) -> Sim3:
    Rt = jnp.swapaxes(S.R, -1, -2)
    si = 1.0 / S.s
    t = -si[..., None] * jnp.einsum("...ij,...j->...i", Rt, S.t)
    return Sim3(R=Rt, t=t, s=si)


def act(S: Sim3, X: jax.Array) -> jax.Array:
    """Apply to points (..., N, 3) -> (..., N, 3)."""
    return (S.s[..., None, None]
            * jnp.einsum("...ij,...nj->...ni", S.R, X)
            + S.t[..., None, :])


# ---------------------------------------------------------------------------
# exp / log (Sophus closed forms with Taylor-safe small-value branches)
# ---------------------------------------------------------------------------

def _calc_W(theta: jax.Array, sigma: jax.Array, scale: jax.Array,
            Phi: jax.Array) -> jax.Array:
    """The Sim(3) 'V' matrix W with t = W @ rho (Sophus sim3 calcW).

    All four (theta, sigma) small/large cases evaluated branch-free.
    """
    theta2 = theta * theta
    sigma2 = sigma * sigma
    th_small = theta < 1e-4
    sg_small = jnp.abs(sigma) < 1e-4
    th_s = jnp.where(th_small, 1.0, theta)          # safe denominators
    sg_s = jnp.where(sg_small, 1.0, sigma)

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    # sigma small:
    C_ss = 1.0 + 0.5 * sigma + sigma2 / 6.0         # (e^s - 1)/s Taylor
    A_ss = jnp.where(th_small,
                     0.5 - theta2 / 24.0,
                     (1.0 - cos_t) / jnp.where(th_small, 1.0, theta2))
    B_ss = jnp.where(th_small,
                     1.0 / 6.0 - theta2 / 120.0,
                     (theta - sin_t) / jnp.where(th_small, 1.0,
                                                 theta2 * th_s))
    # sigma large:
    C_sl = (scale - 1.0) / sg_s
    A_sl_thsmall = ((sigma - 1.0) * scale + 1.0) / jnp.where(
        sg_small, 1.0, sigma2)
    B_sl_thsmall = (scale * (0.5 * sigma2 - sigma + 1.0) - 1.0) / jnp.where(
        sg_small, 1.0, sigma2 * sg_s)
    a = scale * sin_t
    b = scale * cos_t
    c = theta2 + sigma2
    c_s = jnp.where(c < 1e-12, 1.0, c)
    A_sl_thlarge = (a * sigma + (1.0 - b) * theta) / (th_s * c_s)
    B_sl_thlarge = (C_sl - ((b - 1.0) * sigma + a * theta) / c_s) / jnp.where(
        th_small, 1.0, theta2)

    C = jnp.where(sg_small, C_ss, C_sl)
    A = jnp.where(sg_small, A_ss,
                  jnp.where(th_small, A_sl_thsmall, A_sl_thlarge))
    B = jnp.where(sg_small, B_ss,
                  jnp.where(th_small, B_sl_thsmall, B_sl_thlarge))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=Phi.dtype), Phi.shape)
    return (C[..., None, None] * eye + A[..., None, None] * Phi
            + B[..., None, None] * (Phi @ Phi))


@highest_precision
def exp(xi: jax.Array) -> Sim3:
    """Exp map: (..., 7) = [rho, phi, sigma] -> Sim3."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    theta = jnp.sqrt(jnp.sum(phi * phi, axis=-1) + 1e-24)
    scale = jnp.exp(sigma)
    R = se3.so3_exp(phi)
    W = _calc_W(theta, sigma, scale, se3.hat(phi))
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return Sim3(R=R, t=t, s=scale)


@highest_precision
def log(S: Sim3) -> jax.Array:
    """Log map: Sim3 -> (..., 7) = [rho, phi, sigma]."""
    phi = se3.so3_log(S.R)
    sigma = jnp.log(jnp.maximum(S.s, 1e-12))
    theta = jnp.sqrt(jnp.sum(phi * phi, axis=-1) + 1e-24)
    W = _calc_W(theta, sigma, S.s, se3.hat(phi))
    rho = jnp.linalg.solve(
        W + _EPS * jnp.eye(3, dtype=W.dtype), S.t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Weighted Umeyama similarity alignment (3D-3D)
# ---------------------------------------------------------------------------

@highest_precision
def umeyama(X: jax.Array, Y: jax.Array, w: jax.Array) -> Sim3:
    """Weighted closed-form similarity: argmin_S sum_i w_i |S.X_i - Y_i|^2.

    X, Y: (N, 3); w: (N,) non-negative weights (a boolean mask works).
    Degenerate inputs (rank-deficient / < 3 effective points) still return a
    finite Sim3 — callers score it and RANSAC discards garbage hypotheses.
    Same estimator the trajectory evaluator uses for Sim3 ATE alignment.
    """
    w = w.astype(X.dtype)
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    mx = jnp.einsum("n,ni->i", w, X) / wsum
    my = jnp.einsum("n,ni->i", w, Y) / wsum
    Xc = X - mx
    Yc = Y - my
    cov = jnp.einsum("n,ni,nj->ij", w, Yc, Xc) / wsum      # E[y x^T]
    U, D, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    Sfix = jnp.ones(3, X.dtype).at[2].set(d)
    R = (U * Sfix[None, :]) @ Vt
    var_x = jnp.maximum(jnp.einsum("n,ni,ni->", w, Xc, Xc) / wsum, _EPS)
    s = jnp.sum(D * Sfix) / var_x
    s = jnp.where(jnp.isfinite(s) & (s > 1e-6), s, 1.0)
    t = my - s * (R @ mx)
    return Sim3(R=R, t=t, s=s)


@partial(jax.jit, static_argnames=("n_hyp",))
@highest_precision
def sim3_ransac_3d3d(key: jax.Array, X: jax.Array, Y: jax.Array,
                     valid: jax.Array, thresh: float,
                     thresh_src: float | None = None, *,
                     n_hyp: int = 256):
    """Robust Sim(3) from padded 3D-3D correspondences (X_i -> Y_i).

    The geometric-verification core of loop closure (ORB-SLAM verifies loop
    candidates with a 3-point RANSAC over map-point pairs; here all ``n_hyp``
    minimal Umeyama fits + scoring run as one batched program).

    The inlier gate is SYMMETRIC and each side is thresholded in its OWN
    frame's units: forward error |S.x - y| < ``thresh`` (target/Y units) AND
    backward error |S^-1.y - x| < ``thresh_src`` (source/X units, default
    ``thresh``). Both tests are needed: |S^-1.y - x| * s == |S.x - y|
    algebraically, so any single-frame gate lets a degenerate hypothesis
    shrink the source cloud onto a compact target cluster and claim every
    pair as an inlier (measured on the square-loop fixture: s ~ 0.01-0.07
    "fits" with 30-70 one-sided inliers outvoted the true alignment).

    Returns (Sim3, inliers (N,) bool, n_inliers, ok).
    """
    if thresh_src is None:
        thresh_src = thresh
    idx, ok_h = sample_minimal_sets(key, valid, 3, n_hyp)
    Xm = X[idx]                                        # (S, 3, 3)
    Ym = Y[idx]
    w3 = jnp.ones(idx.shape, X.dtype)
    models = jax.vmap(umeyama)(Xm, Ym, w3)

    def inlier_mask(S: Sim3) -> jax.Array:
        e_f = jnp.linalg.norm(act(S, X[None])[0] - Y, axis=-1)
        # backward error in the SOURCE frame's units (no *s rescale — that
        # would cancel back to e_f and void the symmetric gate)
        e_b = jnp.linalg.norm(act(inverse(S), Y[None])[0] - X, axis=-1)
        ok = (e_f < thresh) & (e_b < thresh_src)
        return jnp.where(jnp.isfinite(e_f) & jnp.isfinite(e_b), ok, False)

    inl = jax.vmap(inlier_mask)(models) & valid[None, :]   # (S, N)
    scores = jnp.sum(inl.astype(jnp.int32), axis=1)
    scores = jnp.where(ok_h, scores, -1)
    best = jnp.argmax(scores)

    # IRLS polish: two weighted-Umeyama refits on the winning inlier set
    S_best = jax.tree.map(lambda m: m[best], models)
    for _ in range(2):
        w = (inlier_mask(S_best) & valid).astype(X.dtype)
        S_ref = umeyama(X, Y, w)
        ok_ref = jnp.isfinite(log(S_ref)).all()
        S_best = jax.tree.map(
            lambda a, b: jnp.where(ok_ref, a, b), S_ref, S_best)
    inliers = inlier_mask(S_best) & valid
    n_inl = jnp.sum(inliers.astype(jnp.int32))
    ok = ok_h[0] & (n_inl >= 3)
    return S_best, inliers, n_inl, ok
