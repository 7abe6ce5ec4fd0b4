"""Batched-hypothesis RANSAC core in pure JAX.

TPU-native replacement for OpenCV's sequential RANSAC loops
(``cv2.findHomography`` / ``findFundamentalMat`` / ``findEssentialMat`` /
``solvePnPRansac`` — SURVEY.md §2 native-replacement table): instead of
iterating hypotheses with early exit, we

  1. sample ALL ``n_hyp`` minimal sets at once (Gumbel top-k over the valid
     mask -> distinct indices per hypothesis, no rejection loops),
  2. fit every minimal model in one vmapped batch,
  3. score every (hypothesis x correspondence) residual as one
     (S, M) computation,
  4. argmax over hypotheses.

Everything is static-shape and jit-friendly; callers optionally refit on the
winning inlier set (masked least squares) for the final polish.

Scoring modes mirror the reference's needs: plain inlier count (cv2-style),
MSAC, and the ORB-SLAM truncated chi^2 score used by the two-view bootstrap
(reference: two_view_bootstrap.py:107-112).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def sample_minimal_sets(key: jax.Array, valid: jax.Array, k: int,
                        n_hyp: int) -> Tuple[jax.Array, jax.Array]:
    """Sample ``n_hyp`` index sets of size ``k`` from the valid entries.

    Rank sampling: draw uniform ranks in [0, n_valid) and map them to entry
    positions through the valid mask's prefix sum (searchsorted). The
    previous Gumbel-top-k formulation sorted an (n_hyp, M) matrix per call —
    the single most expensive op of every RANSAC solve on TPU. Ranks within
    a set are drawn independently, so a set can (rarely, ~k^2/n_valid)
    contain a duplicate; a duplicated point makes the minimal fit degenerate
    and that hypothesis simply scores as garbage — RANSAC's redundancy
    absorbs it, matching cv2's own collision-tolerant sampling.

    Returns (idx (S,k) int32, ok (S,) bool); ``ok`` is False when fewer
    than k valid entries exist.
    """
    n_valid = jnp.sum(valid.astype(jnp.int32))
    ranks = jax.random.randint(key, (n_hyp, k), 0, jnp.maximum(n_valid, 1))
    cums = jnp.cumsum(valid.astype(jnp.int32))          # rank at each entry
    idx = jnp.searchsorted(cums, ranks.reshape(-1) + 1).reshape(n_hyp, k)
    ok = jnp.broadcast_to(n_valid >= k, (n_hyp,))
    return idx.astype(jnp.int32), ok


def score_count(res_sq: jax.Array, valid: jax.Array, thresh_sq) -> jax.Array:
    """cv2-style inlier count. res_sq: (S, M)."""
    inl = (res_sq < thresh_sq) & valid[None, :]
    return jnp.sum(inl.astype(jnp.float32), axis=1)


def score_msac(res_sq: jax.Array, valid: jax.Array, thresh_sq) -> jax.Array:
    """MSAC: sum of (thresh^2 - res^2) over inliers (higher = better)."""
    gain = jnp.maximum(thresh_sq - res_sq, 0.0)
    return jnp.sum(jnp.where(valid[None, :], gain, 0.0), axis=1)


def score_chi2_truncated(res_sq: jax.Array, valid: jax.Array,
                         chi2_thresh) -> jax.Array:
    """ORB-SLAM truncated score: sum(max(0, chi2 - d^2)) over valid points
    (reference: two_view_bootstrap.py:107-112)."""
    gain = jnp.maximum(chi2_thresh - res_sq, 0.0)
    return jnp.sum(jnp.where(valid[None, :], gain, 0.0), axis=1)


@partial(jax.jit, static_argnames=("fit_fn", "residual_fn", "k", "n_hyp",
                                   "score"))
def ransac(key: jax.Array,
           pts0: jax.Array, pts1: jax.Array, valid: jax.Array,
           *,
           fit_fn: Callable[[jax.Array, jax.Array], jax.Array],
           residual_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
           k: int, n_hyp: int, thresh_sq: float,
           score: str = "count"):
    """Generic batched two-view RANSAC.

    Args:
      pts0/pts1: (M, 2) correspondences (padded), valid: (M,) mask.
      fit_fn: minimal solver (k,2),(k,2) -> model (vmapped internally).
              Must return a fixed-shape model even for degenerate sets.
      residual_fn: (model, pts0, pts1) -> (M,) SQUARED residuals.
      k: minimal sample size; n_hyp: hypothesis count.
      thresh_sq: squared inlier threshold (same units as residual_fn).
      score: 'count' | 'msac'.

    Returns (model, inliers (M,) bool, best_score, ok).
    """
    idx, ok_h = sample_minimal_sets(key, valid, k, n_hyp)
    mins0 = pts0[idx]                                   # (S, k, 2)
    mins1 = pts1[idx]
    models = jax.vmap(fit_fn)(mins0, mins1)             # (S, ...)

    res_sq = jax.vmap(lambda mdl: residual_fn(mdl, pts0, pts1))(models)  # (S, M)
    res_sq = jnp.where(jnp.isfinite(res_sq), res_sq, jnp.inf)

    if score == "count":
        scores = score_count(res_sq, valid, thresh_sq)
    elif score == "msac":
        scores = score_msac(res_sq, valid, thresh_sq)
    else:
        raise ValueError(score)
    scores = jnp.where(ok_h, scores, -jnp.inf)

    best = jnp.argmax(scores)
    best_model = jax.tree.map(lambda m: m[best], models)
    best_res = res_sq[best]
    inliers = (best_res < thresh_sq) & valid
    return best_model, inliers, scores[best], ok_h[0] & (scores[best] > 0)
