"""Brute-force descriptor matching as batched MXU matmuls.

TPU-native replacement for OpenCV's BFMatcher / FLANN
(reference: slam/core/features_utils.py:33-55,109-178):

  * binary (ORB/AKAZE-style) descriptors: Hamming distance computed WITHOUT
    popcount loops — descriptors are unpacked to {0,1} float bit-vectors once
    per frame and ``ham(a,b) = |a| + |b| - 2 a.b`` runs as one (N0,D)x(D,N1)
    matmul on the MXU with exact f32 accumulation (bit sums <= 256 are exact).
  * float (SIFT/ALIKED-style) descriptors: squared L2 via the same Gram-matrix
    trick.
  * crossCheck=True semantics (mutual nearest neighbours), matching OpenCV's
    ``BFMatcher(..., crossCheck=True).match`` used for all classical paths.
  * results sorted by ascending distance (features_utils.py:176-178) into a
    fixed-capacity padded :class:`Matches`.

Exhaustive N x M matching is the natural TPU formulation — at N,M <= 4096 a
full distance matrix is one small matmul, so FLANN's approximate KD-tree path
maps to the same kernel (SURVEY.md §2 native-replacement table).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from simpleslam_tpu.core.types import Features, Matches

_INF = jnp.float32(3.0e38)


def unpack_bits(desc_u8: jax.Array) -> jax.Array:
    """(N, B) uint8 -> (N, 8B) float32 in {0, 1} (LSB-first per byte)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (desc_u8[..., :, None] >> shifts[None, :]) & jnp.uint8(1)
    return bits.reshape(desc_u8.shape[0], -1).astype(jnp.float32)


def hamming_matrix(bits0: jax.Array, bits1: jax.Array) -> jax.Array:
    """Pairwise Hamming distances from {0,1} bit matrices via one matmul."""
    dot = jax.lax.dot_general(
        bits0, bits1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s0 = jnp.sum(bits0, axis=1)
    s1 = jnp.sum(bits1, axis=1)
    return s0[:, None] + s1[None, :] - 2.0 * dot


def l2sq_matrix(d0: jax.Array, d1: jax.Array) -> jax.Array:
    """Pairwise squared-L2 distances via the Gram trick (full f32 precision)."""
    dot = jax.lax.dot_general(
        d0, d1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    n0 = jnp.sum(d0 * d0, axis=1)
    n1 = jnp.sum(d1 * d1, axis=1)
    return jnp.maximum(n0[:, None] + n1[None, :] - 2.0 * dot, 0.0)


def distance_matrix(desc0: jax.Array, desc1: jax.Array,
                    valid0: jax.Array, valid1: jax.Array) -> jax.Array:
    """(N0, N1) distances; Hamming for uint8 descriptors, L2 for float.

    Invalid rows/cols are +inf. (L2, not squared, to match cv2 semantics for
    the sort order thresholds; Hamming is a bit count either way.)
    """
    if desc0.dtype == jnp.uint8:
        dist = hamming_matrix(unpack_bits(desc0), unpack_bits(desc1))
    else:
        dist = jnp.sqrt(l2sq_matrix(desc0.astype(jnp.float32),
                                    desc1.astype(jnp.float32)))
    dist = jnp.where(valid0[:, None] & valid1[None, :], dist, _INF)
    return dist


@functools.partial(jax.jit, static_argnames=("cross_check", "sort"))
def bf_match(feats0: Features, feats1: Features, *,
             cross_check: bool = True, sort: bool = True) -> Matches:
    """BFMatcher.match equivalent over padded feature sets.

    Returns a :class:`Matches` with capacity = len(feats0): row i holds the
    best partner of query keypoint i (mutual-NN filtered when
    ``cross_check``), sorted by ascending distance like the OpenCV path.
    """
    dist = distance_matrix(feats0.desc, feats1.desc, feats0.valid, feats1.valid)

    nn1 = jnp.argmin(dist, axis=1)                       # best train per query
    d_best = jnp.take_along_axis(dist, nn1[:, None], axis=1)[:, 0]
    ok = d_best < _INF
    if cross_check:
        nn0 = jnp.argmin(dist, axis=0)                   # best query per train
        mutual = nn0[nn1] == jnp.arange(dist.shape[0])
        ok = ok & mutual

    idx0 = jnp.arange(dist.shape[0], dtype=jnp.int32)
    idx1 = nn1.astype(jnp.int32)
    score = jnp.where(ok, d_best, _INF)
    if sort:
        order = jnp.argsort(score)
        idx0, idx1, score, ok = idx0[order], idx1[order], score[order], ok[order]
    return Matches(idx0=idx0, idx1=idx1,
                   score=jnp.where(ok, score, 0.0), valid=ok)


@functools.partial(jax.jit, static_argnames=("k",))
def knn_distances(feats0: Features, feats1: Features, k: int = 2):
    """Top-k smallest distances + indices per query (for ratio tests)."""
    dist = distance_matrix(feats0.desc, feats1.desc, feats0.valid, feats1.valid)
    neg_top, idx = jax.lax.top_k(-dist, k)
    return -neg_top, idx
