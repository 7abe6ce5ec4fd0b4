"""Static-shaped pytree containers shared across the pipeline.

The reference passes Python lists of ``cv2.KeyPoint`` / ``cv2.DMatch``
between stages (features_utils.py:85-178). On TPU everything is a fixed-size
padded array with a validity mask so the whole tracking step can live inside
one jitted program:

  * keypoints  -> (N_pad, 2) float32 + ``valid`` mask + count
  * descriptors-> (N_pad, D) float32 (L2-normalized) or uint8-packed binary
  * matches    -> (M_pad, 2) int32 index pairs + mask

``N_pad`` is ``SLAMConfig.n_kp`` (max_features rounded to a lane multiple).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Features:
    """Padded per-frame feature set (replaces kps/desc lists).

    kpts:   (N, 2) float32 pixel coords (x, y); padded rows are (0, 0).
    desc:   (N, D) descriptors — float32 (L2-normalized, ALIKED-style) or
            uint8 (binary ORB-style, D bytes = 8D bits).
    scores: (N,) float32 detector scores.
    valid:  (N,) bool mask of live rows.
    """
    kpts: jax.Array
    desc: jax.Array
    scores: jax.Array
    valid: jax.Array

    @property
    def n(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))

    @property
    def capacity(self) -> int:
        return self.kpts.shape[0]

    @classmethod
    def empty(cls, n_pad: int, desc_dim: int,
              desc_dtype=jnp.float32) -> "Features":
        return cls(
            kpts=jnp.zeros((n_pad, 2), jnp.float32),
            desc=jnp.zeros((n_pad, desc_dim), desc_dtype),
            scores=jnp.zeros((n_pad,), jnp.float32),
            valid=jnp.zeros((n_pad,), bool),
        )

    @classmethod
    def from_arrays(cls, kpts, desc, scores=None, n_pad: Optional[int] = None):
        """Build (and pad) from host arrays."""
        kpts = np.asarray(kpts, np.float32).reshape(-1, 2)
        desc = np.asarray(desc)
        n = kpts.shape[0]
        if scores is None:
            scores = np.ones((n,), np.float32)
        cap = n_pad or n
        out_k = np.zeros((cap, 2), np.float32)
        out_d = np.zeros((cap, desc.shape[1] if desc.ndim == 2 else 0), desc.dtype)
        out_s = np.zeros((cap,), np.float32)
        out_v = np.zeros((cap,), bool)
        m = min(n, cap)
        out_k[:m] = kpts[:m]
        out_d[:m] = desc[:m]
        out_s[:m] = np.asarray(scores, np.float32)[:m]
        out_v[:m] = True
        return cls(kpts=jnp.asarray(out_k), desc=jnp.asarray(out_d),
                   scores=jnp.asarray(out_s), valid=jnp.asarray(out_v))


@struct.dataclass
class Matches:
    """Padded match set between two feature sets.

    idx0/idx1: (M,) int32 indices into the query/train feature arrays.
    score:     (M,) float32 (distance for classical, confidence for learned).
    valid:     (M,) bool.
    """
    idx0: jax.Array
    idx1: jax.Array
    score: jax.Array
    valid: jax.Array

    @property
    def n(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))

    @property
    def capacity(self) -> int:
        return self.idx0.shape[0]

    def pairs(self) -> jax.Array:
        return jnp.stack([self.idx0, self.idx1], axis=-1)

    @classmethod
    def empty(cls, m_pad: int) -> "Matches":
        z = jnp.zeros((m_pad,), jnp.int32)
        return cls(idx0=z, idx1=z, score=jnp.zeros((m_pad,), jnp.float32),
                   valid=jnp.zeros((m_pad,), bool))

    @classmethod
    def from_arrays(cls, idx0, idx1, score=None, m_pad: Optional[int] = None):
        idx0 = np.asarray(idx0, np.int32).reshape(-1)
        idx1 = np.asarray(idx1, np.int32).reshape(-1)
        n = idx0.shape[0]
        if score is None:
            score = np.zeros((n,), np.float32)
        cap = m_pad or n
        o0 = np.zeros((cap,), np.int32)
        o1 = np.zeros((cap,), np.int32)
        os_ = np.zeros((cap,), np.float32)
        ov = np.zeros((cap,), bool)
        m = min(n, cap)
        o0[:m], o1[:m], os_[:m], ov[:m] = idx0[:m], idx1[:m], np.asarray(score, np.float32)[:m], True
        return cls(idx0=jnp.asarray(o0), idx1=jnp.asarray(o1),
                   score=jnp.asarray(os_), valid=jnp.asarray(ov))


def gather_matched_points(kpts0: jax.Array, kpts1: jax.Array,
                          m: Matches) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(pts0 (M,2), pts1 (M,2), mask) for matched keypoint pairs.

    Equivalent of the reference's ``pts_from_matches``
    (two_view_bootstrap.py:415-418), masked/padded instead of ragged.
    """
    p0 = kpts0[m.idx0]
    p1 = kpts1[m.idx1]
    return p0, p1, m.valid
