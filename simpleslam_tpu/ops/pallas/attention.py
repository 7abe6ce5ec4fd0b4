"""Fused masked attention kernel (Pallas/TPU) for the LightGlue matcher.

The matcher's self/cross attention over N<=4096 padded keypoints is the
single hottest op of the learned front-end (SURVEY.md §3 ranks the LightGlue
forward as hot spot #1 alongside ALIKED). This kernel fuses
  scores = q @ k^T * scale -> key-mask -> softmax -> @ v
into one VMEM-resident pass per (batch*head, q-block) grid cell, so the
(N, N) score matrix never round-trips through HBM.

At LightGlue scale (N = 2048-4096, head_dim 64) a full K/V panel per head is
<= 4096 x 64 x 4 B = 1 MB — it fits comfortably in VMEM, so no online-softmax
streaming is needed: each grid cell computes exact softmax over the full key
axis. Block size 256 keeps the (BQ, N) score tile <= 4 MB.

Falls back to the XLA einsum path off-TPU (``masked_attention`` dispatches on
backend); ``interpret=True`` is used by the CPU test suite.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float):
    q = q_ref[:].astype(jnp.float32)                    # (BQ, d)
    k = k_ref[:].astype(jnp.float32)                    # (N, d)
    v = v_ref[:].astype(jnp.float32)                    # (N, d)
    m = mask_ref[:]                                     # (1, N) float {0,1}

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (BQ, N)
    scores = scores + (1.0 - m) * _NEG

    mx = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - mx)
    denom = jnp.sum(e, axis=1, keepdims=True)
    p = e / jnp.maximum(denom, 1e-30)
    out_ref[:] = jnp.dot(p, v, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def pallas_masked_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            mask_k: jax.Array, *, block_q: int = 256,
                            interpret: bool = False) -> jax.Array:
    """Fused attention. q: (BH, Nq, d), k/v: (BH, Nk, d), mask_k: (BH, Nk)
    bool. Returns (BH, Nq, d) float32."""
    BH, Nq, d = q.shape
    Nk = k.shape[1]
    bq = min(block_q, Nq)
    assert Nq % bq == 0, "Nq must be a multiple of the q block"
    scale = 1.0 / (d ** 0.5)
    maskf = mask_k.astype(jnp.float32).reshape(BH, 1, Nk)

    grid = (BH, Nq // bq)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Nk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Nk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Nk), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, bq, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Nq, d), jnp.float32),
        interpret=interpret,
    )(q, k, v, maskf)


def xla_masked_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         mask_k: jax.Array) -> jax.Array:
    """Reference XLA path (used off-TPU and for equivalence tests)."""
    d = q.shape[-1]
    logits = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.float32),
                        k.astype(jnp.float32),
                        preferred_element_type=jnp.float32) / (d ** 0.5)
    logits = jnp.where(mask_k[:, None, :], logits, _NEG)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p, v.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


@jax.custom_vjp
def _pallas_attention_diff(q, k, v, mask_k):
    """Pallas forward with an XLA-derived backward (the hand-written kernel
    has no VJP; training differentiates the mathematically identical XLA
    formulation — standard custom-VJP pattern from the Pallas guide)."""
    return pallas_masked_attention(q, k, v, mask_k)


def _pad_fwd(q, k, v, mask_k):
    return pallas_masked_attention(q, k, v, mask_k), (q, k, v, mask_k)


def _pad_bwd(res, g):
    q, k, v, mask_k = res
    _, vjp = jax.vjp(lambda q_, k_, v_: xla_masked_attention(q_, k_, v_,
                                                             mask_k),
                     q, k, v)
    dq, dk, dv = vjp(g)
    dm = np.zeros(mask_k.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dm


_pallas_attention_diff.defvjp(_pad_fwd, _pad_bwd)


def masked_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     mask_k: jax.Array) -> jax.Array:
    """Backend dispatch: Pallas kernel on TPU (differentiable via the XLA
    backward), XLA einsum elsewhere."""
    if jax.default_backend() == "tpu":
        return _pallas_attention_diff(q, k, v, mask_k)
    return xla_masked_attention(q, k, v, mask_k)
