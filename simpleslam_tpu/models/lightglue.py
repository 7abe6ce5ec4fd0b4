"""LightGlue-style attention matcher in flax.

TPU-native replacement for the torch LightGlue matcher the reference calls
per frame pair (reference: slam/core/features_utils.py:26,157-169:
``LightGlue(features='aliked')`` under ``torch.inference_mode`` with a
confidence filter at ``args.min_conf``).

Design (LightGlue paper, arXiv:2306.13643, re-implemented TPU-first):
  * L transformer layers, each a SELF-attention unit (rotary positional
    encoding derived from keypoint coordinates via learned Fourier
    projections) followed by a bidirectional CROSS-attention unit with
    shared weights between the two images.
  * assignment head: pairwise similarity of projected descriptors combined
    with per-keypoint matchability logits via the double-softmax rule
    P_ij = sigma0_i * sigma1_j * softmax_row(S)_ij * softmax_col(S)_ij.
  * matches = mutual argmax of P gated at min_conf — identical filtering
    semantics to the reference's `conf > args.min_conf`.
  * static shapes: padded keypoint sets with attention masking; the paper's
    adaptive early-exit/pruning is intentionally dropped — static compute is
    faster under XLA than data-dependent depth.

Compute dtype bfloat16 on the MXU, f32 softmax/logits.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from simpleslam_tpu.core.types import Features, Matches

_NEG = -1e9


def _rotate_half_pairs(x: jax.Array) -> jax.Array:
    """(..., 2k) -> rotate each (even, odd) pair by 90 deg: (-x1, x0, ...)."""
    x0 = x[..., 0::2]
    x1 = x[..., 1::2]
    return jnp.stack([-x1, x0], axis=-1).reshape(x.shape)


def apply_rotary(x: jax.Array, theta: jax.Array) -> jax.Array:
    """Apply 2D-position rotary encoding. x: (..., N, d), theta: (..., N, d/2)."""
    cos = jnp.repeat(jnp.cos(theta), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(theta), 2, axis=-1)
    return x * cos + _rotate_half_pairs(x) * sin


class Attention(nn.Module):
    """Multi-head attention with optional rotary enc, masked keys."""
    dim: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xq, xk, mask_k, theta_q=None, theta_k=None):
        B, Nq, _ = xq.shape
        Nk = xk.shape[1]
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(xq)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(xk)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(xk)

        def split(t, n):
            return t.reshape(B, n, self.heads, hd).transpose(0, 2, 1, 3)

        q = split(q, Nq)
        k = split(k, Nk)
        v = split(v, Nk)
        if theta_q is not None:
            q = apply_rotary(q, theta_q[:, None, :, : hd // 2])
            k = apply_rotary(k, theta_k[:, None, :, : hd // 2])

        # fused masked attention: Pallas kernel on TPU, XLA einsum elsewhere
        from simpleslam_tpu.ops.pallas.attention import masked_attention

        qf = q.reshape(B * self.heads, Nq, hd)
        kf = k.reshape(B * self.heads, Nk, hd)
        vf = v.reshape(B * self.heads, Nk, hd)
        mk = jnp.broadcast_to(mask_k[:, None, :], (B, self.heads, Nk)
                              ).reshape(B * self.heads, Nk)
        out = masked_attention(qf, kf, vf, mk)
        out = out.reshape(B, self.heads, Nq, hd).transpose(0, 2, 1, 3)
        out = out.reshape(B, Nq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(
            out.astype(self.dtype))


class TransformerUnit(nn.Module):
    """Attention + gated MLP with residuals (one LightGlue half-layer)."""
    dim: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, src, mask_src, theta_x=None, theta_src=None):
        msg = Attention(self.dim, self.heads, self.dtype, name="attn")(
            x, src, mask_src, theta_x, theta_src)
        y = jnp.concatenate([x, msg.astype(jnp.float32)], axis=-1)
        y = nn.LayerNorm()(y)
        h = nn.Dense(2 * self.dim, dtype=self.dtype, name="ff1")(y)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ff2")(h)
        return x + h.astype(jnp.float32)


class LightGlue(nn.Module):
    """Attention matcher over two padded keypoint sets."""
    dim: int = 256
    heads: int = 4
    n_layers: int = 9
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, kpts0, desc0, valid0, kpts1, desc1, valid1,
                 image_hw: Tuple[int, int]):
        """kpts: (B, N, 2) pixels; desc: (B, N, D); valid: (B, N) bool.
        Returns (P (B, N, M) assignment probs, sig0, sig1)."""
        H, W = image_hw
        scale = jnp.float32(max(H, W))
        center = jnp.array([W / 2.0, H / 2.0], jnp.float32)
        p0 = (kpts0 - center) / scale
        p1 = (kpts1 - center) / scale

        # weights are SHARED between the two images (LightGlue design):
        # the same module instances process both sets
        inp = nn.Dense(self.dim, name="input_proj")
        x0 = inp(desc0.astype(jnp.float32))
        x1 = inp(desc1.astype(jnp.float32))

        hd = self.dim // self.heads
        # learned Fourier rotary frequencies over 2-D positions
        freq = nn.Dense(hd // 2, use_bias=False, name="rotary_freq")
        th0 = freq(p0) * 10.0
        th1 = freq(p1) * 10.0

        for i in range(self.n_layers):
            self_unit = TransformerUnit(self.dim, self.heads, self.dtype,
                                        name=f"self{i}")
            cross_unit = TransformerUnit(self.dim, self.heads, self.dtype,
                                         name=f"cross{i}")
            x0 = self_unit(x0, x0, valid0, th0, th0)
            x1 = self_unit(x1, x1, valid1, th1, th1)
            x0n = cross_unit(x0, x1, valid1)
            x1 = cross_unit(x1, x0, valid0)
            x0 = x0n

        final = nn.Dense(self.dim, name="final_proj")
        m0 = final(x0)
        m1 = final(x1)
        S = jnp.einsum("bnd,bmd->bnm", m0, m1,
                       preferred_element_type=jnp.float32)
        S = S / jnp.sqrt(jnp.float32(self.dim))
        matchability = nn.Dense(1, name="matchability")
        sig0 = jax.nn.sigmoid(matchability(x0)[..., 0])
        sig1 = jax.nn.sigmoid(matchability(x1)[..., 0])

        S = jnp.where(valid0[:, :, None] & valid1[:, None, :], S, _NEG)
        P = (jax.nn.softmax(S, axis=-1) * jax.nn.softmax(S, axis=-2)
             * sig0[:, :, None] * sig1[:, None, :])
        P = jnp.where(valid0[:, :, None] & valid1[:, None, :], P, 0.0)
        return P, sig0, sig1


def init_lightglue(key: jax.Array, desc_dim: int = 128, n_kp: int = 64,
                   dim: int = 256, heads: int = 4, n_layers: int = 9):
    model = LightGlue(dim=dim, heads=heads, n_layers=n_layers)
    z2 = jnp.zeros((1, n_kp, 2))
    zd = jnp.zeros((1, n_kp, desc_dim))
    zv = jnp.ones((1, n_kp), bool)
    params = model.init(key, z2, zd, zv, z2, zd, zv, (480, 640))
    return model, params


def matches_from_assignment(P: jax.Array, min_conf: float) -> Matches:
    """Mutual-argmax matches from one (N, M) assignment matrix, gated at
    min_conf (the reference's `conf > args.min_conf`, features_utils.py:
    157-169)."""
    nn1 = jnp.argmax(P, axis=1)                    # best col per row
    nn0 = jnp.argmax(P, axis=0)                    # best row per col
    conf = jnp.take_along_axis(P, nn1[:, None], axis=1)[:, 0]
    rows = jnp.arange(P.shape[0], dtype=jnp.int32)
    mutual = nn0[nn1] == rows
    ok = mutual & (conf > min_conf)
    order = jnp.argsort(jnp.where(ok, -conf, jnp.inf))
    return Matches(idx0=rows[order], idx1=nn1[order].astype(jnp.int32),
                   score=jnp.where(ok, conf, 0.0)[order], valid=ok[order])


def load_torch_lightglue(path: str, params, *, strict: bool = True):
    """Load a torch export of this architecture by NAME (linear kernels
    transposed (out, in) -> (in, out)). Unknown keys / shape mismatches
    raise; target leaves absent from the checkpoint keep their initialized
    values. See models/torch_import.py for the interchange format."""
    from simpleslam_tpu.models.torch_import import load_torch_file

    return load_torch_file(path, params, strict=strict)


@partial(jax.jit, static_argnames=("model", "image_hw", "min_conf"))
def match_pair(model: LightGlue, params, feats0: Features, feats1: Features,
               image_hw: Tuple[int, int], min_conf: float = 0.7) -> Matches:
    """Single-pair matching (batch of 1) -> padded Matches."""
    P, _, _ = model.apply(
        params, feats0.kpts[None], feats0.desc[None], feats0.valid[None],
        feats1.kpts[None], feats1.desc[None], feats1.valid[None], image_hw)
    return matches_from_assignment(P[0], min_conf)


@partial(jax.jit, static_argnames=("model", "image_hw", "min_conf"))
def match_batch(model: LightGlue, params, feats0: Features, feats1: Features,
                image_hw: Tuple[int, int], min_conf: float = 0.7) -> Matches:
    """Batched pair matching: Features with leading batch axis -> Matches
    with leading batch axis (the multi-chip throughput path)."""
    P, _, _ = model.apply(
        params, feats0.kpts, feats0.desc, feats0.valid,
        feats1.kpts, feats1.desc, feats1.valid, image_hw)
    return jax.vmap(lambda p: matches_from_assignment(p, min_conf))(P)
