"""Stereo disparity estimation in pure JAX.

TPU-native replacement for the reference prototypes' OpenCV stereo path
(reference: refrences/sfm.py:346-389 uses StereoSGBM/StereoBM + disparity-
checked right features; slam/stereo/ROUGHstereo_tracker.py is an empty stub
the TPU build fills — SURVEY.md §0).

Block matching as one dense cost volume: for every candidate disparity the
SAD cost is a shifted subtraction + box filter (separable cumsum), the
whole (H, W, D) volume evaluated in one vectorized pass — the classic
CPU-sequential scanline loop becomes a batched tensor op. Winner-take-all
with parabolic subpixel refinement + left-right consistency masking.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from simpleslam_tpu.utils.precision import highest_precision


def _box_filter(x: jax.Array, k: int) -> jax.Array:
    """k x k box sum via separable cumsum (same padding)."""
    pad = k // 2

    def along(a, axis):
        a = jnp.pad(a, [(pad + 1, pad) if i == axis else (0, 0)
                        for i in range(a.ndim)], mode="edge")
        c = jnp.cumsum(a, axis=axis)
        hi = jax.lax.slice_in_dim(c, k, c.shape[axis], axis=axis)
        lo = jax.lax.slice_in_dim(c, 0, c.shape[axis] - k, axis=axis)
        return hi - lo

    return along(along(x, 0), 1)


@partial(jax.jit, static_argnames=("max_disp", "block"))
@highest_precision
def disparity_block_match(left: jax.Array, right: jax.Array,
                          max_disp: int = 64, block: int = 9,
                          uniqueness: float = 0.95,
                          lr_thresh: float = 1.5):
    """SAD block-matching disparity for a rectified pair.

    left/right: (H, W) float32. Returns (disp (H, W) float32, valid (H, W)
    bool). Invalid pixels: failed left-right check, weak uniqueness, or
    within ``max_disp`` of the left border.
    """
    H, W = left.shape
    L = left.astype(jnp.float32)
    R = right.astype(jnp.float32)

    def cost_at(d):
        # right image shifted right by d: R(x - d)
        Rs = jnp.pad(R, ((0, 0), (d, 0)))[:, :W]
        return _box_filter(jnp.abs(L - Rs), block)

    costs = jnp.stack([cost_at(d) for d in range(max_disp)], axis=-1)  # (H,W,D)

    best = jnp.argmin(costs, axis=-1)                        # (H, W)
    cbest = jnp.min(costs, axis=-1)
    # uniqueness: best must beat the second-best (outside +-1) by the ratio
    D = max_disp
    didx = jnp.arange(D)
    near = jnp.abs(didx[None, None, :] - best[..., None]) <= 1
    second = jnp.min(jnp.where(near, jnp.inf, costs), axis=-1)
    unique = cbest <= uniqueness * second

    # parabolic subpixel around the winner
    bm1 = jnp.clip(best - 1, 0, D - 1)
    bp1 = jnp.clip(best + 1, 0, D - 1)
    c0 = jnp.take_along_axis(costs, bm1[..., None], axis=-1)[..., 0]
    c1 = cbest
    c2 = jnp.take_along_axis(costs, bp1[..., None], axis=-1)[..., 0]
    denom = c0 - 2 * c1 + c2
    off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (c0 - c2) / denom, 0.0)
    disp = best.astype(jnp.float32) + jnp.clip(off, -0.5, 0.5)

    # left-right consistency: match from the right image and compare
    def cost_at_r(d):
        Ls = jnp.pad(L, ((0, 0), (0, d)))[:, d:]
        return _box_filter(jnp.abs(R - Ls), block)

    costs_r = jnp.stack([cost_at_r(d) for d in range(max_disp)], axis=-1)
    best_r = jnp.argmin(costs_r, axis=-1)

    xx = jnp.arange(W)[None, :]
    xr = jnp.clip(xx - best, 0, W - 1)
    dr = jnp.take_along_axis(best_r, xr, axis=1)
    lr_ok = jnp.abs(best - dr) <= lr_thresh

    border = xx >= max_disp
    valid = unique & lr_ok & border & (best > 0) & (best < D - 1)
    return jnp.where(valid, disp, 0.0), valid


def depth_from_disparity(disp: jax.Array, fx: float, baseline: float,
                         valid=None) -> jax.Array:
    """Z = fx * b / d (0 where invalid)."""
    z = fx * baseline / jnp.maximum(disp, 1e-6)
    if valid is not None:
        z = jnp.where(valid & (disp > 0), z, 0.0)
    return z


def sample_disparity(disp: jax.Array, valid: jax.Array,
                     kpts: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Disparity at keypoint locations (nearest pixel) + validity — the
    'disparity-checked right features' step (refrences/sfm.py:346-389)."""
    H, W = disp.shape
    x = jnp.clip(jnp.round(kpts[:, 0]).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(kpts[:, 1]).astype(jnp.int32), 0, H - 1)
    return disp[y, x], valid[y, x]


def keypoints_to_3d(kpts: jax.Array, disp_at_kp: jax.Array, K: jax.Array,
                    baseline: float) -> jax.Array:
    """Back-project keypoints with disparity into camera-frame 3D."""
    fx = K[0, 0]
    fy = K[1, 1]
    z = fx * baseline / jnp.maximum(disp_at_kp, 1e-6)
    x = (kpts[:, 0] - K[0, 2]) / fx * z
    y = (kpts[:, 1] - K[1, 2]) / fy * z
    return jnp.stack([x, y, z], axis=-1)
