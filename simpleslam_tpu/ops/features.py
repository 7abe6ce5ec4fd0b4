"""Classical feature front-end in pure JAX: ORB-style oriented FAST + steered
BRIEF over an image pyramid.

TPU-native replacement for ``cv2.ORB_create`` (reference:
slam/core/features_utils.py:33-55). Everything is dense, static-shape array
math — no per-keypoint Python:

  * FAST-16 corner test evaluated for EVERY pixel at once (16 circle taps as
    shifted views; the ">=9 contiguous" arc test as 16 windowed ANDs).
  * Harris response (Sobel gradients + box filter, one conv) ranks corners,
    like ORB's HARRIS_SCORE.
  * 3x3 non-max suppression + global top-K -> fixed-capacity keypoint set.
  * Orientation by intensity centroid (circular patch moments, radius 15).
  * 256-bit steered BRIEF sampled from the Gaussian-blurred image with the
    pattern rotated per keypoint; bits packed to (N, 32) uint8 so the matcher
    can run Hamming-as-matmul (ops/matching.py).
  * Scale pyramid (factor 1.2) with per-level detection budgets; coordinates
    are reported at level-0 scale like cv2.

The BRIEF sampling pattern is our own deterministic Gaussian pattern (seeded)
— descriptors are consistent within this framework, which is all the pipeline
requires (the reference never mixes descriptor families across libraries).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.core.types import Features

# 16-pixel Bresenham circle of radius 3 (standard FAST-16 tap layout)
_FAST_OFFSETS = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
], np.int32)  # (dx, dy)

_N_BITS = 256
_PATCH_R = 15          # orientation / descriptor patch radius
_BORDER = 19           # keypoints are rejected closer than this to the edge


def _brief_pattern(seed: int = 7) -> np.ndarray:
    """(256, 2, 2) sampling pairs ~ N(0, (patch/5)^2), clipped to the patch."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, _PATCH_R / 2.2, size=(_N_BITS, 2, 2))
    return np.clip(pts, -_PATCH_R + 1, _PATCH_R - 1).astype(np.float32)


_PATTERN = _brief_pattern()


def _shift2d(img: jax.Array, dx: int, dy: int) -> jax.Array:
    """Shift so out[y, x] = img[y + dy, x + dx] (zero padded)."""
    H, W = img.shape
    pad = max(abs(dx), abs(dy))
    p = jnp.pad(img, pad)
    return jax.lax.dynamic_slice(p, (pad + dy, pad + dx), (H, W))


def _sep_conv(img: jax.Array, kern: jax.Array) -> jax.Array:
    """Separable 2D convolution (same padding) with a 1D kernel."""
    k = kern.shape[0]
    pad = k // 2
    x = img[None, None, :, :]
    kh = kern.reshape(1, 1, k, 1)
    kw = kern.reshape(1, 1, 1, k)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(pad, pad), (0, 0)])
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)])
    return x[0, 0]


def _gaussian_kernel(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def harris_response(img: jax.Array) -> jax.Array:
    """Dense Harris corner response (Sobel gradients + Gaussian window)."""
    f = img.astype(jnp.float32)
    sobel = jnp.array([-1.0, 0.0, 1.0])
    smooth = jnp.array([1.0, 2.0, 1.0]) / 4.0
    pad = 1
    kx = (sobel.reshape(1, 1, 1, 3), smooth.reshape(1, 1, 3, 1))
    ky = (smooth.reshape(1, 1, 1, 3), sobel.reshape(1, 1, 3, 1))
    x4 = f[None, None]
    gx = jax.lax.conv_general_dilated(
        jax.lax.conv_general_dilated(x4, kx[0], (1, 1), [(0, 0), (pad, pad)]),
        kx[1], (1, 1), [(pad, pad), (0, 0)])[0, 0]
    gy = jax.lax.conv_general_dilated(
        jax.lax.conv_general_dilated(x4, ky[0], (1, 1), [(0, 0), (pad, pad)]),
        ky[1], (1, 1), [(pad, pad), (0, 0)])[0, 0]
    g = _gaussian_kernel(1.5, 3)
    Ixx = _sep_conv(gx * gx, g)
    Iyy = _sep_conv(gy * gy, g)
    Ixy = _sep_conv(gx * gy, g)
    return (Ixx * Iyy - Ixy * Ixy) - 0.04 * (Ixx + Iyy) ** 2


def fast_score_map(img: jax.Array, thresh: float = 20.0,
                   harris: jax.Array | None = None) -> jax.Array:
    """FAST-16 corner mask x Harris response for every pixel.

    Returns (H, W) float32: -inf where the FAST arc test fails, Harris
    response where it passes (ORB's HARRIS_SCORE ranking).
    """
    f = img.astype(jnp.float32)
    taps = jnp.stack([_shift2d(f, int(dx), int(dy))
                      for dx, dy in _FAST_OFFSETS])          # (16, H, W)
    brighter = taps > (f + thresh)[None]
    darker = taps < (f - thresh)[None]

    def arc9(m):
        # any window of 9 contiguous circle positions all set
        acc = jnp.zeros_like(m[0], dtype=bool)
        for s in range(16):
            w = m[s]
            for j in range(1, 9):
                w = w & m[(s + j) % 16]
            acc = acc | w
        return acc

    corner = arc9(brighter) | arc9(darker)
    if harris is None:
        harris = harris_response(img)
    return jnp.where(corner, harris, -jnp.inf)


def _subpixel_offsets(smooth_score: jax.Array, xs: jax.Array,
                      ys: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Quadratic-fit subpixel offsets at integer maxima of a smooth score map
    (the ungated Harris response). Offsets are clamped to [-0.5, 0.5]."""
    def g(dy, dx):
        return smooth_score[ys + dy, xs + dx]

    def axis_off(m, c, p):
        denom = m - 2.0 * c + p
        off = 0.5 * (m - p) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        return jnp.clip(jnp.where(jnp.abs(denom) < 1e-9, 0.0, off), -0.5, 0.5)

    dx = axis_off(g(0, -1), g(0, 0), g(0, 1))
    dy = axis_off(g(-1, 0), g(0, 0), g(1, 0))
    return dx, dy


def _nms3(score: jax.Array) -> jax.Array:
    """Keep only 3x3 local maxima."""
    neigh = jnp.stack([_shift2d(score, dx, dy)
                       for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                       if (dx, dy) != (0, 0)])
    return jnp.where(score > jnp.max(neigh, axis=0), score, -jnp.inf)


def _orientation(img_blur: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    """Intensity-centroid orientation per keypoint (radius-15 disc)."""
    r = _PATCH_R
    dy, dx = jnp.mgrid[-r:r + 1, -r:r + 1]
    disc = (dx * dx + dy * dy) <= r * r
    wx = jnp.where(disc, dx, 0).astype(jnp.float32)       # (31, 31)
    wy = jnp.where(disc, dy, 0).astype(jnp.float32)

    def one(x, y):
        patch = jax.lax.dynamic_slice(
            img_blur, (y - r, x - r), (2 * r + 1, 2 * r + 1))
        m10 = jnp.sum(patch * wx)
        m01 = jnp.sum(patch * wy)
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(xs, ys)


def _brief_descriptors(img_blur: jax.Array, xs: jax.Array, ys: jax.Array,
                       theta: jax.Array) -> jax.Array:
    """Steered BRIEF-256 -> (N, 32) uint8 (nearest-pixel samples)."""
    pat = jnp.asarray(_PATTERN)                            # (256, 2, 2)
    c, s = jnp.cos(theta), jnp.sin(theta)                  # (N,)
    R = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)  # (N,2,2)
    # rotated offsets: (N, 256, 2, 2)
    rot = jnp.einsum("nij,pkj->npki", R, pat)
    H, W = img_blur.shape
    # bilinear sampling: nearest-pixel rounding flips comparison bits under
    # small rotation/subpixel jitter, measurably hurting matching stability
    px = jnp.clip(xs[:, None, None] + rot[..., 0], 0.0, W - 1.001)
    py = jnp.clip(ys[:, None, None] + rot[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = px - x0
    fy = py - y0
    vals = (img_blur[y0, x0] * (1 - fx) * (1 - fy)
            + img_blur[y0, x0 + 1] * fx * (1 - fy)
            + img_blur[y0 + 1, x0] * (1 - fx) * fy
            + img_blur[y0 + 1, x0 + 1] * fx * fy)          # (N, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)  # (N, 256)
    weights = (jnp.left_shift(jnp.ones((8,), jnp.int32),
                              jnp.arange(8, dtype=jnp.int32))).astype(jnp.uint8)
    return jnp.sum(bits.reshape(-1, 32, 8) * weights[None, None, :],
                   axis=-1).astype(jnp.uint8)


class _LevelResult(NamedTuple):
    xs: jax.Array
    ys: jax.Array
    score: jax.Array
    desc: jax.Array
    angle: jax.Array


@partial(jax.jit, static_argnames=("max_kp", "n_levels", "fast_thresh"))
def orb_detect_and_describe(img: jax.Array, max_kp: int = 1024,
                            n_levels: int = 8, scale: float = 1.2,
                            fast_thresh: float = 20.0) -> Features:
    """Full ORB front-end for one grayscale image -> padded :class:`Features`.

    Keypoint coords are level-0 pixels; descriptors are (max_kp, 32) uint8.
    Per-level budget splits ``max_kp`` geometrically like cv2.ORB.
    """
    img = img.astype(jnp.float32)
    H0, W0 = img.shape

    # geometric per-level budgets (sum == max_kp)
    inv = [scale ** (-i) for i in range(n_levels)]
    total = sum(inv)
    budgets = [max(8, int(round(max_kp * v / total))) for v in inv]
    # fix rounding so the sum is exactly max_kp
    budgets[0] += max_kp - sum(budgets)

    xs_all, ys_all, sc_all, ds_all, an_all = [], [], [], [], []
    level_img = img
    for lvl in range(n_levels):
        Hl, Wl = level_img.shape
        if min(Hl, Wl) < 2 * _BORDER + 4:
            break
        k = budgets[lvl]
        harris = harris_response(level_img)
        score = fast_score_map(level_img, fast_thresh, harris=harris)
        score = _nms3(score)
        # mask border
        yy = jnp.arange(Hl)[:, None]
        xx = jnp.arange(Wl)[None, :]
        inb = ((xx >= _BORDER) & (xx < Wl - _BORDER)
               & (yy >= _BORDER) & (yy < Hl - _BORDER))
        score = jnp.where(inb, score, -jnp.inf)

        flat = score.reshape(-1)
        top_v, top_i = jax.lax.top_k(flat, k)
        ys = (top_i // Wl).astype(jnp.int32)
        xs = (top_i % Wl).astype(jnp.int32)
        ok = jnp.isfinite(top_v)
        sub_dx, sub_dy = _subpixel_offsets(harris, xs, ys)

        blur = _sep_conv(_sep_conv(level_img, _gaussian_kernel(2.0, 4)).T,
                         _gaussian_kernel(2.0, 4)).T
        theta = _orientation(blur, xs, ys)
        desc = _brief_descriptors(blur, xs, ys, theta)

        s = scale ** lvl
        xs_all.append((xs.astype(jnp.float32) + sub_dx) * s)
        ys_all.append((ys.astype(jnp.float32) + sub_dy) * s)
        sc_all.append(jnp.where(ok, top_v, -jnp.inf))
        ds_all.append(desc)
        an_all.append(theta)

        if lvl + 1 < n_levels:
            Hn, Wn = int(round(Hl / scale)), int(round(Wl / scale))
            level_img = jax.image.resize(level_img, (Hn, Wn), "linear")

    xs = jnp.concatenate(xs_all)
    ys = jnp.concatenate(ys_all)
    sc = jnp.concatenate(sc_all)
    ds = jnp.concatenate(ds_all, axis=0)
    # global top-K by score across levels
    k_out = max_kp
    top_v, top_i = jax.lax.top_k(sc, min(k_out, sc.shape[0]))
    valid = jnp.isfinite(top_v)
    kpts = jnp.stack([xs[top_i], ys[top_i]], axis=-1)
    desc = ds[top_i]
    n_pad = k_out
    if kpts.shape[0] < n_pad:
        pad = n_pad - kpts.shape[0]
        kpts = jnp.pad(kpts, ((0, pad), (0, 0)))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        top_v = jnp.pad(top_v, (0, pad), constant_values=-jnp.inf)
        valid = jnp.pad(valid, (0, pad))
    return Features(kpts=kpts, desc=desc,
                    scores=jnp.where(valid, top_v, 0.0), valid=valid)


def rgb_to_gray(img_bgr: jax.Array) -> jax.Array:
    """BGR uint8 (H, W, 3) -> float32 grayscale (ITU-R 601, like cv2)."""
    b = img_bgr[..., 0].astype(jnp.float32)
    g = img_bgr[..., 1].astype(jnp.float32)
    r = img_bgr[..., 2].astype(jnp.float32)
    return 0.114 * b + 0.587 * g + 0.299 * r
