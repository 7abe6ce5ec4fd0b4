"""AKAZE front-end in pure JAX: FED nonlinear-diffusion scale space,
scale-normalized Hessian extrema, and a rotated M-LDB binary descriptor.

TPU-native replacement for ``cv2.AKAZE_create`` (reference:
slam/core/features_utils.py:39-41). Design notes:

  * Scale space: Perona-Malik g2 conductivity ``g = 1/(1+|grad Ls|^2/k^2)``
    with the contrast factor ``k`` at the 70th percentile of smoothed
    gradient magnitudes (KAZE's heuristic), evolved by Fast Explicit
    Diffusion cycles (tau_j = tau_max / (4 cos^2(pi(2j+1)/(4n+2)))) between
    the per-sublevel evolution times t = sigma^2/2. Octaves run at
    2x-downsampled resolution like the original.
  * Detection: per-level scale-normalized determinant-of-Hessian response,
    3x3 spatial NMS, per-level budgets, global top-K (mirrors the ORB
    front-end's static-shape selection in ops/features.py).
  * Description: Modified-Local-Difference-Binary over {2x2, 3x3, 4x4} cell
    grids of (intensity, dx, dy) cell means = 486 bits, packed into 64
    bytes (pad bits zero). Rotation handled like the ORB path: orientation
    quantized to bins, per-bin cell-mean sampling matrices precomputed, so
    description is one batched matmul per level; gradient channels are
    rotated into the keypoint frame.

Everything is static-shape, jit-compatible array math — no per-keypoint
Python. Diffusion genuinely differs from Gaussian blur (edges preserved);
tests/test_akaze.py asserts this.
"""
from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.core.types import Features
from simpleslam_tpu.ops.features import (_extract_patches, _gaussian_kernel,
                                          _orientation_from_patches,
                                          _sep_conv, _shift2d, _nms3,
                                          _PATCH_R, _PATCH_SIDE)

_TAU_MAX = 0.25
_N_ANGLE_BINS = 30
_DESC_BYTES = 64            # 486 M-LDB bits -> 512-bit container
_GRIDS = (2, 3, 4)          # M-LDB cell grids
_MLDB_R = 12.0              # descriptor patch radius (level pixels)


def _fed_tau(n: int, T: float) -> np.ndarray:
    """FED step sizes for one cycle of n steps covering total time T."""
    j = np.arange(n)
    tau = _TAU_MAX / (4.0 * np.cos(np.pi * (2 * j + 1) / (4 * n + 2)) ** 2)
    return (tau * (T / tau.sum())).astype(np.float32)


def _fed_cycle_steps(T: float) -> int:
    """Number of FED steps needed to cover time T stably."""
    n = int(np.ceil(0.5 * (np.sqrt(1.0 + 12.0 * T / _TAU_MAX) - 1.0)))
    return max(n, 1)


def _grad(img: jax.Array):
    gx = 0.5 * (_shift2d(img, 1, 0) - _shift2d(img, -1, 0))
    gy = 0.5 * (_shift2d(img, 0, 1) - _shift2d(img, 0, -1))
    return gx, gy


def _diffuse(L: jax.Array, g: jax.Array, taus: np.ndarray) -> jax.Array:
    """Explicit diffusion steps d L/dt = div(g grad L) (half-point fluxes)."""
    gE = 0.5 * (g + _shift2d(g, 1, 0))
    gW = 0.5 * (g + _shift2d(g, -1, 0))
    gS = 0.5 * (g + _shift2d(g, 0, 1))
    gN = 0.5 * (g + _shift2d(g, 0, -1))

    for tau in taus:
        fE = gE * (_shift2d(L, 1, 0) - L)
        fW = gW * (_shift2d(L, -1, 0) - L)
        fS = gS * (_shift2d(L, 0, 1) - L)
        fN = gN * (_shift2d(L, 0, -1) - L)
        L = L + jnp.float32(tau) * (fE + fW + fS + fN)
    return L


def _hessian_response(L: jax.Array, sigma: float) -> jax.Array:
    """Scale-normalized determinant of Hessian."""
    Lx, Ly = _grad(L)
    Lxx, Lxy = _grad(Lx)
    _, Lyy = _grad(Ly)
    return (sigma ** 2) ** 2 * (Lxx * Lyy - Lxy * Lxy)


def _mldb_tables() -> np.ndarray:
    """(BINS, N_CELLS, PATCH_SIDE^2) rotated cell-mean sampling matrices.

    Cell means of the rotated M-LDB grids become one matmul over the shared
    keypoint patch (same trick as the ORB BRIEF tables, ops/features.py).
    """
    P = _PATCH_SIDE
    n_cells = sum(g * g for g in _GRIDS)
    W = np.zeros((_N_ANGLE_BINS, n_cells, P * P), np.float32)
    # sample each cell on a 4x4 sub-grid of points
    sub = (np.arange(4) + 0.5) / 4.0
    for b in range(_N_ANGLE_BINS):
        a = -np.pi + 2.0 * np.pi * b / _N_ANGLE_BINS
        c, s = np.cos(a), np.sin(a)
        ci = 0
        for gdiv in _GRIDS:
            cell = 2.0 * _MLDB_R / gdiv
            for gy in range(gdiv):
                for gx in range(gdiv):
                    x0 = -_MLDB_R + gx * cell
                    y0 = -_MLDB_R + gy * cell
                    pts = np.stack(np.meshgrid(x0 + sub * cell,
                                               y0 + sub * cell), -1)
                    pts = pts.reshape(-1, 2)
                    rx = c * pts[:, 0] - s * pts[:, 1]
                    ry = s * pts[:, 0] + c * pts[:, 1]
                    px = np.clip(rx + _PATCH_R, 0, P - 1.001)
                    py = np.clip(ry + _PATCH_R, 0, P - 1.001)
                    x0i = np.floor(px).astype(int)
                    y0i = np.floor(py).astype(int)
                    fx, fy = px - x0i, py - y0i
                    w = 1.0 / len(pts)
                    np.add.at(W[b, ci], y0i * P + x0i, w * (1 - fx) * (1 - fy))
                    np.add.at(W[b, ci], y0i * P + x0i + 1, w * fx * (1 - fy))
                    np.add.at(W[b, ci], (y0i + 1) * P + x0i, w * (1 - fx) * fy)
                    np.add.at(W[b, ci], (y0i + 1) * P + x0i + 1, w * fx * fy)
                    ci += 1
    return W


_MLDB_W = _mldb_tables()


def _mldb_pairs() -> np.ndarray:
    """(486, 2) within-grid cell index pairs x 3 channels -> bit layout."""
    pairs = []
    off = 0
    for gdiv in _GRIDS:
        n = gdiv * gdiv
        for i in range(n):
            for j in range(i + 1, n):
                pairs.append((off + i, off + j))
        off += n
    return np.asarray(pairs, np.int32)          # (162, 2); x3 channels = 486


_MLDB_PAIRS = _mldb_pairs()


def _mldb_describe(patches_l: jax.Array, patches_gx: jax.Array,
                   patches_gy: jax.Array, theta: jax.Array) -> jax.Array:
    """(N, 64) uint8 M-LDB descriptors from shared patches."""
    B = _N_ANGLE_BINS
    Wt = jnp.asarray(_MLDB_W)                       # (B, C, P^2)
    bins = jnp.round((theta + jnp.pi) * B / (2.0 * jnp.pi)) \
        .astype(jnp.int32) % B

    def cell_means(patches):
        pflat = patches.reshape(patches.shape[0], -1)
        m = jax.lax.dot_general(pflat, Wt, (((1,), (2,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        return jnp.take_along_axis(m, bins[:, None, None], axis=1)[:, 0]

    mi = cell_means(patches_l)                       # (N, C)
    mx = cell_means(patches_gx)
    my = cell_means(patches_gy)
    # rotate gradient means into the keypoint frame
    cth = jnp.cos(theta)[:, None]
    sth = jnp.sin(theta)[:, None]
    mdx = cth * mx + sth * my
    mdy = -sth * mx + cth * my

    pi_, pj_ = jnp.asarray(_MLDB_PAIRS[:, 0]), jnp.asarray(_MLDB_PAIRS[:, 1])
    bits = jnp.concatenate([
        (mi[:, pi_] > mi[:, pj_]),
        (mdx[:, pi_] > mdx[:, pj_]),
        (mdy[:, pi_] > mdy[:, pj_])], axis=1).astype(jnp.uint8)  # (N, 486)
    pad = _DESC_BYTES * 8 - bits.shape[1]
    bits = jnp.pad(bits, ((0, 0), (0, pad)))
    weights = (jnp.left_shift(jnp.ones((8,), jnp.int32),
                              jnp.arange(8, dtype=jnp.int32))).astype(jnp.uint8)
    return jnp.sum(bits.reshape(-1, _DESC_BYTES, 8) * weights[None, None, :],
                   axis=-1).astype(jnp.uint8)


def nonlinear_scale_space(img: jax.Array, n_octaves: int = 4,
                          n_sublevels: int = 4, sigma0: float = 1.6):
    """Build the FED nonlinear scale space.

    Returns a list of (L, sigma, octave) per evolution level; octave o
    images are 2^o-downsampled. Conductivity contrast k is the 70th
    percentile of smoothed gradient magnitude (KAZE heuristic).
    """
    img = img.astype(jnp.float32) / 255.0
    base = _sep_conv(_sep_conv(img, _gaussian_kernel(1.0, 2)).T,
                     _gaussian_kernel(1.0, 2)).T
    gx, gy = _grad(base)
    gmag = jnp.sqrt(gx * gx + gy * gy)
    k = jnp.maximum(jnp.percentile(gmag, 70.0), 1e-4)

    levels = []
    L = base
    t_prev = 0.5 * sigma0 ** 2
    for o in range(n_octaves):
        for s_ in range(n_sublevels):
            sigma = sigma0 * (2.0 ** (o + s_ / n_sublevels))
            t = 0.5 * sigma ** 2
            # evolution time in THIS octave's pixel grid (downsampled by 2^o)
            dt = (t - t_prev) / (4.0 ** o)
            if dt > 1e-6:
                gxl, gyl = _grad(_sep_conv(
                    _sep_conv(L, _gaussian_kernel(1.0, 2)).T,
                    _gaussian_kernel(1.0, 2)).T)
                g = 1.0 / (1.0 + (gxl * gxl + gyl * gyl) / (k * k))
                n = _fed_cycle_steps(float(dt))
                L = _diffuse(L, g, _fed_tau(n, float(dt)))
            levels.append((L, float(sigma), o))
            t_prev = t
        if o + 1 < n_octaves:
            Hl, Wl = L.shape
            L = jax.image.resize(L, (Hl // 2, Wl // 2), "linear")
    return levels


@partial(jax.jit, static_argnames=("max_kp", "n_octaves", "n_sublevels"))
def akaze_detect_and_describe(img: jax.Array, max_kp: int = 1024,
                              n_octaves: int = 4, n_sublevels: int = 4,
                              thresh: float = 1e-5) -> Features:
    """Full AKAZE front-end for one grayscale image -> padded Features.

    Descriptors are (max_kp, 64) uint8 M-LDB bits; keypoint coordinates are
    level-0 pixels.
    """
    H0, W0 = img.shape
    levels = nonlinear_scale_space(img, n_octaves, n_sublevels)

    n_lv = len(levels)
    budget = max(8, max_kp // n_lv)
    border = _PATCH_R + 2

    xs_all: List[jax.Array] = []
    ys_all: List[jax.Array] = []
    sc_all: List[jax.Array] = []
    ds_all: List[jax.Array] = []
    for (L, sigma, o) in levels:
        Hl, Wl = L.shape
        if min(Hl, Wl) < 2 * border + 4:
            break
        resp = _hessian_response(L, sigma / (2.0 ** o))
        resp = jnp.where(resp > thresh, resp, -jnp.inf)
        resp = _nms3(resp)
        yy = jnp.arange(Hl)[:, None]
        xx = jnp.arange(Wl)[None, :]
        inb = ((xx >= border) & (xx < Wl - border)
               & (yy >= border) & (yy < Hl - border))
        resp = jnp.where(inb, resp, -jnp.inf)

        v, idx = jax.lax.approx_max_k(resp.reshape(-1), budget,
                                      recall_target=0.95)
        ys = (idx // Wl).astype(jnp.int32)
        xs = (idx % Wl).astype(jnp.int32)

        gx, gy = _grad(L)
        p_l = _extract_patches(L, xs, ys)
        p_gx = _extract_patches(gx, xs, ys)
        p_gy = _extract_patches(gy, xs, ys)
        theta = _orientation_from_patches(p_l)
        desc = _mldb_describe(p_l, p_gx, p_gy, theta)

        s = 2.0 ** o
        xs_all.append(xs.astype(jnp.float32) * s)
        ys_all.append(ys.astype(jnp.float32) * s)
        sc_all.append(jnp.where(jnp.isfinite(v), v, -jnp.inf))
        ds_all.append(desc)

    xs = jnp.concatenate(xs_all)
    ys = jnp.concatenate(ys_all)
    sc = jnp.concatenate(sc_all)
    ds = jnp.concatenate(ds_all, axis=0)
    top_v, top_i = jax.lax.top_k(sc, min(max_kp, sc.shape[0]))
    valid = jnp.isfinite(top_v)
    kpts = jnp.stack([xs[top_i], ys[top_i]], axis=-1)
    desc = ds[top_i]
    if kpts.shape[0] < max_kp:
        pad = max_kp - kpts.shape[0]
        kpts = jnp.pad(kpts, ((0, pad), (0, 0)))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        top_v = jnp.pad(top_v, (0, pad), constant_values=-jnp.inf)
        valid = jnp.pad(valid, (0, pad))
    return Features(kpts=kpts, desc=desc,
                    scores=jnp.where(valid, top_v, 0.0), valid=valid)
