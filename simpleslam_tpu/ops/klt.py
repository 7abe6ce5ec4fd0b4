"""Pyramidal Lucas-Kanade optical flow in pure JAX.

TPU-native replacement for ``cv2.calcOpticalFlowPyrLK`` (used by the
reference's legacy KLT driver, slam/monocular/main4.py:402,419, including the
forward+backward consistency gating at :386-437).

Everything is batched over points: per pyramid level the window gradients,
the 2x2 normal matrices and the iterative updates are computed for ALL
tracked points at once (N x win^2 gathers + tiny batched solves) — no
per-point Python.
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp

from simpleslam_tpu.utils.precision import highest_precision

_EPS = 1e-9


def build_pyramid(img: jax.Array, n_levels: int = 4) -> List[jax.Array]:
    """Gaussian-ish pyramid: blur (binomial 5-tap) + 2x decimate."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    levels = [img.astype(jnp.float32)]
    cur = levels[0]
    for _ in range(n_levels - 1):
        x = cur[None, None]
        kh = k.reshape(1, 1, 5, 1)
        kw = k.reshape(1, 1, 1, 5)
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(2, 2), (0, 0)])
        x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (2, 2)])
        cur = x[0, 0, ::2, ::2]
        levels.append(cur)
    return levels


def _sample_bilinear(img: jax.Array, xy: jax.Array) -> jax.Array:
    """img (H, W); xy (..., 2) -> (...,) bilinear samples (clamped)."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    return (img[y0, x0] * (1 - fx) * (1 - fy)
            + img[y0, x0 + 1] * fx * (1 - fy)
            + img[y0 + 1, x0] * (1 - fx) * fy
            + img[y0 + 1, x0 + 1] * fx * fy)


@partial(jax.jit, static_argnames=("win", "iters", "n_levels"))
@highest_precision
def lk_track(img0: jax.Array, img1: jax.Array, pts0: jax.Array,
             *, win: int = 21, iters: int = 10, n_levels: int = 4,
             min_eig: float = 1e-4) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Track pts0 (N, 2) from img0 to img1.

    Returns (pts1 (N,2), status (N,) bool, err (N,) mean |residual|).
    Matches cv2.calcOpticalFlowPyrLK's contract: status=0 for points whose
    window leaves the image or whose normal matrix is degenerate.
    """
    pyr0 = build_pyramid(img0, n_levels)
    pyr1 = build_pyramid(img1, n_levels)
    r = win // 2
    dy, dx = jnp.mgrid[-r:r + 1, -r:r + 1]
    offs = jnp.stack([dx.ravel(), dy.ravel()], -1).astype(jnp.float32)  # (W2,2)

    N = pts0.shape[0]
    flow = jnp.zeros((N, 2), jnp.float32)
    ok = jnp.ones((N,), bool)

    for lvl in range(n_levels - 1, -1, -1):
        I0 = pyr0[lvl]
        I1 = pyr1[lvl]
        s = 0.5 ** lvl
        p0 = pts0 * s
        H, W = I0.shape

        # template windows + gradients at level-lvl positions
        coords0 = p0[:, None, :] + offs[None, :, :]            # (N, W2, 2)
        T = _sample_bilinear(I0, coords0)
        gx = 0.5 * (_sample_bilinear(I0, coords0 + jnp.array([1.0, 0]))
                    - _sample_bilinear(I0, coords0 + jnp.array([-1.0, 0])))
        gy = 0.5 * (_sample_bilinear(I0, coords0 + jnp.array([0, 1.0]))
                    - _sample_bilinear(I0, coords0 + jnp.array([0, -1.0])))
        Gxx = jnp.sum(gx * gx, axis=1)
        Gxy = jnp.sum(gx * gy, axis=1)
        Gyy = jnp.sum(gy * gy, axis=1)
        det = Gxx * Gyy - Gxy * Gxy
        tr = Gxx + Gyy
        eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        solvable = eig_min > min_eig * (win * win)
        det_s = jnp.where(jnp.abs(det) < _EPS, _EPS, det)

        def body(_, fl):
            coords1 = (p0 + fl)[:, None, :] + offs[None, :, :]
            Iw = _sample_bilinear(I1, coords1)
            rsd = T - Iw                                         # (N, W2)
            bx = jnp.sum(gx * rsd, axis=1)
            by = jnp.sum(gy * rsd, axis=1)
            du = (Gyy * bx - Gxy * by) / det_s
            dv = (Gxx * by - Gxy * bx) / det_s
            d = jnp.stack([du, dv], -1)
            d = jnp.where(solvable[:, None], d, 0.0)
            return fl + d

        flow = jax.lax.fori_loop(0, iters, body, flow)
        ok = ok & solvable

        if lvl > 0:
            flow = flow * 2.0

    pts1 = pts0 + flow
    # final residual + bounds check at level 0
    H0, W0 = pyr0[0].shape
    coords1 = pts1[:, None, :] + offs[None, :, :]
    Iw = _sample_bilinear(pyr1[0], coords1)
    coords0 = pts0[:, None, :] + offs[None, :, :]
    T0 = _sample_bilinear(pyr0[0], coords0)
    err = jnp.mean(jnp.abs(T0 - Iw), axis=1)
    inb = ((pts1[:, 0] >= r) & (pts1[:, 0] < W0 - r)
           & (pts1[:, 1] >= r) & (pts1[:, 1] < H0 - r))
    return pts1, ok & inb, err


@partial(jax.jit, static_argnames=("win", "iters", "n_levels"))
def fb_track(img0: jax.Array, img1: jax.Array, pts0: jax.Array,
             *, win: int = 21, iters: int = 10, n_levels: int = 4,
             fb_thresh: float = 1.0, err_thresh: float = 20.0):
    """Forward-backward consistent tracking (reference main4.py:386-437):
    track 0->1, track back 1->0, keep points whose roundtrip lands within
    ``fb_thresh`` px and whose photometric error stays below ``err_thresh``.

    Returns (pts1, good (N,) bool, err)."""
    pts1, st_f, err = lk_track(img0, img1, pts0, win=win, iters=iters,
                               n_levels=n_levels)
    pts0b, st_b, _ = lk_track(img1, img0, pts1, win=win, iters=iters,
                              n_levels=n_levels)
    fb = jnp.linalg.norm(pts0b - pts0, axis=1)
    good = st_f & st_b & (fb < fb_thresh) & (err < err_thresh)
    return pts1, good, err
