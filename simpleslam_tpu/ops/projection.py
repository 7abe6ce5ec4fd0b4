"""Pinhole camera projection + lens distortion ops in JAX.

TPU-native replacements for the reference's cv2 camera calls:
  * batch pinhole projection with in-front mask
    (reference: slam/core/pnp_utils.py:130-144 ``_project_points``)
  * ``cv2.undistortPoints``  -> :func:`undistort_points` (iterative inverse
    of the radial-tangential Brown-Conrady model)
  * ``cv2.initUndistortRectifyMap`` + ``cv2.remap``
    (reference: slam/monocular/main_revamped.py:308-317)
    -> :func:`undistort_rectify_map` + :func:`remap_bilinear`
  * ``cv2.getOptimalNewCameraMatrix`` (alpha=0 style) ->
    :func:`optimal_new_camera_matrix`.

All ops are batched and jit-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from simpleslam_tpu.utils.precision import highest_precision

_EPS = 1e-12


@highest_precision
def project_points(X_w: jax.Array, T_cw: jax.Array, K: jax.Array,
                   eps: float = 1e-9) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Project world points into pixels.

    Args:
      X_w:  (..., N, 3) world points.
      T_cw: (..., 4, 4) camera-from-world pose.
      K:    (..., 3, 3) intrinsics.

    Returns:
      uv (..., N, 2) pixel coords, z (..., N) camera-frame depth,
      in_front (..., N) bool mask (z > eps) — matches the reference's
      z > 0 gating (pnp_utils.py:139).
    """
    R = T_cw[..., :3, :3]
    t = T_cw[..., :3, 3]
    Xc = jnp.einsum("...ij,...nj->...ni", R, X_w) + t[..., None, :]
    z = Xc[..., 2]
    in_front = z > eps
    zs = jnp.where(jnp.abs(z) < eps, eps, z)
    xn = Xc[..., 0] / zs
    yn = Xc[..., 1] / zs
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    uv = jnp.stack([fx * xn + cx, fy * yn + cy], axis=-1)
    return uv, z, in_front


def pixels_to_normalized(uv: jax.Array, K: jax.Array) -> jax.Array:
    """Pixel coords (..., N, 2) -> normalized image coords (K^{-1} lift)."""
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y], axis=-1)


def normalized_to_pixels(xy: jax.Array, K: jax.Array) -> jax.Array:
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    return jnp.stack([xy[..., 0] * fx + cx, xy[..., 1] * fy + cy], axis=-1)


def _distort_normalized(xy: jax.Array, D: jax.Array) -> jax.Array:
    """Apply Brown-Conrady distortion (k1,k2,p1,p2[,k3]) to normalized coords."""
    D = jnp.pad(D, (0, max(0, 5 - D.shape[-1])))[:5]
    k1, k2, p1, p2, k3 = D[0], D[1], D[2], D[3], D[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


@highest_precision
def distort_points(uv: jax.Array, K: jax.Array, D: jax.Array) -> jax.Array:
    """Ideal (undistorted) pixels -> distorted pixels."""
    return normalized_to_pixels(_distort_normalized(pixels_to_normalized(uv, K), D), K)


@highest_precision
def undistort_points(uv: jax.Array, K: jax.Array, D: jax.Array | None = None,
                     P: jax.Array | None = None, iters: int = 8) -> jax.Array:
    """cv2.undistortPoints equivalent: distorted pixels -> normalized coords
    (or re-projected through ``P``'s intrinsics if given).

    Fixed-point iteration of the inverse distortion (the standard approach),
    unrolled ``iters`` times (static, jit-friendly). With ``D=None`` this is
    a pure K^{-1} lift — the path two_view_bootstrap.triangulation_metrics
    uses (reference: two_view_bootstrap.py:137-138 with dist=None).
    """
    xy_d = pixels_to_normalized(uv, K)
    if D is None:
        xy = xy_d
    else:
        D5 = jnp.pad(jnp.asarray(D, jnp.float32).reshape(-1),
                     (0, max(0, 5 - jnp.asarray(D).reshape(-1).shape[0])))[:5]
        k1, k2, p1, p2, k3 = D5[0], D5[1], D5[2], D5[3], D5[4]

        def body(_, xy):
            x, y = xy[..., 0], xy[..., 1]
            r2 = x * x + y * y
            radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
            dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
            dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
            xn = (xy_d[..., 0] - dx) / jnp.maximum(radial, _EPS)
            yn = (xy_d[..., 1] - dy) / jnp.maximum(radial, _EPS)
            return jnp.stack([xn, yn], axis=-1)

        xy = jax.lax.fori_loop(0, iters, body, xy_d)
    if P is not None:
        Kp = P[..., :3, :3] if P.shape[-1] == 4 else P
        xy = normalized_to_pixels(xy, Kp)
    return xy


@highest_precision
def optimal_new_camera_matrix(K: jax.Array, D: jax.Array,
                              size_wh: tuple[int, int]) -> jax.Array:
    """Alpha=0-style new camera matrix: scale K so the undistorted image's
    valid inner rectangle fills the frame (approximation of
    cv2.getOptimalNewCameraMatrix(alpha=0); reference main_revamped.py:311)."""
    w, h = size_wh
    # Sample the border of the distorted image, undistort, take inner bounds.
    n = 32
    xs = jnp.linspace(0.0, w - 1.0, n)
    ys = jnp.linspace(0.0, h - 1.0, n)
    border = jnp.concatenate([
        jnp.stack([xs, jnp.zeros(n)], -1),
        jnp.stack([xs, jnp.full(n, h - 1.0)], -1),
        jnp.stack([jnp.zeros(n), ys], -1),
        jnp.stack([jnp.full(n, w - 1.0), ys], -1),
    ])
    und = undistort_points(border, K, D, P=K)
    top = jnp.max(und[:n, 1])
    bot = jnp.min(und[n:2 * n, 1])
    left = jnp.max(und[2 * n:3 * n, 0])
    right = jnp.min(und[3 * n:, 0])
    sx = (w - 1.0) / jnp.maximum(right - left, 1.0)
    sy = (h - 1.0) / jnp.maximum(bot - top, 1.0)
    newK = K.copy()
    newK = newK.at[0, 0].multiply(sx)
    newK = newK.at[1, 1].multiply(sy)
    newK = newK.at[0, 2].set((K[0, 2] - left) * sx)
    newK = newK.at[1, 2].set((K[1, 2] - top) * sy)
    return newK


@highest_precision
def undistort_rectify_map(K: jax.Array, D: jax.Array, new_K: jax.Array,
                          size_wh: tuple[int, int]) -> tuple[jax.Array, jax.Array]:
    """cv2.initUndistortRectifyMap equivalent: per destination pixel, the
    source (distorted) pixel to sample."""
    w, h = size_wh
    u = jnp.arange(w, dtype=jnp.float32)
    v = jnp.arange(h, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)                           # (h, w)
    uv = jnp.stack([uu, vv], axis=-1).reshape(-1, 2)
    # dest pixel -> normalized via new_K -> distort -> source pixel via K
    xy = pixels_to_normalized(uv, new_K)
    src = normalized_to_pixels(_distort_normalized(xy, jnp.asarray(D, jnp.float32).reshape(-1)), K)
    mapx = src[:, 0].reshape(h, w)
    mapy = src[:, 1].reshape(h, w)
    return mapx, mapy


@highest_precision
def remap_bilinear(img: jax.Array, mapx: jax.Array, mapy: jax.Array) -> jax.Array:
    """cv2.remap(INTER_LINEAR, BORDER_CONSTANT=0) equivalent.

    img: (H, W) or (H, W, C); mapx/mapy: (H', W') source coordinates.
    """
    H, W = img.shape[0], img.shape[1]
    chan = img.ndim == 3
    imgf = img.astype(jnp.float32)
    if not chan:
        imgf = imgf[..., None]

    x0 = jnp.floor(mapx)
    y0 = jnp.floor(mapy)
    fx = (mapx - x0)[..., None]
    fy = (mapy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi = jnp.clip(xi, 0, W - 1)
        yi = jnp.clip(yi, 0, H - 1)
        vals = imgf[yi, xi]
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    if img.dtype == jnp.uint8:
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    else:
        out = out.astype(img.dtype)
    return out if chan else out[..., 0]
