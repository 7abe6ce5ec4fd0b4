"""Camera calibration: Zhang's method with JAX refinement.

Replaces the reference's calibration tooling
(config/calibrate_camera/calibration.py:1-137: chessboard detection ->
cv2.calibrateCamera -> pickle consumed by the dataloader, dataloader.py:
171-175). The NUMERICS are ours (the cv2.calibrateCamera C++ solver is on the
native-replacement list): per-view homographies from our DLT, Zhang's
closed-form intrinsics from the B-matrix constraints, extrinsics from H, and
a joint Gauss-Newton refinement of intrinsics + distortion + all view poses
minimizing total reprojection error — all in JAX. Chessboard corner
DETECTION (image IO concern) uses cv2 when present; synthetic/known corners
can be passed directly.

CLI: python -m simpleslam_tpu.tools.calibrate --images 'dir/*.png' \
         --pattern 9 6 --square 0.024 --out calibration.pkl
"""
from __future__ import annotations

import argparse
import glob
import pickle
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.ops import se3
from simpleslam_tpu.ops.epipolar import fit_homography
from simpleslam_tpu.utils.precision import highest_precision


def chessboard_object_points(cols: int, rows: int, square: float) -> np.ndarray:
    """(N, 3) planar board points, z = 0 (calibration.py's objp)."""
    g = np.mgrid[0:cols, 0:rows].T.reshape(-1, 2)
    return np.concatenate([g * square, np.zeros((g.shape[0], 1))],
                          axis=1).astype(np.float64)


def find_chessboard_corners(img, pattern: Tuple[int, int]) -> Optional[np.ndarray]:
    """Corner detection (cv2-backed host IO); (N, 2) or None."""
    try:
        import cv2
    except Exception:
        return None
    gray = img if img.ndim == 2 else cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    ok, corners = cv2.findChessboardCorners(gray, pattern, None)
    if not ok:
        return None
    corners = cv2.cornerSubPix(
        gray, corners, (11, 11), (-1, -1),
        (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 0.001))
    return corners.reshape(-1, 2).astype(np.float64)


# --------------------------------------------------------------------------- #
# Zhang closed form
# --------------------------------------------------------------------------- #

def _vij(H, i, j):
    return np.array([
        H[0, i] * H[0, j],
        H[0, i] * H[1, j] + H[1, i] * H[0, j],
        H[1, i] * H[1, j],
        H[2, i] * H[0, j] + H[0, i] * H[2, j],
        H[2, i] * H[1, j] + H[1, i] * H[2, j],
        H[2, i] * H[2, j]])


def zhang_intrinsics(Hs: List[np.ndarray]) -> np.ndarray:
    """Closed-form K from >= 3 view homographies (Zhang 2000)."""
    V = []
    for H in Hs:
        V.append(_vij(H, 0, 1))
        V.append(_vij(H, 0, 0) - _vij(H, 1, 1))
    V = np.asarray(V)
    _, _, Vt = np.linalg.svd(V)
    b11, b12, b22, b13, b23, b33 = Vt[-1]
    v0 = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 ** 2)
    lam = b33 - (b13 ** 2 + v0 * (b12 * b13 - b11 * b23)) / b11
    alpha = np.sqrt(lam / b11)
    beta = np.sqrt(lam * b11 / (b11 * b22 - b12 ** 2))
    gamma = -b12 * alpha ** 2 * beta / lam
    u0 = gamma * v0 / beta - b13 * alpha ** 2 / lam
    return np.array([[alpha, 0.0, u0], [0.0, beta, v0], [0.0, 0.0, 1.0]])


def extrinsics_from_h(H: np.ndarray, K: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-view (R, t) with the board plane z = 0."""
    Kinv = np.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / max(np.linalg.norm(Kinv @ h1), 1e-12)
    r1 = lam * (Kinv @ h1)
    r2 = lam * (Kinv @ h2)
    r3 = np.cross(r1, r2)
    R = np.stack([r1, r2, r3], axis=1)
    # project onto SO(3)
    U, _, Vt = np.linalg.svd(R)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = -R
    t = lam * (Kinv @ h3)
    if t[2] < 0:
        t = -t
        R[:, :2] = -R[:, :2]
    return R, t


# --------------------------------------------------------------------------- #
# Joint refinement (GN over intrinsics + distortion + view poses)
# --------------------------------------------------------------------------- #

@highest_precision
def _reproject_all(params, obj_pts, n_views):
    """params: [fx, fy, cx, cy, k1, k2, p1, p2, k3] + 6 per view."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, p1, p2, k3 = params[4], params[5], params[6], params[7], params[8]
    uvs = []
    for v in range(n_views):
        xi = params[9 + 6 * v: 15 + 6 * v]
        T = se3.se3_exp(xi)
        pc = obj_pts @ T[:3, :3].T + T[:3, 3]
        x = pc[:, 0] / pc[:, 2]
        y = pc[:, 1] / pc[:, 2]
        r2 = x * x + y * y
        rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        uvs.append(jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1))
    return jnp.stack(uvs)                         # (V, N, 2)


def calibrate_camera(obj_pts: np.ndarray, img_pts: np.ndarray,
                     refine_iters: int = 20, fix_k3: bool = True):
    """Zhang init + joint GN refinement.

    obj_pts: (N, 3) planar board points; img_pts: (V, N, 2) detections.
    Returns (K (3,3), D (5,), rms_px, T_views (V, 4, 4)).
    """
    V = img_pts.shape[0]
    Hs = [np.asarray(fit_homography(
        jnp.asarray(obj_pts[:, :2], jnp.float32),
        jnp.asarray(img_pts[v], jnp.float32)), np.float64)
        for v in range(V)]
    K0 = zhang_intrinsics(Hs)

    params = [K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2], 0, 0, 0, 0, 0]
    for v in range(V):
        R, t = extrinsics_from_h(Hs[v], K0)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        params.extend(np.asarray(se3.se3_log(jnp.asarray(T, jnp.float32))))
    params = jnp.asarray(np.asarray(params, np.float32))

    obs = jnp.asarray(img_pts, jnp.float32)
    objj = jnp.asarray(obj_pts, jnp.float32)
    n_par = params.shape[0]
    free = np.ones(n_par, bool)
    if fix_k3:
        free[8] = False
    freej = jnp.asarray(free)

    def residuals(p):
        return (_reproject_all(p, objj, V) - obs).reshape(-1)

    @jax.jit
    def gn_step(p, lam):
        J = jax.jacfwd(residuals)(p)
        r = residuals(p)
        J = J * freej[None, :]
        H = J.T @ J + lam * jnp.eye(n_par)
        dp = -jnp.linalg.solve(H, J.T @ r)
        p_new = p + dp * freej
        better = jnp.sum(residuals(p_new) ** 2) < jnp.sum(r ** 2)
        return (jnp.where(better, p_new, p),
                jnp.where(better, lam * 0.5, lam * 4.0))

    lam = jnp.float32(1e-3)
    for _ in range(refine_iters):
        params, lam = gn_step(params, lam)

    p = np.asarray(params, np.float64)
    K = np.array([[p[0], 0, p[2]], [0, p[1], p[3]], [0, 0, 1.0]])
    D = np.array([p[4], p[5], p[6], p[7], p[8]])
    r = np.asarray(residuals(params))
    rms = float(np.sqrt(np.mean(r ** 2)))
    Ts = [np.asarray(se3.se3_exp(params[9 + 6 * v: 15 + 6 * v]), np.float64)
          for v in range(V)]
    return K, D, rms, np.stack(Ts)


def main(argv=None) -> int:
    p = argparse.ArgumentParser("calibrate")
    p.add_argument("--images", required=True, help="glob of board images")
    p.add_argument("--pattern", type=int, nargs=2, default=[9, 6])
    p.add_argument("--square", type=float, default=0.024)
    p.add_argument("--out", default="calibration.pkl")
    p.add_argument("--fit_k3", action="store_true",
                   help="fit the 6th-order radial term (cv2.calibrateCamera "
                        "does; needs strong distortion + wide field coverage)")
    p.add_argument("--refine_iters", type=int, default=40)
    a = p.parse_args(argv)

    import cv2
    objp = chessboard_object_points(a.pattern[0], a.pattern[1], a.square)
    img_pts = []
    for path in sorted(glob.glob(a.images)):
        img = cv2.imread(path)
        c = find_chessboard_corners(img, tuple(a.pattern))
        if c is not None:
            img_pts.append(c)
    if len(img_pts) < 3:
        print(f"need >= 3 usable views, got {len(img_pts)}")
        return 1
    K, D, rms, Ts = calibrate_camera(objp, np.stack(img_pts),
                                     refine_iters=a.refine_iters,
                                     fix_k3=not a.fit_k3)
    print(f"K=\n{K}\nD={D}\nrms={rms:.3f} px over {len(img_pts)} views")
    # pickle layout compatible with the dataloader's consumer
    # (dataloader.py:171-175 reads `camera_matrix, *_`)
    with open(a.out, "wb") as f:
        pickle.dump((K, D, rms), f)
    print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
