"""SE(3) / SO(3) primitives in JAX.

TPU-native equivalent of the reference's pose layer
(reference: slam/core/pose_utils.py:5-124) plus the Lie-group machinery the
on-device PnP / bundle-adjustment solvers need (so3/se3 exp & log maps — the
reference delegates those to cv2.Rodrigues and Ceres internals).

Conventions (identical to the reference):
  * Poses are stored as 4x4 ``T_cw`` (camera-from-world):
    ``x_cam = R @ X_world + t``  (reference: slam/core/ba_utils.py:6,30).
  * Quaternions are ``xyzw`` ordered and sign-canonicalized to ``w >= 0``
    (reference: slam/core/pose_utils.py:63).

All functions are jit-friendly (static shapes, no Python branching on traced
values) and accept arbitrary leading batch dimensions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from simpleslam_tpu.utils.precision import highest_precision

_EPS = 1e-12


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

@highest_precision
def project_to_SO3(R: jax.Array) -> jax.Array:
    """Project a (..., 3, 3) matrix onto SO(3) via SVD (det fixed to +1).

    Equivalent behavior to reference pose_utils.project_to_SO3.
    """
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    # Flip the last column of U where det < 0 so det(R) == +1.
    flip = jnp.where(det < 0, -1.0, 1.0)[..., None]
    U = U.at[..., :, 2].multiply(flip)
    return U @ Vt


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of a (..., 3) vector."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`: (..., 3, 3) skew matrix -> (..., 3) vector."""
    return jnp.stack(
        [W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1
    )


@highest_precision
def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues formula: axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    TPU-native replacement for ``cv2.Rodrigues`` (vector -> matrix direction;
    reference uses it in slam/core/pnp_utils.py:334).
    Numerically stable at theta -> 0 via Taylor-safe coefficients.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-12
    # sin(t)/t and (1-cos t)/t^2 with small-angle fallbacks.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


@highest_precision
def so3_log(R: jax.Array) -> jax.Array:
    """Log map: rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Replacement for ``cv2.Rodrigues`` (matrix -> vector direction).
    Stable near theta = 0 and theta = pi (quaternion route).
    """
    q = rotmat_to_quat(R)  # xyzw, w >= 0
    xyz = q[..., :3]
    w = q[..., 3]
    n = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(n, w)
    scale = jnp.where(n < 1e-9, 2.0 / jnp.maximum(w, _EPS), theta / jnp.maximum(n, _EPS))
    return xyz * scale[..., None]


def rotation_angle_deg(R: jax.Array) -> jax.Array:
    """Geodesic rotation angle in degrees of (..., 3, 3) rotations.

    Used by the keyframe policy (reference: keyframe_utils.py:34-40).
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    c = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(c))


# ---------------------------------------------------------------------------
# Quaternions (xyzw, w >= 0 canonical — reference pose_utils.py:63)
# ---------------------------------------------------------------------------

def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> xyzw quaternion with w >= 0 (sign-canonical).

    Branch-free Shepperd-style: compute all four candidate solutions and
    select the best-conditioned one (jit-friendly; no data-dependent Python).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate 4*q_i^2 values.
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    # Candidate quaternions (unnormalized), one per dominant component.
    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    sw = _safe_sqrt(qw2) * 2.0  # 4*qw
    qa = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, sw / 4.0], axis=-1)
    sx = _safe_sqrt(qx2) * 2.0  # 4*qx
    qb = jnp.stack([sx / 4.0, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], axis=-1)
    sy = _safe_sqrt(qy2) * 2.0  # 4*qy
    qc = jnp.stack([(m01 + m10) / sy, sy / 4.0, (m12 + m21) / sy, (m02 - m20) / sy], axis=-1)
    sz = _safe_sqrt(qz2) * 2.0  # 4*qz
    qd = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz, sz / 4.0, (m10 - m01) / sz], axis=-1)

    cands = jnp.stack([qa, qb, qc, qd], axis=-2)        # (..., 4, 4)
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)      # (..., 4)
    idx = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    sign = jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return q * sign


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """xyzw quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of xyzw quaternions."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# SE(3) 4x4 homogeneous transforms (T_cw convention)
# ---------------------------------------------------------------------------

def rt_to_T(R: jax.Array, t: jax.Array) -> jax.Array:
    """(R (...,3,3), t (...,3)) -> homogeneous (..., 4, 4).

    Equivalent of reference pose_utils._pose_rt_to_homogenous.
    """
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)          # (...,3,4)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


@highest_precision
def T_inverse(T: jax.Array, reproject: bool = True) -> jax.Array:
    """Inverse of a (..., 4, 4) rigid transform, with optional SO(3)
    re-projection of the rotation block (reference pose_utils._pose_inverse
    re-projects to kill accumulated drift)."""
    R = T[..., :3, :3]
    if reproject:
        R = project_to_SO3(R)
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_T(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def T_compose(A: jax.Array, B: jax.Array) -> jax.Array:
    """A @ B for (..., 4, 4) transforms (explicit name for readability)."""
    return A @ B


@highest_precision
def camera_center(T_cw: jax.Array) -> jax.Array:
    """World-frame camera center  C = -R^T t  of a (..., 4, 4) T_cw.

    (reference: visualization_utils.py:338-364 stores centers this way).
    """
    R = T_cw[..., :3, :3]
    t = T_cw[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)


def pose_to_quat_trans(T: jax.Array) -> tuple[jax.Array, jax.Array]:
    """T (..., 4, 4) -> (xyzw quaternion, translation).

    Equivalent of reference pose_utils._pose_to_quat_trans (xyzw,
    sign-canonical w >= 0).
    """
    return rotmat_to_quat(T[..., :3, :3]), T[..., :3, 3]


def quat_trans_to_pose(q: jax.Array, t: jax.Array) -> jax.Array:
    """(xyzw quaternion, translation) -> T (..., 4, 4).

    Equivalent of reference pose_utils._quat_trans_to_pose.
    """
    return rt_to_T(quat_to_rotmat(q), t)


# ---------------------------------------------------------------------------
# SE(3) exp / log (tangent ordering: [rho (trans), phi (rot)])
# ---------------------------------------------------------------------------

@highest_precision
def se3_exp(xi: jax.Array) -> jax.Array:
    """Exp map: twist (..., 6) = [rho, phi] -> (..., 4, 4).

    Used for tangent-space updates in the PnP refiner and the BA solver
    (the role Ceres' manifold plays in the reference, ba_utils.py:247).
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2
    )
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return rt_to_T(R, t)


@highest_precision
def se3_log(T: jax.Array) -> jax.Array:
    """Log map: (..., 4, 4) -> twist (..., 6) = [rho, phi]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-12
    half = 0.5 * theta
    # V^{-1} = I - W/2 + (1/theta^2)(1 - a/(2b)) W^2 with standard coeffs.
    cot = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / jnp.maximum(theta2, _EPS),
    )
    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + cot[..., None, None] * (W @ W)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


@highest_precision
def apply_left_update(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Left-multiplicative retraction  exp(xi) @ T  (solver update step)."""
    return se3_exp(xi) @ T


@highest_precision
def transform_points(T: jax.Array, X: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) transform to points (..., N, 3) -> (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :]
