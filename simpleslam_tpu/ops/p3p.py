"""Batched P3P minimal solver (Grunert) in pure JAX.

The 6-point DLT pose degenerates when the sampled world points are coplanar
— common in man-made scenes (one wall / the ground plane). P3P has no planar
degeneracy (only collinearity), which is why cv2.solvePnPRansac's minimal
stage uses it; this module provides the TPU-native equivalent used by
``ops.pnp.solve_pnp_ransac``.

Method (Grunert 1841 / Haralick et al. review):
  * with camera-ray unit bearings j1..j3 and inter-point distances a, b, c,
    the distance ratios (u, v) satisfy a quartic in v. The quartic's
    coefficients are recovered NUMERICALLY by evaluating the defining
    polynomial at 5 nodes and applying a fixed inverse-Vandermonde — robust
    and branch-free, ideal under vmap.
  * quartic roots via Ferrari's analytic method in complex arithmetic
    (depressed quartic -> resolvent cubic -> two quadratics); real positive
    roots become distance solutions.
  * each (s1, s2, s3) triplet gives camera-frame points; the absolute
    orientation (Kabsch on 3 points) yields T_cw. Up to 4 poses per sample;
    all are scored by the caller's RANSAC, so no in-solver disambiguation is
    needed.

Root accuracy is f32 (~1e-4 relative) — ample for RANSAC hypotheses that are
polished by Gauss-Newton afterwards.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from simpleslam_tpu.ops import se3
from simpleslam_tpu.utils.precision import highest_precision

_EPS = 1e-12


def _solve_cubic_all(p, q):
    """All 3 (complex) roots of t^3 + p t + q = 0 (Cardano)."""
    pc = p.astype(jnp.complex64)
    qc = q.astype(jnp.complex64)
    disc = (qc / 2) ** 2 + (pc / 3) ** 3
    sq = jnp.sqrt(disc)
    u3 = -qc / 2 + sq
    u = u3 ** (1.0 / 3.0)
    u = jnp.where(jnp.abs(u) < 1e-20, jnp.complex64(1e-20), u)
    omega = jnp.exp(jnp.complex64(2j * jnp.pi / 3))
    us = jnp.stack([u, u * omega, u * omega ** 2], axis=-1)
    return us - pc[..., None] / (3 * us)


def solve_quartic_real(c4, c3, c2, c1, c0):
    """Real parts of the 4 roots of c4 x^4 + ... + c0 = 0 (Ferrari).

    Returns (roots (..., 4), is_real (..., 4)). Degenerate/complex roots are
    flagged via ``is_real`` (imaginary magnitude test).
    """
    c4s = jnp.where(jnp.abs(c4) < _EPS, _EPS, c4)
    b = c3 / c4s
    c = c2 / c4s
    d = c1 / c4s
    e = c0 / c4s
    # depressed quartic y^4 + p y^2 + q y + r, x = y - b/4
    p = c - 3 * b * b / 8
    q = d - b * c / 2 + b ** 3 / 8
    r = e - b * d / 4 + b * b * c / 16 - 3 * b ** 4 / 256

    # resolvent cubic: m^3 + p m^2 + (p^2/4 - r) m - q^2/8 = 0 (for 2m = z)
    # use substitution m = t - p/3 to depressed cubic
    A = p
    B = p * p / 4 - r
    C = -q * q / 8
    pp = B - A * A / 3
    qq = 2 * A ** 3 / 27 - A * B / 3 + C
    ms = _solve_cubic_all(pp, qq) - (A / 3).astype(jnp.complex64)[..., None]
    # any root m with 2m > 0 works; pick the real root with the largest
    # positive real part (the principal root can be negative/complex)
    real_ok = jnp.abs(ms.imag) < 1e-4 * (1.0 + jnp.abs(ms.real))
    score = jnp.where(real_ok, ms.real, -jnp.inf)
    m = jnp.max(score, axis=-1)
    m = jnp.maximum(m, 1e-12)      # need m > 0 for the sqrt below

    sqrt2m = jnp.sqrt(2 * m).astype(jnp.complex64)
    q_c = q.astype(jnp.complex64)
    p_c = p.astype(jnp.complex64)
    m_c = m.astype(jnp.complex64)
    # y^2 +- sqrt(2m) y + (p/2 + m -+ q/(2 sqrt(2m))) = 0
    t1 = p_c / 2 + m_c - q_c / (2 * sqrt2m)
    t2 = p_c / 2 + m_c + q_c / (2 * sqrt2m)
    d1 = jnp.sqrt(sqrt2m ** 2 - 4 * t1)
    d2 = jnp.sqrt(sqrt2m ** 2 - 4 * t2)
    y = jnp.stack([(-sqrt2m + d1) / 2, (-sqrt2m - d1) / 2,
                   (sqrt2m + d2) / 2, (sqrt2m - d2) / 2], axis=-1)
    x = y - (b / 4).astype(jnp.complex64)[..., None]
    is_real = jnp.abs(x.imag) < 1e-3 * (1.0 + jnp.abs(x.real))
    return x.real, is_real


@highest_precision
def p3p_grunert(X: jax.Array, bearings: jax.Array):
    """P3P: world points X (3, 3) + unit camera bearings (3, 3) ->
    (poses (4, 4, 4) T_cw, valid (4,) bool)."""
    X1, X2, X3 = X[0], X[1], X[2]
    j1, j2, j3 = bearings[0], bearings[1], bearings[2]
    a = jnp.linalg.norm(X2 - X3)
    b = jnp.linalg.norm(X1 - X3)
    c = jnp.linalg.norm(X1 - X2)
    ca = jnp.dot(j2, j3)
    cb = jnp.dot(j1, j3)
    cg = jnp.dot(j1, j2)

    b2 = jnp.maximum(b * b, _EPS)
    ab = a * a / b2
    cb2 = c * c / b2

    def w_of(v):
        return 1.0 + v * v - 2.0 * v * cb

    def u_of(v):
        num = (cb2 - ab) * w_of(v) + v * v - 1.0
        den = 2.0 * (v * ca - cg)
        return num / jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)

    def g(v):
        u = u_of(v)
        return (1.0 + u * u - 2.0 * u * cg) - cb2 * w_of(v)

    # g(v) * den(v)^2 is a quartic in v; recover coefficients by sampling
    nodes = jnp.array([0.0, 1.0, -1.0, 2.0, -2.0])

    def gden2(v):
        # g(v) * den(v)^2 with u = u_num / den substituted into
        # 1 + u^2 - 2 u cg - cb2 w(v)  ->  exact quartic polynomial in v
        den = 2.0 * (v * ca - cg)
        u_num = (cb2 - ab) * w_of(v) + v * v - 1.0
        return (den * den * (1.0 - cb2 * w_of(v))
                + u_num * u_num - 2.0 * cg * u_num * den)

    vals = jax.vmap(gden2)(nodes)
    # inverse Vandermonde for nodes [0, 1, -1, 2, -2]: a CONSTANT matrix —
    # precomputed on host so coefficient recovery is one matvec, not a
    # batched 5x5 LU solve
    import numpy as _np
    Vinv = jnp.asarray(_np.linalg.inv(
        _np.stack([_np.array([0.0, 1.0, -1.0, 2.0, -2.0]) ** k
                   for k in range(5)], axis=1)), vals.dtype)
    coeffs = Vinv @ vals                                     # c0..c4

    roots, is_real = solve_quartic_real(coeffs[4], coeffs[3], coeffs[2],
                                        coeffs[1], coeffs[0])

    # Newton polish on the UNEXPANDED residual gden2(v): the analytic roots
    # carry f32 coefficient-expansion error (ill-conditioned for near-planar
    # triples); evaluating the stable factored form fixes it cheaply.
    dg = jax.grad(gden2)

    def polish(v):
        # unrolled (python loop): 6 tiny sequential kernels fuse into the
        # surrounding program instead of an XLA while-loop
        for _ in range(6):
            d = dg(v)
            step = gden2(v) / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
            v = v - jnp.clip(step, -0.5, 0.5)
        return v

    roots = jax.vmap(polish)(roots)

    def pose_from_v(v, ok):
        u = u_of(v)
        s1sq = b2 / jnp.maximum(w_of(v), _EPS)
        s1 = jnp.sqrt(jnp.maximum(s1sq, _EPS))
        s2 = u * s1
        s3 = v * s1
        ok = ok & (s1 > 0) & (s2 > 0) & (s3 > 0)
        pc = jnp.stack([s1 * j1, s2 * j2, s3 * j3])          # camera frame
        # absolute orientation via the triad method: for an exact 3-point
        # correspondence the frame-to-frame rotation is closed-form — no
        # batched SVD (TPU small-SVD is iterative and dominated this solver)
        def triad(P):
            u1 = P[1] - P[0]
            u2 = P[2] - P[0]
            e1 = u1 / jnp.maximum(jnp.linalg.norm(u1), _EPS)
            e3 = jnp.cross(e1, u2)
            n3 = jnp.linalg.norm(e3)
            e3 = e3 / jnp.maximum(n3, _EPS)
            e2 = jnp.cross(e3, e1)
            return jnp.stack([e1, e2, e3], axis=1), n3       # columns

        Fw, nw = triad(X)
        Fc, nc = triad(pc)
        ok = ok & (nw > 1e-9) & (nc > 1e-9)                  # non-colinear
        R = Fc @ Fw.T
        t = pc.mean(axis=0) - R @ X.mean(axis=0)
        T = se3.rt_to_T(R, t)
        return jnp.where(ok, T, jnp.eye(4)), ok

    poses, valids = jax.vmap(pose_from_v)(roots, is_real)
    return poses, valids
