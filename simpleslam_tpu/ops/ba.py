"""On-device Schur-complement Levenberg-Marquardt bundle adjustment.

TPU-native replacement for the reference's PyCeres/PyCOLMAP BA stack
(reference: slam/core/ba_utils.py:56-306 — Ceres C++ LM with sparse Schur and
``ReprojErrorCost`` pinhole factors). The whole solve is ONE jitted program:

  * residuals: pinhole reprojection ``pi(K, T_cw_j, X_i) - uv_e`` over a
    padded edge list (cam_idx, pt_idx, uv, valid) — same cost as pycolmap's
    PINHOLE ReprojErrorCost (ba_utils.py:56-68).
  * robustness: Huber(delta) via IRLS weights (ba_utils.py:236 uses
    HuberLoss(2.0)).
  * parametrization: se(3) tangent updates ``T <- exp(dx) T`` (the role of
    Ceres' EigenQuaternionManifold, ba_utils.py:247); fixed-gauge cameras get
    zeroed updates (ba_utils.py:250-257).
  * linear algebra: per-point 3x3 blocks inverted in closed form; the
    camera-camera coupling is assembled DENSELY as (L, P, 6, 3) scatter-adds
    and reduced with einsums into the (6P, 6P) Schur complement — local BA
    windows have P <= ~10 cameras, so the reduced system is a tiny dense
    solve, a perfect MXU shape (no sparse Cholesky needed).
  * damping: classic LM accept/reject (lambda /2 on success, x4 on failure)
    inside a fori_loop — no host round-trips mid-solve.

Memory note: the dense (L, P) block layout trades memory for scatter-free
reductions; at the reference's caps (max_points=5000, window=10) it is ~4 MB.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from simpleslam_tpu.ops import se3
from simpleslam_tpu.utils.precision import highest_precision

_EPS = 1e-12


class BAProblem(NamedTuple):
    """Padded BA problem (static shapes).

    poses:    (P, 4, 4) T_cw initial camera poses.
    points:   (L, 3) initial landmark positions.
    cam_idx:  (E,) int32 edge camera index.
    pt_idx:   (E,) int32 edge point index.
    uv:       (E, 2) measured pixels.
    e_valid:  (E,) bool live edges.
    cam_free: (P,) bool — False = gauge-fixed camera.
    pt_free:  (L,) bool — False = frozen landmark (pose-only BA).
    """
    poses: jax.Array
    points: jax.Array
    cam_idx: jax.Array
    pt_idx: jax.Array
    uv: jax.Array
    e_valid: jax.Array
    cam_free: jax.Array
    pt_free: jax.Array


def _edge_residuals(poses, points, K, cam_idx, pt_idx, uv, e_valid):
    """(E,2) residuals + (E,) validity (in-front & live)."""
    T = poses[cam_idx]                       # (E,4,4)
    X = points[pt_idx]                       # (E,3)
    pc = jnp.einsum("eij,ej->ei", T[:, :3, :3], X) + T[:, :3, 3]
    z = pc[:, 2]
    ok = e_valid & (z > 1e-6)
    zs = jnp.where(z > 1e-6, z, 1.0)
    u = K[0, 0] * pc[:, 0] / zs + K[0, 2]
    v = K[1, 1] * pc[:, 1] / zs + K[1, 2]
    r = jnp.stack([u - uv[:, 0], v - uv[:, 1]], axis=1)
    return jnp.where(ok[:, None], r, 0.0), ok, pc


def _huber_weights(r: jax.Array, delta: float) -> jax.Array:
    """IRLS weights for Huber loss on the residual 2-norm."""
    n = jnp.linalg.norm(r, axis=1)
    return jnp.where(n <= delta, 1.0, delta / jnp.maximum(n, _EPS))


def _robust_cost(r: jax.Array, ok: jax.Array, delta: float) -> jax.Array:
    """Total Huber cost (the quantity LM must decrease)."""
    s = jnp.sum(r * r, axis=1)
    n = jnp.sqrt(jnp.maximum(s, 0.0))
    rho = jnp.where(n <= delta, s, 2.0 * delta * n - delta * delta)
    return jnp.sum(jnp.where(ok, rho, 0.0))


def _inv3x3(M: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    adj = jnp.stack([jnp.stack([A, B, C], -1),
                     jnp.stack([D, E, F], -1),
                     jnp.stack([G, H, I], -1)], -2)
    return adj / det[..., None, None]


def _ba_solve_impl(problem: BAProblem, K: jax.Array, *,
                   huber: float = 2.0, max_iters: int = 12,
                   init_lambda: float = 1e-3, axis_name=None,
                   point_major_obs: int = 0):
    """LM + Schur-complement solver body.

    ``axis_name``: when set, the EDGE arrays (cam_idx/pt_idx/uv/e_valid) are
    the local shard of a mesh axis with that name and every edge reduction
    (normal-equation blocks U/V/g, the camera-point coupling A, and the
    robust cost) is psum-ed across it — the multi-device landmark-block
    parallelism of SURVEY §2 (the TPU analog of Ceres' internal threading,
    reference ba_utils.py:288). Poses/points stay replicated; the tiny
    reduced camera solve runs redundantly on every device.

    ``point_major_obs`` (static): when O > 0, the caller GUARANTEES the edge
    list is point-major — E == L*O with ``pt_idx == repeat(arange(L), O)``
    (the layout core/fused.local_ba and the obs-table builders emit). Every
    point-indexed reduction then becomes an exact (L, O, k) reshape-sum and
    the camera-point coupling a tiny (L,O,P) einsum, eliminating the (E, L)
    one-hot and the (E, P*18) expansion — 99.5% of the generic solve's
    counted FLOPs (12.1 of 13.17 GF/iter at 10/2048/16k) were that
    indicator-matmul garbage work. Wall-clock gain is only ~1.17x because
    the solve is SEQUENTIAL-DEPTH bound, not FLOP/bandwidth bound: per
    iteration it moves ~25 MB (31 us at HBM roofline) and computes ~0.08 GF
    (<1 us at peak) yet takes ~10 ms — the cost is ~15 unfusable reduction
    kernels plus the 60x60 factorization's 60-step scan, each paying fixed
    small-kernel issue latency (measured component times + the full
    depth-bound argument: BASELINE.md round-5 rows). Ignored under
    ``axis_name`` (edge shards lose the layout).
    """
    P = problem.poses.shape[0]
    L = problem.points.shape[0]
    K = K.astype(jnp.float32)

    def allreduce(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    cam_idx = problem.cam_idx
    pt_idx = problem.pt_idx
    uv = problem.uv
    e_valid = problem.e_valid
    cam_free_f = problem.cam_free.astype(jnp.float32)
    pt_free_f = problem.pt_free.astype(jnp.float32)
    fx, fy = K[0, 0], K[1, 1]

    def cost_of(poses, points):
        r, ok, _ = _edge_residuals(poses, points, K, cam_idx, pt_idx, uv, e_valid)
        return allreduce(_robust_cost(r, ok, huber))

    # loop-invariant one-hot reduction matrices (E,P)/(E,L): building the
    # (E,L) f32 tensor inside the LM body re-materializes hundreds of MB
    # per iteration at local-BA sizes
    O = int(point_major_obs) if not axis_name else 0
    if O and problem.cam_idx.shape[0] != L * O:
        raise ValueError(f"point_major_obs={O} needs E == L*O "
                         f"({problem.cam_idx.shape[0]} != {L}*{O})")
    oh_cam = (cam_idx[:, None] == jnp.arange(P)[None, :]).astype(jnp.float32)
    oh_pt = None if O else \
        (pt_idx[:, None] == jnp.arange(L)[None, :]).astype(jnp.float32)

    def lm_step(state):
        poses, points, lam = state

        r, ok, pc = _edge_residuals(poses, points, K, cam_idx, pt_idx, uv, e_valid)
        w = _huber_weights(r, huber) * ok.astype(jnp.float32)

        # per-edge Jacobians
        z = jnp.maximum(pc[:, 2], 1e-6)
        zi = 1.0 / z
        x, y = pc[:, 0], pc[:, 1]
        Ju = jnp.stack([fx * zi, jnp.zeros_like(z), -fx * x * zi * zi], 1)  # (E,3)
        Jv = jnp.stack([jnp.zeros_like(z), fy * zi, -fy * y * zi * zi], 1)
        Jpc = jnp.stack([Ju, Jv], axis=1)                                  # (E,2,3)
        # camera: d pc / d xi = [I | -hat(pc)] (left perturbation)
        Jc_rot = -se3.hat(pc)                                              # (E,3,3)
        Jc = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (pc.shape[0], 3, 3)),
             Jc_rot], axis=2)                                              # (E,3,6)
        Jcam = jnp.einsum("erc,ecs->ers", Jpc, Jc)                         # (E,2,6)
        Rg = poses[cam_idx][:, :3, :3]
        Jpt = jnp.einsum("erc,ecw->erw", Jpc, Rg)                          # (E,2,3)

        # gauge: zero the Jacobians of fixed cameras / frozen points
        Jcam = Jcam * cam_free_f[cam_idx][:, None, None]
        Jpt = Jpt * pt_free_f[pt_idx][:, None, None]

        wJcam = Jcam * w[:, None, None]
        wJpt = Jpt * w[:, None, None]

        # Normal-equation blocks via ONE-HOT MATMUL reductions. TPU scatters
        # serialize; expressing every segment-sum as (segments x E) @ (E x k)
        # keeps the whole assembly on the MXU. One-hot entries are exactly
        # 0/1, so the reduction is exact in f32. (Measured and rejected:
        # a hi/lo-bf16 split of the values at DEFAULT precision — 3x fewer
        # MXU passes — produced NO per-iteration speedup, i.e. the assembly
        # matmuls are not the wall here, while its ~2^-17 Hessian noise made
        # LM take twice the accepted steps to reach the same cost.)
        JJc = jnp.einsum("eri,erj->eij", wJcam, Jcam).reshape(-1, 36)
        U = allreduce((oh_cam.T @ JJc).reshape(P, 6, 6))
        JJp = jnp.einsum("eri,erj->eij", wJpt, Jpt).reshape(-1, 9)
        gpe = -jnp.einsum("eri,er->ei", wJpt, r)                        # (E,3)
        gc = allreduce(oh_cam.T @ -jnp.einsum("eri,er->ei", wJcam, r))  # (P,6)
        cross = jnp.einsum("eri,erj->eij", wJcam, Jpt).reshape(-1, 18)
        if O:
            # point-major layout: per-point reductions are exact reshapes,
            # and the camera-point coupling contracts over the O obs slots
            # against the (L,O,P) camera one-hot — no (E,L) tensor at all
            V = JJp.reshape(L, O, 9).sum(axis=1).reshape(L, 3, 3)
            gp = gpe.reshape(L, O, 3).sum(axis=1)
            A = jnp.einsum("lop,lox->lpx", oh_cam.reshape(L, O, P),
                           cross.reshape(L, O, 18)).reshape(L, P, 6, 3)
        else:
            V = allreduce((oh_pt.T @ JJp).reshape(L, 3, 3))
            gp = allreduce(oh_pt.T @ gpe)                               # (L,3)
            # camera-point coupling A[l, p] (L, P, 6, 3): expand the camera
            # one-hot into the value axis, then reduce over edges by point
            Z = (oh_cam[:, :, None] * cross[:, None, :]).reshape(-1, P * 18)
            A = allreduce((oh_pt.T @ Z).reshape(L, P, 6, 3))

        # LM damping (multiplicative on the diagonal, Ceres-style)
        eye6 = jnp.eye(6, dtype=jnp.float32)
        eye3 = jnp.eye(3, dtype=jnp.float32)
        Ud = U + lam * (U * eye6[None]) + 1e-8 * eye6[None]
        Vd = V + lam * (V * eye3[None]) + 1e-8 * eye3[None]

        Vinv = _inv3x3(Vd) * pt_free_f[:, None, None]   # frozen points drop out

        # Schur complement S = U - sum_i A_i Vinv_i A_i^T ; rhs accordingly
        AV = jnp.einsum("lpis,lst->lpit", A, Vinv)                 # (L,P,6,3)
        S_off = jnp.einsum("lpit,lqjt->pqij", AV, A)               # (P,P,6,6)
        Sd = -S_off
        Sd = Sd.at[jnp.arange(P), jnp.arange(P)].add(Ud)
        rhs = gc - jnp.einsum("lpit,lt->pi", AV, gp)               # (P,6)

        # flatten to (6P, 6P), pin fixed cameras with identity rows
        Sm = Sd.transpose(0, 2, 1, 3).reshape(6 * P, 6 * P)
        free = jnp.repeat(problem.cam_free, 6)
        Sm = jnp.where(free[:, None] & free[None, :], Sm, 0.0)
        Sm = Sm + jnp.diag(jnp.where(free, 0.0, 1.0))
        rv = jnp.where(free, rhs.reshape(-1), 0.0)

        # the damped Schur complement is SPD -> Cholesky. On TPU the
        # pivoting LU of jnp.linalg.solve is a sequential scan (~13x
        # slower at this size, measured 72 vs 5.4 ms standalone at 96x96);
        # if numerics ever break SPD the NaN factor yields a zero step,
        # which LM rejects and answers with more damping (-> SPD again).
        Lc = jnp.linalg.cholesky(Sm)
        yc = jax.scipy.linalg.solve_triangular(Lc, rv, lower=True)
        dc = jax.scipy.linalg.solve_triangular(Lc.T, yc, lower=False)
        dc = jnp.where(jnp.all(jnp.isfinite(dc)), dc, 0.0).reshape(P, 6)
        dp = jnp.einsum("lst,lt->ls", Vinv,
                        gp - jnp.einsum("lpit,pi->lt", A, dc))

        # trial update
        dc = dc * cam_free_f[:, None]
        dp = dp * pt_free_f[:, None]
        poses_new = jax.vmap(lambda d, T: se3.se3_exp(d) @ T)(dc, poses)
        points_new = points + dp

        # r/ok already hold this iterate's residuals — no second pass
        c_old = allreduce(_robust_cost(r, ok, huber))
        c_new = cost_of(poses_new, points_new)
        accept = (c_new < c_old) & jnp.isfinite(c_new)
        poses = jnp.where(accept, poses_new, poses)
        points = jnp.where(accept, points_new, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        return (poses, points, lam), accept, c_old, c_new

    c0 = cost_of(problem.poses, problem.points)

    # LM loop with convergence early-exit: stop when max_iters is reached,
    # after 3 consecutive rejected steps (lambda runaway), or when an
    # accepted step improves the cost by < 1e-5 relative. Ceres stops on the
    # same signals; on TPU the skipped iterations are real time because each
    # LM step is a long chain of sequential kernels.
    def cond(carry):
        state, i, n_good, n_rej, done = carry
        return (i < max_iters) & ~done

    def body(carry):
        state, i, n_good, n_rej, done = carry
        state, accept, c_before, c_after = lm_step(state)
        rel = (c_before - c_after) / jnp.maximum(c_before, 1e-12)
        n_rej = jnp.where(accept, 0, n_rej + 1)
        done = (n_rej >= 3) | (accept & (rel < 1e-5))
        return (state, i + 1, n_good + accept.astype(jnp.int32), n_rej, done)

    state = (problem.poses.astype(jnp.float32),
             problem.points.astype(jnp.float32), jnp.float32(init_lambda))
    (poses, points, _lam), _i, n_good, _r, _d = jax.lax.while_loop(
        cond, body, (state, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                     jnp.asarray(False)))
    c1 = cost_of(poses, points)
    return poses, points, c0, c1, n_good


@partial(jax.jit, static_argnames=("max_iters", "point_major_obs"))
@highest_precision
def ba_solve(problem: BAProblem, K: jax.Array, *,
             huber: float = 2.0, max_iters: int = 12,
             init_lambda: float = 1e-3, point_major_obs: int = 0):
    """Run LM with Schur-complement steps; returns
    (poses, points, cost_initial, cost_final, n_good_iters).

    ``point_major_obs``: see :func:`_ba_solve_impl` — pass the obs-slot
    count O when the edge list is the (L, O) point-major layout."""
    return _ba_solve_impl(problem, K, huber=huber, max_iters=max_iters,
                          init_lambda=init_lambda,
                          point_major_obs=point_major_obs)


@partial(jax.jit, static_argnames=("max_iters", "point_major_obs"))
@highest_precision
def ba_solve_batch(problems: BAProblem, K: jax.Array, *,
                   huber: float = 2.0, max_iters: int = 12,
                   init_lambda: float = 1e-3, point_major_obs: int = 0):
    """N independent BA windows in ONE dispatch.

    Every ``BAProblem`` field carries a leading batch axis (all windows
    padded to one static shape); ``K`` is (3,3) shared or (B,3,3) per-window.
    Returns the same tuple as :func:`ba_solve` with a leading batch axis.

    MEASURED conclusion (BASELINE.md round 4): x8 batching gave only
    ~1.1x solves/s at the 10-cam/2048-pt/16k-edge shape — the per-window
    Schur assembly + LM chain is real throughput-bound work, NOT dispatch
    latency (the round-3 latency hypothesis this refuted). Keep this entry
    point as a many-independent-windows convenience (offline SfM refinement
    sweeps, tools/sfm.py checkpoint GBAs, multi-map / parameter-sweep
    workloads — the role Ceres' thread pool plays in the reference at
    ba_utils.py:288-293); do not expect it to multiply throughput at this
    shape. The vmapped while_loop runs until every window converges
    (per-window early-exit masks into no-op iterations — the dense-batch
    TPU trade).
    """
    if K.ndim == 2:
        K = jnp.broadcast_to(K, (problems.poses.shape[0],) + K.shape)

    def one(prob, Kb):
        return _ba_solve_impl(prob, Kb, huber=huber, max_iters=max_iters,
                              init_lambda=init_lambda,
                              point_major_obs=point_major_obs)

    return jax.vmap(one)(problems, K)


def ba_solve_sharded(problem: BAProblem, K: jax.Array, mesh, *,
                     axis: str = "dp", huber: float = 2.0,
                     max_iters: int = 12, init_lambda: float = 1e-3):
    """Multi-device BA: edges sharded over ``mesh`` axis ``axis``, block
    reductions psum-ed over ICI, replicated camera/landmark state and a
    redundant (tiny) reduced-camera solve per device.

    Semantically identical to :func:`ba_solve` up to float reassociation in
    the psum (the one-hot reductions themselves are exact). Worth it when
    the edge count is large enough that Jacobian assembly dominates the
    dense Schur solve; the single-chip default stays :func:`ba_solve`.
    """
    from jax.sharding import PartitionSpec as Pspec
    try:
        from jax import shard_map
    except ImportError:                        # older jax
        from jax.experimental.shard_map import shard_map

    n_shard = int(mesh.shape[axis])
    E = problem.cam_idx.shape[0]
    pad = (-E) % n_shard
    if pad:
        def padded(a, fill=0):
            return jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)
        problem = problem._replace(
            cam_idx=padded(problem.cam_idx), pt_idx=padded(problem.pt_idx),
            uv=padded(problem.uv),
            e_valid=padded(problem.e_valid, False))

    # edge arrays shard dim 0 over `axis`; other mesh axes replicate
    espec = Pspec(axis)

    @jax.jit
    @highest_precision
    def run(poses, points, cam_idx, pt_idx, uv, e_valid, cam_free, pt_free):
        def inner(poses, points, cam_idx, pt_idx, uv, e_valid,
                  cam_free, pt_free):
            prob = BAProblem(poses=poses, points=points, cam_idx=cam_idx,
                             pt_idx=pt_idx, uv=uv, e_valid=e_valid,
                             cam_free=cam_free, pt_free=pt_free)
            return _ba_solve_impl(prob, K, huber=huber, max_iters=max_iters,
                                  init_lambda=init_lambda, axis_name=axis)

        return shard_map(
            inner, mesh=mesh,
            in_specs=(Pspec(), Pspec(), espec, espec, espec, espec,
                      Pspec(), Pspec()),
            out_specs=(Pspec(), Pspec(), Pspec(), Pspec(), Pspec()),
        )(poses, points, cam_idx, pt_idx, uv, e_valid, cam_free, pt_free)

    with mesh:
        return run(problem.poses, problem.points, problem.cam_idx,
                   problem.pt_idx, problem.uv, problem.e_valid,
                   problem.cam_free, problem.pt_free)


@partial(jax.jit, static_argnames=("max_iters",))
@highest_precision
def pose_only_refine(Tcw: jax.Array, points: jax.Array, uv: jax.Array,
                     valid: jax.Array, K: jax.Array, *,
                     huber: float = 2.0, max_iters: int = 8):
    """Robust single-pose refinement with landmarks fixed
    (reference pose_only_ba, ba_utils.py:89-140). Returns (Tcw, cost0, cost1)."""
    fx, fy = K[0, 0], K[1, 1]

    def residuals(T):
        pc = points @ T[:3, :3].T + T[:3, 3]
        z = pc[:, 2]
        ok = valid & (z > 1e-6)
        zs = jnp.where(z > 1e-6, z, 1.0)
        u = fx * pc[:, 0] / zs + K[0, 2]
        v = fy * pc[:, 1] / zs + K[1, 2]
        r = jnp.stack([u - uv[:, 0], v - uv[:, 1]], 1)
        return jnp.where(ok[:, None], r, 0.0), ok, pc

    def cost(T):
        r, ok, _ = residuals(T)
        return _robust_cost(r, ok, huber)

    def step(_, carry):
        T, lam = carry
        r, ok, pc = residuals(T)
        w = _huber_weights(r, huber) * ok.astype(jnp.float32)
        z = jnp.maximum(pc[:, 2], 1e-6)
        zi = 1.0 / z
        Ju = jnp.stack([fx * zi, jnp.zeros_like(z), -fx * pc[:, 0] * zi * zi], 1)
        Jv = jnp.stack([jnp.zeros_like(z), fy * zi, -fy * pc[:, 1] * zi * zi], 1)
        Jpc = jnp.stack([Ju, Jv], 1)
        Jc = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (pc.shape[0], 3, 3)),
             -se3.hat(pc)], axis=2)
        J = jnp.einsum("erc,ecs->ers", Jpc, Jc)        # (E,2,6)
        Jw = J * w[:, None, None]
        Hm = jnp.einsum("eri,erj->ij", Jw, J)
        Hm = Hm + lam * jnp.diag(jnp.diag(Hm)) + 1e-8 * jnp.eye(6)
        g = -jnp.einsum("eri,er->i", Jw, r)
        dx = jnp.linalg.solve(Hm, g)
        T_new = se3.se3_exp(dx) @ T
        better = (cost(T_new) < cost(T))
        T = jnp.where(better, T_new, T)
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        return T, lam

    c0 = cost(Tcw)
    T, _ = jax.lax.fori_loop(0, max_iters, step, (Tcw.astype(jnp.float32),
                                                  jnp.float32(1e-3)))
    return T, c0, cost(T)
