"""On-device Sim(3) pose-graph optimization (loop closure back-end).

Beyond reference parity: the reference lists "pose-graph optimisation" as
future work (reference: README.md:317) — this is the TPU-native version, in
the style of the project's BA solver (ops/ba.py): the whole Levenberg-
Marquardt solve is ONE jitted program over padded static shapes.

  * Nodes: keyframe camera-from-world similarities ``S_iw = (R, t, s)``
    (Sim(3), because monocular VO drifts in scale — Strasdat et al.).
  * Edges: relative measurements ``M_ij ≈ S_iw ∘ S_jw^{-1}`` — consecutive
    odometry edges (s = 1 at their linearization) plus loop edges from the
    Sim3 RANSAC verifier (ops/sim3.sim3_ransac_3d3d).
  * Residual: ``r_e = log( M_ij^{-1} ∘ S_i ∘ S_j^{-1} ) ∈ R^7`` with Huber
    robustness; per-edge Jacobians (7x7 wrt each endpoint's left tangent
    perturbation) come from ``jax.jacfwd`` vmapped over the edge list.
  * Assembly: one-hot matmul block reductions (TPU scatters serialize; the
    (K x E) @ (E x 49) formulation keeps everything on the MXU — same trick
    as ops/ba.py), dense (7K, 7K) damped system, Cholesky solve. Keyframe
    counts are a few hundred, so the dense system is a tiny MXU-friendly
    solve — no sparse factorization needed.
  * Gauge: ``node_free = False`` pins nodes (typically node 0, or the loop
    keyframe, which fixes the 7-dof Sim(3) gauge).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from simpleslam_tpu.ops import sim3
from simpleslam_tpu.ops.sim3 import Sim3
from simpleslam_tpu.utils.precision import highest_precision

_EPS = 1e-12


class PGOProblem(NamedTuple):
    """Padded pose-graph problem (static shapes).

    nodes:     Sim3 with batch dim K — initial camera-from-world nodes.
    edge_i/j:  (E,) int32 endpoint indices (i observed-from-j measurement).
    meas:      Sim3 with batch dim E — relative measurements M_ij ≈ Si ∘ Sj^-1.
    e_valid:   (E,) bool live edges.
    e_weight:  (E,) float32 per-edge weight (loop edges may be upweighted).
    node_free: (K,) bool — False pins a node (gauge).
    """
    nodes: Sim3
    edge_i: jax.Array
    edge_j: jax.Array
    meas: Sim3
    e_valid: jax.Array
    e_weight: jax.Array
    node_free: jax.Array


def _edge_residual(Minv: Sim3, Si: Sim3, Sj: Sim3,
                   di: jax.Array, dj: jax.Array) -> jax.Array:
    """r = log( M^-1 ∘ (exp(di) Si) ∘ (exp(dj) Sj)^-1 )  — (7,)."""
    Si_p = sim3.compose(sim3.exp(di), Si)
    Sj_p = sim3.compose(sim3.exp(dj), Sj)
    return sim3.log(sim3.compose(Minv, sim3.compose(Si_p, sim3.inverse(Sj_p))))


def _huber_w(rnorm: jax.Array, delta: float) -> jax.Array:
    return jnp.where(rnorm <= delta, 1.0, delta / jnp.maximum(rnorm, _EPS))


def _robust_cost(r: jax.Array, w_e: jax.Array, delta: float) -> jax.Array:
    s = jnp.sum(r * r, axis=-1)
    n = jnp.sqrt(jnp.maximum(s, 0.0))
    rho = jnp.where(n <= delta, s, 2.0 * delta * n - delta * delta)
    return jnp.sum(w_e * rho)


@partial(jax.jit, static_argnames=("max_iters",))
@highest_precision
def pgo_solve(problem: PGOProblem, *, huber: float = 1.0,
              max_iters: int = 20, init_lambda: float = 1e-4):
    """LM over the Sim(3) pose graph. Returns
    (nodes, cost_initial, cost_final, n_good_iters)."""
    K = problem.nodes.s.shape[0]
    ei, ej = problem.edge_i, problem.edge_j
    w_edge = (problem.e_weight * problem.e_valid.astype(jnp.float32))
    free_f = problem.node_free.astype(jnp.float32)
    Minv = sim3.inverse(problem.meas)
    zero7 = jnp.zeros(7, jnp.float32)

    def edge_r_and_J(nodes: Sim3):
        Si = jax.tree.map(lambda a: a[ei], nodes)
        Sj = jax.tree.map(lambda a: a[ej], nodes)

        def one(mi, si, sj):
            f = lambda di, dj: _edge_residual(mi, si, sj, di, dj)
            r = f(zero7, zero7)
            Ji = jax.jacfwd(f, argnums=0)(zero7, zero7)
            Jj = jax.jacfwd(f, argnums=1)(zero7, zero7)
            return r, Ji, Jj

        return jax.vmap(one)(Minv, Si, Sj)          # (E,7), (E,7,7), (E,7,7)

    def cost_of(nodes: Sim3) -> jax.Array:
        Si = jax.tree.map(lambda a: a[ei], nodes)
        Sj = jax.tree.map(lambda a: a[ej], nodes)
        r = jax.vmap(lambda mi, si, sj: _edge_residual(mi, si, sj,
                                                       zero7, zero7))(
            Minv, Si, Sj)
        r = jnp.where(jnp.isfinite(r), r, 1e3)
        return _robust_cost(r, w_edge, huber)

    # one-hot reduction matrices (E, K) — loop-invariant
    oh_i = (ei[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32)
    oh_j = (ej[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32)

    def lm_step(state):
        nodes, lam = state
        r, Ji, Jj = edge_r_and_J(nodes)
        bad = ~jnp.isfinite(r).all(axis=-1)
        r = jnp.where(bad[:, None], 0.0, r)
        Ji = jnp.where(bad[:, None, None], 0.0, Ji)
        Jj = jnp.where(bad[:, None, None], 0.0, Jj)

        w = w_edge * _huber_w(jnp.linalg.norm(r, axis=-1), huber)
        # gauge: pinned nodes contribute no Jacobian columns
        Ji = Ji * free_f[ei][:, None, None]
        Jj = Jj * free_f[ej][:, None, None]
        wJi = Ji * w[:, None, None]
        wJj = Jj * w[:, None, None]

        # block assembly via one-hot matmuls: H is (K,K,7,7) flattened
        Hii = (oh_i.T @ jnp.einsum("eri,erj->eij", wJi, Ji
                                   ).reshape(-1, 49)).reshape(K, 7, 7)
        Hjj = (oh_j.T @ jnp.einsum("eri,erj->eij", wJj, Jj
                                   ).reshape(-1, 49)).reshape(K, 7, 7)
        cross = jnp.einsum("eri,erj->eij", wJi, Jj).reshape(-1, 49)
        # off-diagonal blocks H[i, j]: expand j one-hot into the value axis
        Zij = (oh_j[:, :, None] * cross[:, None, :]).reshape(-1, K * 49)
        Hij = (oh_i.T @ Zij).reshape(K, K, 7, 7)

        H = jnp.zeros((K, K, 7, 7), jnp.float32)
        H = H + Hij + jnp.swapaxes(jnp.swapaxes(Hij, 0, 1), 2, 3)
        H = H.at[jnp.arange(K), jnp.arange(K)].add(Hii + Hjj)

        g = -(oh_i.T @ jnp.einsum("eri,er->ei", wJi, r)
              + oh_j.T @ jnp.einsum("eri,er->ei", wJj, r))      # (K,7)

        # damp + pin
        Hm = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        diag = jnp.diag(Hm)
        Hm = Hm + jnp.diag(lam * diag + 1e-8)
        free = jnp.repeat(problem.node_free, 7)
        Hm = jnp.where(free[:, None] & free[None, :], Hm, 0.0)
        Hm = Hm + jnp.diag(jnp.where(free, 0.0, 1.0))
        gv = jnp.where(free, g.reshape(-1), 0.0)

        # damped SPD system -> Cholesky (jnp.linalg.solve would lower to a
        # sequential pivoting-LU scan on TPU; see ops/ba.py)
        Lc = jnp.linalg.cholesky(Hm)
        y = jax.scipy.linalg.solve_triangular(Lc, gv, lower=True)
        dx = jax.scipy.linalg.solve_triangular(Lc.T, y, lower=False)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0).reshape(K, 7)
        dx = dx * free_f[:, None]

        nodes_new = sim3.compose(sim3.exp(dx), nodes)
        c_old = cost_of(nodes)
        c_new = cost_of(nodes_new)
        accept = (c_new < c_old) & jnp.isfinite(c_new)
        nodes = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), nodes_new, nodes)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        return (nodes, lam), accept, c_old, c_new

    def cond(carry):
        _state, i, _g, n_rej, done = carry
        return (i < max_iters) & ~done

    def body(carry):
        state, i, n_good, n_rej, done = carry
        state, accept, c_before, c_after = lm_step(state)
        rel = (c_before - c_after) / jnp.maximum(c_before, 1e-12)
        n_rej = jnp.where(accept, 0, n_rej + 1)
        done = (n_rej >= 3) | (accept & (rel < 1e-7))
        return (state, i + 1, n_good + accept.astype(jnp.int32), n_rej, done)

    nodes0 = Sim3(R=problem.nodes.R.astype(jnp.float32),
                  t=problem.nodes.t.astype(jnp.float32),
                  s=problem.nodes.s.astype(jnp.float32))
    c0 = cost_of(nodes0)
    (nodes, _lam), _i, n_good, _r, _d = jax.lax.while_loop(
        cond, body,
        ((nodes0, jnp.float32(init_lambda)), jnp.int32(0), jnp.int32(0),
         jnp.int32(0), jnp.asarray(False)))
    return nodes, c0, cost_of(nodes), n_good


def sequential_edges(nodes: Sim3) -> tuple:
    """Odometry chain measurements M_{i+1,i} = S_{i+1} ∘ S_i^{-1} from the
    CURRENT node estimates (the standard pose-graph construction: local
    odometry is trusted, the loop edge redistributes the accumulated error).
    Returns (edge_i, edge_j, meas) with edge_i = k+1, edge_j = k."""
    K = nodes.s.shape[0]
    i = jnp.arange(1, K, dtype=jnp.int32)
    j = jnp.arange(0, K - 1, dtype=jnp.int32)
    Si = jax.tree.map(lambda a: a[i], nodes)
    Sj = jax.tree.map(lambda a: a[j], nodes)
    meas = sim3.compose(Si, sim3.inverse(Sj))
    return i, j, meas
