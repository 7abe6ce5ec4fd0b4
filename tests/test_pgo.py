"""Sim(3) pose-graph optimization (ops/pgo.py).

Synthetic loop-closure fixtures in the reference's test style (analytically
known geometry + controlled noise, reference: tests/test_ba_utils_T_c_w.py):
a circular keyframe trajectory with noisy/scale-drifting odometry and one
true loop edge — PGO must redistribute the accumulated error."""
import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.ops import pgo, se3, sim3


def _circle_gt(K=24, radius=10.0):
    """K camera-from-world SE3 poses on a circle, heading tangentially."""
    out = []
    for k in range(K):
        a = 2 * np.pi * k / K
        C = np.array([radius * np.sin(a), 0.0, radius * (1 - np.cos(a))])
        yaw = a
        Rwc = np.array([[np.cos(yaw), 0, np.sin(yaw)],
                        [0, 1, 0],
                        [-np.sin(yaw), 0, np.cos(yaw)]])
        T_wc = np.eye(4)
        T_wc[:3, :3] = Rwc
        T_wc[:3, 3] = C
        out.append(np.linalg.inv(T_wc))
    return np.stack(out)


def _centers(nodes: sim3.Sim3) -> np.ndarray:
    """World camera centers of Sim3 cam-from-world nodes: -R^T t / s."""
    R = np.asarray(nodes.R)
    t = np.asarray(nodes.t)
    s = np.asarray(nodes.s)
    return -np.einsum("kji,kj->ki", R, t) / s[:, None]


def _drifted_problem(K=24, rot_noise=0.01, trans_noise=0.03,
                     scale_drift=1.01, seed=0, loop_weight=4.0):
    """Chain noisy odometry into drifted nodes; edges = noisy odometry
    (consistent with the nodes) + ONE true loop edge last->first."""
    rng = np.random.default_rng(seed)
    T_gt = _circle_gt(K)
    S_gt = [sim3.Sim3(R=jnp.asarray(T[:3, :3], jnp.float32),
                      t=jnp.asarray(T[:3, 3], jnp.float32),
                      s=jnp.asarray(1.0, jnp.float32)) for T in T_gt]

    # noisy odometry measurements with multiplicative scale drift
    meas_chain = []
    for k in range(K - 1):
        M = sim3.compose(S_gt[k + 1], sim3.inverse(S_gt[k]))
        eps = np.concatenate([
            rng.normal(0, trans_noise, 3),
            rng.normal(0, rot_noise, 3),
            [np.log(scale_drift)]]).astype(np.float32)
        meas_chain.append(sim3.compose(sim3.exp(jnp.asarray(eps)), M))

    # integrate the chain -> drifted initial nodes (node 0 = GT)
    nodes = [S_gt[0]]
    for k in range(K - 1):
        nodes.append(sim3.compose(meas_chain[k], nodes[k]))

    # loop edge: true relative Sim3 between last and first
    M_loop = sim3.compose(S_gt[K - 1], sim3.inverse(S_gt[0]))

    def stack(sims):
        return sim3.Sim3(R=jnp.stack([s.R for s in sims]),
                         t=jnp.stack([s.t for s in sims]),
                         s=jnp.stack([s.s for s in sims]))

    E = K  # K-1 chain edges + 1 loop edge
    edge_i = jnp.asarray(list(range(1, K)) + [K - 1], jnp.int32)
    edge_j = jnp.asarray(list(range(0, K - 1)) + [0], jnp.int32)
    meas = stack(meas_chain + [M_loop])
    w = jnp.asarray([1.0] * (K - 1) + [loop_weight], jnp.float32)
    prob = pgo.PGOProblem(
        nodes=stack(nodes), edge_i=edge_i, edge_j=edge_j, meas=meas,
        e_valid=jnp.ones(E, bool), e_weight=w,
        node_free=jnp.ones(K, bool).at[0].set(False))
    return prob, T_gt, stack(nodes)


def test_pgo_closes_the_loop():
    prob, T_gt, nodes0 = _drifted_problem()
    nodes, c0, c1, n_good = pgo.pgo_solve(prob, huber=10.0, max_iters=30)
    assert float(c1) < 0.05 * float(c0)
    assert int(n_good) >= 3

    gt_centers = np.stack([-T[:3, :3].T @ T[:3, 3] for T in T_gt])
    err_before = np.linalg.norm(_centers(nodes0) - gt_centers, axis=1)
    err_after = np.linalg.norm(_centers(nodes) - gt_centers, axis=1)
    # drift accumulates to meters before PGO; collapses to cm after
    assert err_before.max() > 1.0
    assert err_after.max() < 0.25 * err_before.max()
    # scale drift (1.01^23 ~ 1.26) is corrected
    s = np.asarray(nodes.s)
    assert abs(s[-1] - 1.0) < 0.1


def test_pgo_scale_only_drift():
    # pure scale drift, no rot/trans noise: Sim3 PGO must fix what an SE3
    # PGO cannot even express
    prob, T_gt, nodes0 = _drifted_problem(rot_noise=0.0, trans_noise=0.0,
                                          scale_drift=1.03)
    s0 = np.asarray(nodes0.s)
    assert s0[-1] > 1.5                      # 1.03^23 ~ 2.0 accumulated
    nodes, c0, c1, _ = pgo.pgo_solve(prob, huber=10.0, max_iters=30)
    s = np.asarray(nodes.s)
    assert abs(s[-1] - 1.0) < 0.05
    gt_centers = np.stack([-T[:3, :3].T @ T[:3, 3] for T in T_gt])
    err_after = np.linalg.norm(_centers(nodes) - gt_centers, axis=1)
    assert err_after.max() < 0.5


def test_pgo_respects_gauge_and_padding():
    prob, _T_gt, _n0 = _drifted_problem(K=16)
    # pad edges with garbage-but-invalid entries; results must not change
    E = prob.edge_i.shape[0]
    pad = 8
    meas_pad = sim3.Sim3(
        R=jnp.concatenate([prob.meas.R,
                           jnp.tile(jnp.eye(3)[None], (pad, 1, 1))]),
        t=jnp.concatenate([prob.meas.t, jnp.full((pad, 3), 1e3)]),
        s=jnp.concatenate([prob.meas.s, jnp.full((pad,), 7.0)]))
    prob_pad = prob._replace(
        edge_i=jnp.concatenate([prob.edge_i, jnp.zeros(pad, jnp.int32)]),
        edge_j=jnp.concatenate([prob.edge_j, jnp.zeros(pad, jnp.int32)]),
        meas=meas_pad,
        e_valid=jnp.concatenate([prob.e_valid, jnp.zeros(pad, bool)]),
        e_weight=jnp.concatenate([prob.e_weight, jnp.ones(pad)]))
    n_a, _c0a, c1a, _ = pgo.pgo_solve(prob, huber=10.0, max_iters=15)
    n_b, _c0b, c1b, _ = pgo.pgo_solve(prob_pad, huber=10.0, max_iters=15)
    np.testing.assert_allclose(np.asarray(n_a.t), np.asarray(n_b.t),
                               atol=1e-4)
    np.testing.assert_allclose(float(c1a), float(c1b), rtol=1e-4, atol=1e-6)
    # gauge node 0 never moves
    np.testing.assert_allclose(np.asarray(n_a.R[0]),
                               np.asarray(prob.nodes.R[0]), atol=1e-6)
    np.testing.assert_allclose(float(n_a.s[0]), 1.0, atol=1e-6)
