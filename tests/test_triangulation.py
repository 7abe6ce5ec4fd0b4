"""Triangulation tests incl. the resurrected multi-view API.

Rebuilds the contracts from the reference's stale tests
(tests/test_multi_view_utils.py, tests/test_multi_view_triangulation-minimal.py):
N-view DLT <5 cm RMS @0.4 px noise over 5 views, sub-mm noise-free, the
MultiViewTriangulator keyframe pipeline, and the 2-view gates used by
triangulation_utils.py.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from simpleslam_tpu.core.map import Map
from simpleslam_tpu.ops import se3
from simpleslam_tpu.ops.triangulation import (
    MultiViewTriangulator, multi_view_triangulation, parallax_deg_world,
    projection_matrix, triangulate_two_view, two_view_gates)

K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])


def _project(K, T_cw, X):
    Xc = X @ T_cw[:3, :3].T + T_cw[:3, 3]
    uv = Xc @ K.T
    return uv[:, :2] / uv[:, 2:3], Xc[:, 2]


def test_triangulate_two_view_exact():
    rng = np.random.default_rng(0)
    X = np.stack([rng.uniform(-2, 2, 50), rng.uniform(-2, 2, 50),
                  rng.uniform(4, 10, 50)], 1)
    T0 = np.eye(4)
    T1 = np.asarray(se3.rt_to_T(se3.so3_exp(jnp.array([0.01, 0.03, 0.0])),
                                jnp.array([-0.6, 0.0, 0.05])))
    uv0, _ = _project(K, T0, X)
    uv1, _ = _project(K, T1, X)
    P0 = projection_matrix(jnp.asarray(K, jnp.float32), jnp.asarray(T0, jnp.float32))
    P1 = projection_matrix(jnp.asarray(K, jnp.float32), jnp.asarray(T1, jnp.float32))
    Xe = np.asarray(triangulate_two_view(P0, P1, jnp.asarray(uv0, jnp.float32),
                                         jnp.asarray(uv1, jnp.float32)))
    assert np.abs(Xe - X).max() < 2e-2
    assert np.median(np.linalg.norm(Xe - X, axis=1)) < 5e-3


def test_parallax_rotation_only_is_zero():
    X = jnp.array([[0.0, 0.0, 5.0]])
    T0 = jnp.eye(4)
    # pure rotation: same camera center
    T1 = se3.rt_to_T(se3.so3_exp(jnp.array([0.0, 0.3, 0.0])), jnp.zeros(3))
    par = float(parallax_deg_world(X, T0, T1)[0])
    assert par < 1e-4


def test_two_view_gates():
    rng = np.random.default_rng(1)
    X = np.array([
        [0.0, 0.0, 6.0],    # good
        [0.0, 0.0, 0.2],    # too close (min_depth)
        [0.0, 0.0, 150.0],  # too far
        [0.0, 0.0, -5.0],   # behind
    ])
    T0 = np.eye(4)
    T1 = np.eye(4); T1[0, 3] = -0.5   # camera at +0.5x
    uv0, _ = _project(K, T0, X)
    uv1, _ = _project(K, T1, X)
    keep, why = two_view_gates(
        jnp.asarray(X, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.asarray(T0, jnp.float32), jnp.asarray(T1, jnp.float32),
        jnp.asarray(uv0, jnp.float32), jnp.asarray(uv1, jnp.float32),
        min_depth=0.4, max_depth=100.0, min_parallax_deg=2.0, max_reproj_px=2.0)
    keep = np.asarray(keep)
    assert keep[0]
    assert not keep[1] and not keep[2] and not keep[3]
    # reprojection gate: corrupt one pixel
    uv1c = uv1.copy(); uv1c[0] += 5.0
    keep2, _ = two_view_gates(
        jnp.asarray(X, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.asarray(T0, jnp.float32), jnp.asarray(T1, jnp.float32),
        jnp.asarray(uv0, jnp.float32), jnp.asarray(uv1c, jnp.float32),
        min_depth=0.4, max_depth=100.0, min_parallax_deg=2.0, max_reproj_px=2.0)
    assert not np.asarray(keep2)[0]


# ---------------- resurrected multi-view API contract ----------------------

def _pose_wc(tx=0.0, ty=0.0, tz=0.0):
    T = np.eye(4)
    T[:3, 3] = [tx, ty, tz]
    return T


def test_multi_view_noise_free_submm():
    Kl = np.array([[500.0, 0, 320], [0, 500.0, 320], [0, 0, 1]])
    poses = [_pose_wc(0, 0, 0), _pose_wc(1, 0, 0), _pose_wc(0, 1, 0)]
    X_gt = np.array([2.0, 1.5, 8.0])
    uvs = []
    for T in poses:
        pc = (np.linalg.inv(T) @ np.append(X_gt, 1))[:3]
        uvs.append((Kl @ pc)[:2] / pc[2])
    X = multi_view_triangulation(Kl, poses, np.float32(uvs),
                                 min_depth=0.5, max_depth=50.0, max_rep_err=0.5)
    assert X is not None
    assert np.allclose(X, X_gt, atol=1e-3)


def test_multi_view_gates_return_none():
    Kl = K
    poses = [_pose_wc(0, 0, 0), _pose_wc(1, 0, 0)]
    X_gt = np.array([0.0, 0.0, 8.0])
    uvs = []
    for T in poses:
        pc = (np.linalg.inv(T) @ np.append(X_gt, 1))[:3]
        uvs.append((Kl @ pc)[:2] / pc[2])
    # depth window excludes the point
    assert multi_view_triangulation(Kl, poses, np.float32(uvs),
                                    min_depth=10.0, max_depth=50.0,
                                    max_rep_err=2.0) is None
    # corrupt a pixel -> reprojection gate fires
    uvs2 = [uvs[0] + 30.0, uvs[1]]
    assert multi_view_triangulation(Kl, poses, np.float32(uvs2),
                                    min_depth=0.5, max_depth=50.0,
                                    max_rep_err=1.0) is None
    # single view -> None
    assert multi_view_triangulation(Kl, poses[:1], np.float32(uvs[:1])) is None


def test_multi_view_noisy_rms():
    rng = np.random.default_rng(42)
    Kl = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
    poses = [_pose_wc(t) for t in np.linspace(0, 1, 5)]
    pts = np.stack([rng.uniform(-1, 1, 40), rng.uniform(-1, 1, 40),
                    rng.uniform(4, 6, 40)], 1)
    errs = []
    for X_gt in pts:
        uvs = []
        for T in poses:
            pc = (np.linalg.inv(T) @ np.append(X_gt, 1))[:3]
            uv = (Kl @ pc)[:2] / pc[2] + rng.normal(0, 0.4, 2)
            uvs.append(uv)
        X = multi_view_triangulation(Kl, poses, np.float32(uvs),
                                     min_depth=0.1, max_depth=10.0,
                                     max_rep_err=2.0)
        assert X is not None
        errs.append(np.linalg.norm(X - X_gt))
    rms = float(np.sqrt(np.mean(np.square(errs))))
    assert rms < 5e-2, rms


@pytest.mark.parametrize("min_views", [2, 3])
def test_multiview_triangulator_pipeline(min_views):
    rng = np.random.default_rng(7)
    Kl = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
    poses = [_pose_wc(t) for t in np.linspace(0, 1, 5)]
    pts = np.stack([rng.uniform(-1, 1, 30), rng.uniform(-1, 1, 30),
                    rng.uniform(4, 6, 30)], 1)

    tri = MultiViewTriangulator(Kl, min_views=min_views, merge_radius=0.01,
                                max_rep_err=2.0, min_depth=0.1, max_depth=10.0)
    world_map = Map()
    img = np.zeros((480, 640, 3), np.uint8)
    for f, T in enumerate(poses):
        Pcw = np.linalg.inv(T)
        kps, track_map, descs = [], {}, []
        for j, X in enumerate(pts):
            pc = Pcw[:3, :3] @ X + Pcw[:3, 3]
            uv = (Kl @ pc)[:2] / pc[2] + rng.normal(0, 0.3, 2)
            kps.append(uv)
            track_map[j] = j
            descs.append(np.zeros(32, np.uint8))
        tri.add_keyframe(f, T, kps, track_map, img, descs)

    new_ids = tri.triangulate_ready_tracks(world_map)
    assert len(new_ids) == len(pts)
    errs = [np.linalg.norm(world_map.points[pid].position - pts[pid])
            for pid in new_ids]
    assert float(np.sqrt(np.mean(np.square(errs)))) < 5e-2
    # observations registered for every view
    assert len(world_map.points[new_ids[0]].observations) == 5
    # second call: tracks already done -> no duplicates
    assert tri.triangulate_ready_tracks(world_map) == []
