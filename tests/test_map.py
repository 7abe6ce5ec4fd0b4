"""Map / MapPoint / landmark-fusion tests.

Ports the reference test semantics (tests/test_landmark_utils.py:46-143)
onto the array-backed map, including the mean-merge fusion contract, and
adds snapshot-export coverage for the TPU path.
"""
import numpy as np
import pytest

from simpleslam_tpu.core.map import Map, MapPoint, canon_desc, MAX_OBS_DESC


def test_add_points_ids_and_arrays():
    m = Map()
    pts = np.array([[0.0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]])
    cols = np.full((4, 3), 0.7, np.float32)
    ids = m.add_points(pts, cols, keyframe_idx=0)
    assert ids == [0, 1, 2, 3]
    assert len(m) == 4
    np.testing.assert_allclose(m.get_point_array(), pts)
    np.testing.assert_allclose(m.get_color_array(), cols)
    assert m.point_ids() == [0, 1, 2, 3]
    ids2 = m.add_points(pts + 10)
    assert ids2 == [4, 5, 6, 7]
    np.testing.assert_allclose(m.get_color_array()[4:], np.ones((4, 3)))


def test_add_points_validates_shape():
    m = Map()
    with pytest.raises(ValueError):
        m.add_points(np.zeros((3,)))


def test_add_pose_and_keyframe_indices():
    m = Map()
    m.add_pose(np.eye(4), is_keyframe=True)
    T = np.eye(4); T[2, 3] = 1.0
    m.add_pose(T, is_keyframe=False)
    m.add_pose(T, is_keyframe=True)
    assert len(m.poses) == 3
    assert m.keyframe_indices == [0, 2]
    with pytest.raises(AssertionError):
        m.add_pose(np.eye(3), is_keyframe=False)


def test_mappoint_view_and_observations():
    m = Map()
    (pid,) = m.add_points(np.array([[1.0, 2, 3]]), keyframe_idx=5)
    p = m.points[pid]
    assert isinstance(p, MapPoint)
    np.testing.assert_allclose(p.position, [1, 2, 3])
    assert p.keyframe_idx == 5
    # float descriptor -> L2-normalized on store
    d = np.arange(4, dtype=np.float32)
    p.add_observation(0, 7, d)
    kf, kp, desc = p.observations[0]
    assert (kf, kp) == (0, 7)
    np.testing.assert_allclose(np.linalg.norm(desc), 1.0, atol=1e-6)
    # uint8 (binary) kept raw
    p.add_observation(1, 9, np.array([3, 200], np.uint8))
    assert p.observations[1][2].dtype == np.uint8
    # position writes go to the backing array
    p.position = np.array([9.0, 9, 9])
    np.testing.assert_allclose(m.get_point_array()[0], [9, 9, 9])


def test_canon_desc():
    assert canon_desc(np.array([1, 2], np.uint8)).dtype == np.uint8
    f = canon_desc(np.array([3.0, 4.0]))
    np.testing.assert_allclose(f, [0.6, 0.8], atol=1e-6)


def test_fuse_closeby_duplicate_landmarks():
    # two points within 5cm merge to their mean; far points untouched
    m = Map()
    m.add_points(np.array([
        [0.00, 0, 0],
        [0.04, 0, 0],       # within 5cm of point 0
        [1.00, 0, 0],
        [5.00, 5, 5],
    ]))
    m.fuse_closeby_duplicate_landmarks(radius=0.05)
    assert len(m) == 3
    pts = m.get_point_array()
    np.testing.assert_allclose(pts[0], [0.02, 0, 0], atol=1e-12)  # mean-merge
    assert 1 not in m.points  # second of the pair removed
    assert 2 in m.points and 3 in m.points


def test_fuse_chain_greedy_order():
    # chain 0-1-2 each 4cm apart: pair (0,1) merges first (sorted order),
    # then (1,2) is skipped because 1 was removed -> 2 survives
    m = Map()
    m.add_points(np.array([[0.0, 0, 0], [0.04, 0, 0], [0.08, 0, 0]]))
    m.fuse_closeby_duplicate_landmarks(radius=0.05)
    assert sorted(m.point_ids()) == [0, 2]
    np.testing.assert_allclose(m.points[0].position, [0.02, 0, 0], atol=1e-12)
    np.testing.assert_allclose(m.points[2].position, [0.08, 0, 0], atol=1e-12)


def test_fuse_noop_small_maps():
    m = Map()
    m.fuse_closeby_duplicate_landmarks(0.1)
    m.add_points(np.array([[0.0, 0, 0]]))
    m.fuse_closeby_duplicate_landmarks(0.1)
    assert len(m) == 1


def test_fuse_many_random_consistency():
    # grid-hash pair search must agree with brute force
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(300, 3))
    from simpleslam_tpu.core.map import _pairs_within_radius
    r = 0.15
    got = _pairs_within_radius(pts, r)
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    ii, jj = np.nonzero(np.triu(d < r, k=1))
    want = sorted(zip(ii.tolist(), jj.tolist()))
    assert got == want


def test_snapshot_export():
    m = Map()
    ids = m.add_points(np.array([[1.0, 0, 0], [0, 2.0, 0]]),
                       np.array([[1, 0, 0], [0, 1, 0]], np.float32), keyframe_idx=0)
    d = np.ones(8, np.float32)
    m.points[ids[0]].add_observation(0, 3, d)
    for k in range(8):   # overflow the ring buffer
        m.points[ids[1]].add_observation(0, k, np.full(8, k, np.float32))
    snap = m.snapshot(capacity=16, desc_dim=8)
    assert snap["positions"].shape == (16, 3)
    assert snap["alive"][:2].all() and not snap["alive"][2:].any()
    assert snap["pid"][0] == ids[0] and snap["pid"][2] == -1
    assert snap["n_desc"][0] == 1
    assert snap["n_desc"][1] == MAX_OBS_DESC  # clamped to ring size
    np.testing.assert_allclose(
        snap["desc"][0, 0], d / np.linalg.norm(d), atol=1e-6)
    with pytest.raises(ValueError):
        m.snapshot(capacity=1, desc_dim=8)


def test_archive_point_roundtrip():
    """archive_point moves a live landmark (position, observations,
    creation KF) into ``archived`` and out of every live view — the
    host-side retention path fused sync_to_host uses when device
    compaction evicts observed landmarks (loop closure across long gaps
    reads 3D-3D pairs from the archive)."""
    m = Map()
    ids = m.add_points(np.array([[1.0, 2, 3], [4.0, 5, 6]]), keyframe_idx=2)
    d = np.ones(8, np.float32)
    m.points[ids[0]].add_observation(2, 11, d)
    m.points[ids[0]].add_observation(3, 17, d)

    m.archive_point(ids[0])
    assert len(m) == 1
    assert m.point_ids() == [ids[1]]
    assert ids[0] not in m.points
    pos, obs, ckf = m.archived[ids[0]]
    np.testing.assert_allclose(pos, [1, 2, 3])
    # descriptors are dropped on archive (ADVICE r4): loop closure only
    # consumes (kf_idx, kp_idx) pairs + the position
    assert obs == [(2, 11), (3, 17)]
    assert ckf == 2
    # unknown pid is a no-op (idempotent under repeated syncs)
    m.archive_point(999)
    assert len(m.archived) == 1


def test_archive_cap_prunes_oldest():
    """The archive is bounded: past ``archive_cap`` the oldest-created 10%
    are pruned (VERDICT r4 item 7 — Map.archived must not grow without
    bound on long soaks)."""
    m = Map()
    m.archive_cap = 20
    ids = m.add_points(np.random.default_rng(0).normal(size=(30, 3)))
    for i, pid in enumerate(ids):
        m._created_kf[m._row[pid]] = i          # distinct creation order
        m.archive_point(pid)
    assert len(m.archived) <= 20
    # survivors are the newest creations
    kept_ckf = sorted(ckf for (_p, _o, ckf) in m.archived.values())
    assert kept_ckf[0] > 0 and kept_ckf[-1] == 29
