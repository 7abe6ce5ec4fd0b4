"""Auxiliary subsystems: checkpoint/resume, profiling, BA debug viz."""
import numpy as np
import pytest

from simpleslam_tpu.config import SLAMConfig
from simpleslam_tpu.core.keyframe import Keyframe
from simpleslam_tpu.core.map import Map
from simpleslam_tpu.core.types import Features
from simpleslam_tpu.utils.profiling import StageTimer
from simpleslam_tpu.utils.serialize import load_state, save_state
from simpleslam_tpu.viz.visualize_ba import (collect_kf_residuals,
                                             visualize_ba_window)


def _make_state():
    rng = np.random.default_rng(0)
    m = Map()
    m.add_pose(np.eye(4), True)
    T1 = np.eye(4); T1[0, 3] = -1.0
    m.add_pose(T1, False)
    m.add_pose(T1, True)
    ids = m.add_points(rng.normal(size=(20, 3)) + [0, 0, 6],
                       rng.uniform(0, 1, (20, 3)).astype(np.float32),
                       keyframe_idx=0)
    feats = Features.from_arrays(rng.uniform(0, 100, (32, 2)),
                                 rng.normal(size=(32, 8)).astype(np.float32),
                                 n_pad=64)
    kfs = [Keyframe(0, 0, "a.png", feats, np.eye(4), b"\x5a\x03\x00\x00\x00" + b"xxx"),
           Keyframe(1, 2, "", feats, T1, b"")]
    for j, pid in enumerate(ids[:10]):
        m.points[pid].add_observation(0, j, np.arange(8, dtype=np.float32))
        m.points[pid].add_observation(1, j + 1, np.arange(8, dtype=np.float32))
    return m, kfs


def test_save_load_state_roundtrip(tmp_path):
    m, kfs = _make_state()
    cfg = SLAMConfig(dataset="kitti", max_features=512)
    path = str(tmp_path / "state.npz")
    save_state(path, m, kfs, cfg=cfg, frame_ids=[0, 1, 2])

    m2, kfs2, cfg2, fids = load_state(path)
    assert len(m2) == len(m)
    np.testing.assert_allclose(m2.get_point_array(), m.get_point_array())
    np.testing.assert_allclose(m2.get_color_array(), m.get_color_array())
    assert len(m2.poses) == 3 and m2.keyframe_indices == [0, 2]
    assert fids == [0, 1, 2]
    assert cfg2["max_features"] == 512
    # observations survived (count + normalized desc)
    pid0 = m2.point_ids()[0]
    obs = m2.points[pid0].observations
    assert len(obs) == 2 and obs[0][0] == 0 and obs[1][0] == 1
    # keyframes
    assert len(kfs2) == 2
    assert kfs2[0].path == "a.png" and kfs2[1].frame_idx == 2
    np.testing.assert_allclose(np.asarray(kfs2[1].pose), np.asarray(kfs[1].pose))
    np.testing.assert_allclose(np.asarray(kfs2[0].feats.kpts),
                               np.asarray(kfs[0].feats.kpts))


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    rep = t.report()
    assert "a" in rep and "calls" in rep


def test_ba_viz_residuals_and_overlay():
    m, kfs = _make_state()
    K = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    poses_before = {1: np.eye(4)}
    res = collect_kf_residuals(m, K, kfs[1], poses_before)
    assert res is not None
    meas, before, after = res
    assert meas.shape == before.shape == after.shape
    # before uses the stored pre-BA pose, after the keyframe's current pose
    assert not np.allclose(before, after)
    out = visualize_ba_window(m, K, kfs, [0, 1], poses_before)
    assert 1 in out and out[1].ndim == 3
