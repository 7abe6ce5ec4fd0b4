"""Fused device-resident tracking loop vs the host-orchestrated driver.

The fused program (core/fused.py) must reproduce the host state machine's
behavior (same thresholds, same trigger order) with everything on device.
This exercises the whole loop on a synthetic corridor and checks the two
modes agree on trajectory quality and map growth.
"""
import numpy as np
import pytest

from simpleslam_tpu.config import parse_config
from simpleslam_tpu.run_slam import run
from simpleslam_tpu.tools.synth import generate_kitti_sequence


@pytest.fixture(scope="module")
def corridor(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("fused_seq"))
    generate_kitti_sequence(base, n_frames=16, seed=3, hw=(180, 410),
                            speed=0.5, yaw_rate_deg=0.3)
    return base


def _cfg(base, fused, *extra):
    argv = ["--dataset", "kitti", "--base_dir", base, "--headless",
            "--no_viz3d", "--max_features", "512", "--map_capacity", "2048",
            *extra]
    if fused:
        argv.append("--fused")
    return parse_config(argv)


def test_fused_matches_host(corridor, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    res_host = run(_cfg(corridor, fused=False))
    res_fused = run(_cfg(corridor, fused=True))

    assert res_fused.ate is not None and res_host.ate is not None
    # both complete the corridor; quality parity within noise
    assert res_host.ate < 1.0
    assert res_fused.ate < 1.0
    assert abs(res_fused.ate - res_host.ate) < 0.5
    assert res_fused.n_keyframes == res_host.n_keyframes
    assert res_fused.tracking_lost_count == 0
    # map growth in the same ballpark (RANSAC seeds differ between modes)
    assert res_fused.n_landmarks > 0.5 * res_host.n_landmarks
    # one pose logged per frame
    assert len(res_fused.poses_cw) == res_fused.n_frames


def test_eviction_sustains_long_run(tmp_path_factory, tmp_path, monkeypatch):
    """Fixed-capacity device map + on-device eviction: a sequence whose
    cumulative triangulation volume exceeds map_capacity must keep tracking
    (stale landmarks compacted away, survivors shifted in creation order)."""
    base = str(tmp_path_factory.mktemp("evict_seq"))
    generate_kitti_sequence(base, n_frames=30, seed=5, hw=(180, 410),
                            speed=0.6, yaw_rate_deg=0.4)
    monkeypatch.chdir(tmp_path)
    cfg = parse_config(["--dataset", "kitti", "--base_dir", base,
                        "--headless", "--no_viz3d", "--max_features", "512",
                        "--map_capacity", "1024", "--map_evict_age", "8",
                        "--fused"])
    res = run(cfg)
    assert res.map_compactions > 0          # eviction actually fired
    assert res.n_landmarks <= 1024
    # survival assertions: a 1024-point store for a sequence that would
    # naturally triangulate ~3x that is a STRESS config — tracking must
    # persist with bounded drift, not match the full-capacity ATE
    assert res.ate is not None and res.ate < 3.0
    assert res.tracking_lost_count <= res.n_frames // 3
    assert len(res.poses_cw) == res.n_frames


def test_tri_kf2_grows_map(corridor, tmp_path, monkeypatch):
    """--tri_kf2 triangulates each new KF against the last TWO keyframes:
    the doubled baseline must add landmarks the single-pair pass rejects on
    parallax, in both the host and the fused drivers, without hurting ATE."""
    monkeypatch.chdir(tmp_path)
    res1 = run(_cfg(corridor, True))
    res2 = run(_cfg(corridor, True, "--tri_kf2"))
    assert res2.ate is not None and res2.ate < 1.0
    assert res2.n_landmarks > res1.n_landmarks
    res2h = run(_cfg(corridor, False, "--tri_kf2"))
    assert res2h.ate is not None and res2h.ate < 1.0
    assert res2h.tracking_lost_count == 0
