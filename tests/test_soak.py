"""Long-sequence soak (CPU-scale slice of VERDICT round-2 item 3): the fused
device loop over 300 frames — 10x the round-2 longest CPU run — with a map
capacity the sequence overflows many times. Asserts bounded drift, zero
capacity crashes, and a pose for every frame. The TPU-scale (>= 1000-frame,
full-resolution) soak runs via ``tools/diagnose e2e --frames 1200 --yaw 0``
and is recorded in BASELINE.md."""
import numpy as np
import pytest

from simpleslam_tpu.config import parse_config
from simpleslam_tpu.run_slam import run
from simpleslam_tpu.tools.synth import generate_kitti_sequence


def test_fused_soak_300_frames(tmp_path_factory, tmp_path, monkeypatch):
    base = str(tmp_path_factory.mktemp("soak_seq"))
    # straight-line path: the corridor walls run along z, so yaw must be 0
    # for a 150 m run (any constant yaw curves into a wall: lateral drift
    # ~ L^2/2R reaches the 10 m wall at ~0.05 deg/frame already)
    generate_kitti_sequence(base, n_frames=300, seed=11, hw=(180, 410),
                            speed=0.5, yaw_rate_deg=0.0)
    monkeypatch.chdir(tmp_path)
    cfg = parse_config(["--dataset", "kitti", "--base_dir", base,
                        "--headless", "--no_viz3d", "--max_features", "512",
                        "--map_capacity", "2048", "--map_evict_age", "40",
                        "--tri_kf2", "--fused"])
    res = run(cfg)
    # every frame produced a pose; the log ring never wrapped/corrupted
    assert len(res.poses_cw) == 300
    assert res.frame_ids == list(range(300))
    # eviction fired repeatedly and the store stayed bounded
    assert res.map_compactions >= 5
    assert res.n_landmarks <= 2048
    # tracking persisted: dead-reckoned frames are the exception
    # (measured 20/300 at these settings)
    assert res.tracking_lost_count < 40
    # bounded drift: the classical low-res monocular front-end accumulates
    # scale drift without loop closure (the reference has none either);
    # measured ~14 m Sim3-ATE over the ~150 m path -> bound at 12% of path.
    # The learned full-scale pipeline's long-run drift is tracked on TPU
    # (BASELINE.md long-run row), not here.
    assert res.ate is not None and res.ate < 0.12 * 150
