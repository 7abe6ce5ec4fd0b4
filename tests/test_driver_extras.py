"""Round-2 driver surface: save/resume, viz windows, track trails.

Covers VERDICT round-1 items 6 (driver viz parity) and 9 (state
serialization exposed on the CLI with resume continuity).
"""
import os

import numpy as np
import pytest

from simpleslam_tpu.config import parse_config
from simpleslam_tpu.run_slam import run
from simpleslam_tpu.tools.synth import generate_kitti_sequence


def _gen(base, n):
    generate_kitti_sequence(base, n_frames=n, seed=3, hw=(180, 410),
                            speed=0.5, yaw_rate_deg=0.3)


def _cfg(base, *extra):
    return parse_config(["--dataset", "kitti", "--base_dir", base,
                         "--headless", "--no_viz3d", "--max_features", "512",
                         "--map_capacity", "2048", *extra])


def test_save_then_resume_continues(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    short = str(tmp_path / "short")
    full = str(tmp_path / "full")
    _gen(short, 10)
    _gen(full, 16)     # same seed => frames 0-9 identical to `short`

    state = str(tmp_path / "state.npz")
    res_a = run(_cfg(short, "--save_state", state))
    assert os.path.exists(state)
    n_poses_a = len(res_a.poses_cw)

    res_b = run(_cfg(full, "--resume", state))
    # resumed run continues from frame 10 and processes the remaining frames
    assert len(res_b.poses_cw) > n_poses_a
    assert res_b.frame_ids[-1] == 15
    assert res_b.ate is not None and res_b.ate < 2.0

    # against an uninterrupted full run: same trajectory length, close ATE
    res_c = run(_cfg(full))
    assert len(res_b.poses_cw) == len(res_c.poses_cw)
    assert abs(res_b.ate - res_c.ate) < 0.5


def test_viz_windows_build(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from simpleslam_tpu.core.keyframe import Keyframe, make_thumb
    from simpleslam_tpu.core.types import Features
    from simpleslam_tpu.viz.windows import (TrackBook, build_kf_strip,
                                            build_match_overlay)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (90, 160, 3), dtype=np.uint8)
    feats = Features.from_arrays(rng.uniform(0, 80, (16, 2)),
                                 rng.integers(0, 255, (16, 32)).astype(np.uint8))
    kfs = [Keyframe(i, i * 3, "", feats, np.eye(4),
                    make_thumb(img, (64, 36))) for i in range(3)]
    strip = build_kf_strip(kfs, height=60)
    assert strip is not None and strip.shape[0] == 60
    assert strip.shape[1] > 100    # three tiles side by side

    overlay = build_match_overlay(
        img, img, np.asarray(feats.kpts), np.asarray(feats.kpts),
        np.arange(16), np.arange(16), np.ones(16, bool))
    assert overlay is not None
    assert overlay.shape == (90, 320, 3)

    tb = TrackBook(max_len=4)
    kp = np.asarray(feats.kpts)
    idx = np.arange(16)
    v = np.ones(16, bool)
    tb.advance(kp, kp + 1.0, idx, idx, v)
    tb.advance(kp + 1.0, kp + 2.0, idx, idx, v)
    assert len(tb.tracks) == 16
    assert all(len(p) >= 2 for p in tb.tracks.values())


def test_show_driver_windows_headless(monkeypatch, tmp_path):
    """The window renderer runs with cv2.imshow monkeypatched (the smoke
    test VERDICT item 6 asks for)."""
    cv2 = pytest.importorskip("cv2")
    shown = []
    monkeypatch.setattr(cv2, "imshow", lambda name, img: shown.append(name))
    monkeypatch.setattr(cv2, "waitKey", lambda *_: -1)

    from simpleslam_tpu.core.keyframe import Keyframe, make_thumb
    from simpleslam_tpu.core.types import Features
    from simpleslam_tpu.run_slam import SLAMSystem, _show_driver_windows
    from simpleslam_tpu.viz.windows import TrackBook

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (90, 160, 3), dtype=np.uint8)
    feats = Features.from_arrays(rng.uniform(0, 80, (8, 2)),
                                 rng.integers(0, 255, (8, 32)).astype(np.uint8))
    cfg = parse_config(["--dataset", "kitti", "--base_dir", "x"])
    K = np.array([[100.0, 0, 80], [0, 100.0, 45], [0, 0, 1]])
    system = SLAMSystem(cfg, K, None, img_hw=(90, 160))
    system.kfs = [Keyframe(0, 0, "", feats, np.eye(4),
                           make_thumb(img, (64, 36)))]
    kp = np.asarray(feats.kpts)
    idx = np.arange(8)
    system._last_matches = (img, img, kp, kp, idx, idx, np.ones(8, bool))
    system._trackbook = TrackBook()
    system._trackbook.advance(kp, kp, idx, idx, np.ones(8, bool))

    _show_driver_windows(system)
    assert "keyframes" in shown
    assert "matches prev->cur" in shown
    assert "tracks" in shown
