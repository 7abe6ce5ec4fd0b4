"""Localization-only mode: track against a frozen, previously-built map.

Beyond the reference (which has neither save/resume nor relocalization):
map a synthetic sequence once (--save_state), then re-run the same sequence
with --resume + --localize_only. The map must come out untouched, the first
pose must come from kidnapped-robot global relocalization, and the tracked
trajectory must match ground truth.
"""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from simpleslam_tpu.config import SLAMConfig
from simpleslam_tpu.run_slam import run
from simpleslam_tpu.tools.synth import generate_kitti_sequence
from simpleslam_tpu.utils.serialize import load_state


@pytest.fixture(scope="module")
def mapped_world(tmp_path_factory, request):
    base = str(tmp_path_factory.mktemp("synth_loc"))
    generate_kitti_sequence(base, n_frames=18, seed=7, hw=(180, 410),
                            speed=0.5, yaw_rate_deg=0.3)
    state = os.path.join(base, "state.npz")
    cfg = SLAMConfig(dataset="kitti", base_dir=base, max_features=512,
                     headless=True, no_viz3d=True,
                     kf_min_inliers=40, pnp_min_inliers=15,
                     save_state=state)
    # run() writes trajectory_<dataset>.png into the cwd — keep it out of
    # the checkout (monkeypatch is function-scoped, so chdir by hand)
    cwd = os.getcwd()
    os.chdir(base)
    request.addfinalizer(lambda: os.chdir(cwd))
    res = run(cfg)
    assert res.n_keyframes >= 2 and res.n_landmarks >= 80
    return base, state, res


def test_localize_only_tracks_frozen_map(mapped_world, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    base, state, map_res = mapped_world
    m0, kfs0, _, _ = load_state(state)
    pts0 = {pid: np.array(mp.position) for pid, mp in m0.points.items()}

    cfg = SLAMConfig(dataset="kitti", base_dir=base, max_features=512,
                     headless=True, no_viz3d=True,
                     kf_min_inliers=40, pnp_min_inliers=15,
                     resume=state, localize_only=True)
    res = run(cfg)

    # the map stayed frozen: same keyframes, same landmarks
    assert res.n_keyframes == len(kfs0)
    assert res.n_landmarks == len(pts0)
    assert res.gba_runs == 0
    # localized through (almost) the whole sequence: the first pose comes
    # from global relocalization, then PnP tracking takes over
    assert len(res.poses_cw) >= 12
    assert res.frame_ids[0] <= 2     # relocalized near the sequence start
    # quality: the frozen-map trajectory matches GT about as well as the
    # mapping run did
    assert res.ate is not None and res.ate < max(2.0, 3 * (map_res.ate or 1))
    # lost-frame budget: tracking against a complete map should be easy
    assert res.tracking_lost_count <= 4


def test_localize_only_requires_resume(mapped_world):
    base, _state, _ = mapped_world
    cfg = SLAMConfig(dataset="kitti", base_dir=base, headless=True,
                     no_viz3d=True, localize_only=True)
    with pytest.raises(ValueError, match="resume"):
        run(cfg)


def test_localize_only_rejects_save_state(mapped_world):
    """--localize_only + --save_state would persist a mapping-run KF set
    against a localization-run pose list (inconsistent KF->frame mapping on
    a later --resume) — refused up front."""
    base, state, _ = mapped_world
    cfg = SLAMConfig(dataset="kitti", base_dir=base, headless=True,
                     no_viz3d=True, resume=state, localize_only=True,
                     save_state=os.path.join(base, "bad.npz"))
    with pytest.raises(ValueError, match="save_state"):
        run(cfg)
