"""Legacy driver tests (E/H tracker + KLT tracker) on the synthetic corridor."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from simpleslam_tpu.config import SLAMConfig
from simpleslam_tpu.data import Sequence
from simpleslam_tpu.legacy.run_ef import EFTracker, median_parallax_deg
from simpleslam_tpu.legacy.run_klt import KLTTracker
from simpleslam_tpu.core import frontend
from simpleslam_tpu.tools.synth import generate_kitti_sequence

import jax.numpy as jnp


@pytest.fixture(scope="module")
def corridor(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("legacy"))
    generate_kitti_sequence(base, n_frames=8, seed=5, hw=(160, 360),
                            speed=0.5)
    return base


def test_median_parallax_pure_rotation_zero():
    K = jnp.asarray(np.array([[500.0, 0, 180], [0, 500.0, 80], [0, 0, 1]]),
                    jnp.float32)
    from simpleslam_tpu.ops import se3
    R = se3.so3_exp(jnp.array([0.0, 0.05, 0.0]))
    # points transformed by pure rotation: p1 = proj(R K^-1 p0)
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(rng.uniform(50, 300, (40, 2)), jnp.float32)
    Kn = np.asarray(K)
    u0 = np.concatenate([np.asarray(p0), np.ones((40, 1))], 1) @ np.linalg.inv(Kn).T
    u1 = u0 @ np.asarray(R).T
    p1 = (u1 / u1[:, 2:3]) @ Kn.T
    par = median_parallax_deg(K, p0, jnp.asarray(p1[:, :2], jnp.float32), R,
                              jnp.ones(40, bool))
    assert par < 0.05


def test_ef_tracker_low_parallax_forward_is_rotation_only(corridor):
    """Reference heuristic quirk: forward motion on a far scene has median
    parallax <= 1.2 deg, so the legacy tracker takes rotation-only updates
    (main.py:421-435) — preserved behavior."""
    cfg = SLAMConfig(dataset="kitti", base_dir=corridor, max_features=512,
                     headless=True)
    seq = Sequence.load(cfg)
    tr = EFTracker(cfg, seq.K)
    prev = frontend.feature_extractor(cfg, seq.frame(0), tr.detector)
    for i in range(1, 5):
        feats = frontend.feature_extractor(cfg, seq.frame(i), tr.detector)
        tr.step(i, prev, feats)
        prev = feats
    assert len(tr.world_map.poses) == 5
    assert tr.n_rot_only + tr.n_full >= 3 and tr.n_deadreckon == 0


def _features_from_points(p, desc):
    from simpleslam_tpu.core.types import Features
    return Features.from_arrays(p, desc, n_pad=256)


def test_ef_tracker_lateral_motion_full_update():
    """High-parallax lateral motion must take the full R+t branch with the
    unit-t x last-baseline scaling (main.py:437-459)."""
    rng = np.random.default_rng(0)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1.0]])
    X = np.stack([rng.uniform(-2, 2, 150), rng.uniform(-1.5, 1.5, 150),
                  rng.uniform(4, 7, 150)], 1)
    t = np.array([0.5, 0.0, 0.0])       # strafe right: parallax ~5 deg
    p0 = X @ K.T; p0 = (p0[:, :2] / p0[:, 2:3]).astype(np.float32)
    X1 = X + -t                          # camera +x <=> points -x in cam
    p1 = X1 @ K.T; p1 = (p1[:, :2] / p1[:, 2:3]).astype(np.float32)
    desc = rng.normal(size=(150, 16)).astype(np.float32)
    f0 = _features_from_points(p0 + rng.normal(0, 0.2, p0.shape), desc)
    f1 = _features_from_points(p1 + rng.normal(0, 0.2, p1.shape), desc)

    cfg = SLAMConfig(headless=True)
    tr = EFTracker(cfg, K)
    tr.step(1, f0, f1)
    assert tr.n_full == 1 and tr.n_rot_only == 0
    T = tr.world_map.poses[-1]
    # unit translation along ~+x in T_cw means t ~ (-1, 0, 0)
    assert abs(np.linalg.norm(T[:3, 3]) - 1.0) < 0.05   # last_baseline = 1.0
    assert T[0, 3] < -0.9


def test_klt_tracker_tracks_and_reseeds(corridor):
    cfg = SLAMConfig(dataset="kitti", base_dir=corridor, max_features=384,
                     headless=True)
    seq = Sequence.load(cfg)
    tr = KLTTracker(cfg, seq.K, min_tracks=120)
    tr.seed(seq.frame(0))
    n0 = len(tr.pts)
    assert n0 > 100
    prev = seq.frame(0)
    for i in range(1, 5):
        cur = seq.frame(i)
        tr.step(prev, cur)
        prev = cur
    assert len(tr.world_map.poses) == 5
    assert tr.n_full + tr.n_rot_only >= 3
    overlay = tr.overlay(prev)
    assert overlay.shape[2] == 3
    # trails grew for surviving tracks
    lens = [len(v) for v in tr.trails.values()]
    assert max(lens) >= 3
