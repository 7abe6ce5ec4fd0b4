"""Two-view bootstrap tests: H-vs-F model competition on synthetic scenes
(reference: two_view_bootstrap.py:39-418)."""
import numpy as np
import jax
import jax.numpy as jnp

from simpleslam_tpu.config import SLAMConfig
from simpleslam_tpu.core.bootstrap import (
    InitParams, TwoViewModel, bootstrap_two_view_map,
    evaluate_two_view_bootstrap_with_masks)
from simpleslam_tpu.core.map import Map
from simpleslam_tpu.core.types import Features, Matches
from simpleslam_tpu.ops import se3

K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])


def _scene(rng, n=200, planar=False, rot=(0.01, -0.02, 0.005),
           trans=(0.6, 0.05, 0.1), noise=0.3):
    if planar:
        X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                      6.0 + 0.2 * rng.uniform(-3, 3, n) * 0], 1)
        X[:, 2] = 6.0
    else:
        X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                      rng.uniform(4, 12, n)], 1)
    R = np.asarray(se3.so3_exp(jnp.asarray(rot, jnp.float32)))
    t = np.asarray(trans)
    p0 = X @ K.T; p0 = p0[:, :2] / p0[:, 2:3]
    X1 = X @ R.T + t
    p1 = X1 @ K.T; p1 = p1[:, :2] / p1[:, 2:3]
    p0 = p0 + rng.normal(scale=noise, size=p0.shape)
    p1 = p1 + rng.normal(scale=noise, size=p1.shape)
    return p0.astype(np.float32), p1.astype(np.float32), R, t, X


def test_general_scene_selects_fundamental():
    rng = np.random.default_rng(0)
    p0, p1, R, t, X = _scene(rng)
    dec = evaluate_two_view_bootstrap_with_masks(K, p0, p1, InitParams(
        min_parallax_deg=0.5))
    assert dec is not None
    assert dec.pose.model is TwoViewModel.FUNDAMENTAL
    dR = dec.pose.R @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0
    assert dec.inlier_mask.sum() > 120
    assert dec.pose.posdepth >= 0.95


def test_planar_scene_selects_homography():
    rng = np.random.default_rng(1)
    p0, p1, R, t, X = _scene(rng, planar=True, noise=0.2)
    dec = evaluate_two_view_bootstrap_with_masks(K, p0, p1, InitParams(
        min_parallax_deg=0.5))
    assert dec is not None
    assert dec.pose.model is TwoViewModel.HOMOGRAPHY
    dR = dec.pose.R @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 2.0


def test_pure_rotation_rejected():
    # no translation -> no parallax -> must reject (both H and F paths)
    rng = np.random.default_rng(2)
    p0, p1, *_ = _scene(rng, trans=(0.0, 0.0, 0.0), noise=0.2)
    dec = evaluate_two_view_bootstrap_with_masks(
        K, p0, p1, InitParams(min_parallax_deg=1.5))
    assert dec is None


def test_too_few_points_rejected():
    rng = np.random.default_rng(3)
    p0, p1, *_ = _scene(rng, n=30)
    dec = evaluate_two_view_bootstrap_with_masks(
        K, p0, p1, InitParams(min_pts_for_tests=60, min_parallax_deg=0.5))
    assert dec is None


def test_bootstrap_two_view_map_end_to_end():
    rng = np.random.default_rng(4)
    n = 200
    p0, p1, R, t, X = _scene(rng, n=n)
    desc = rng.normal(size=(n, 16)).astype(np.float32)
    feats0 = Features.from_arrays(p0, desc, n_pad=256)
    feats1 = Features.from_arrays(p1, desc, n_pad=256)
    matches = Matches.from_arrays(np.arange(n), np.arange(n), m_pad=256)

    cfg = SLAMConfig(min_depth=0.4, max_depth=100.0)
    world_map = Map()
    okb, T0, T1 = bootstrap_two_view_map(
        K, feats0, feats1, matches, cfg, world_map,
        InitParams(min_parallax_deg=0.5))
    assert okb
    np.testing.assert_allclose(T0, np.eye(4))
    dR = T1[:3, :3] @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0
    # map was seeded with >= 80 grey landmarks carrying 2 observations each
    assert len(world_map) >= 80
    pid = world_map.point_ids()[0]
    p = world_map.points[pid]
    np.testing.assert_allclose(p.colour, [0.7, 0.7, 0.7], atol=1e-6)
    obs = p.observations
    assert len(obs) == 2 and obs[0][0] == 0 and obs[1][0] == 1
    # triangulated structure should roughly match GT (unit-|t| scale ~= GT
    # since |t| ~= 0.61); compare up to that scale via median depth ratio
    pts = world_map.get_point_array()
    scale = np.median(pts[:, 2]) / np.median(X[:, 2])
    assert 0.8 < scale / (1.0 / np.linalg.norm(t)) < 1.2


def test_bootstrap_not_enough_matches():
    cfg = SLAMConfig()
    feats = Features.empty(64, 16)
    matches = Matches.from_arrays(np.arange(20), np.arange(20), m_pad=64)
    ok, T0, T1 = bootstrap_two_view_map(K, feats, feats, matches, cfg, Map())
    assert not ok and T0 is None
