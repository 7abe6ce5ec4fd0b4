"""Global relocalization (kidnapped robot; beyond reference).

The reference's only recovery hook is the unimplemented 'trigger
relocalization here in the future' comment (main_revamped.py:501). The host
driver already relocalizes against the LAST keyframe on PnP failure
(tests/test_reloc.py); these tests pin the GLOBAL path: after sustained
loss, place-recognition candidates over ALL keyframes + 2D-3D PnP with the
candidate's own pose as the initial guess.

Fixture: two landmark clusters seen by two distant keyframes (KF0 and KF3)
plus unrelated keyframes in between/after. The "kidnapped" query frame views
KF0's cluster from a slightly offset pose while the most recent keyframe is
far away looking at something else — local last-KF reloc must fail, global
must recover the query pose through KF0.
"""
import numpy as np
import pytest

from simpleslam_tpu.config import parse_config
from simpleslam_tpu.core.frontend import Matcher
from simpleslam_tpu.core.keyframe import Keyframe
from simpleslam_tpu.core.types import Features
from simpleslam_tpu.ops.matching import bf_match
from simpleslam_tpu.run_slam import SLAMSystem

import jax.numpy as jnp

IMG_HW = (480, 640)
K_INTR = np.array([[300.0, 0, 320.0], [0, 300.0, 240.0], [0, 0, 1.0]])
N_LM = 80
N_PAD = 128
N_KF = 6


def _feats(kpts_xy, desc):
    n = kpts_xy.shape[0]
    kp = np.zeros((N_PAD, 2), np.float32)
    dc = np.zeros((N_PAD, desc.shape[1]), np.float32)
    vl = np.zeros((N_PAD,), bool)
    kp[:n], dc[:n], vl[:n] = kpts_xy, desc, True
    return Features(kpts=jnp.asarray(kp), desc=jnp.asarray(dc),
                    scores=jnp.ones((N_PAD,), jnp.float32),
                    valid=jnp.asarray(vl))


def _project(T_cw, X_w):
    Xc = (T_cw[:3, :3] @ X_w.T).T + T_cw[:3, 3]
    uv = (K_INTR @ Xc.T).T
    return (uv[:, :2] / uv[:, 2:3]).astype(np.float32)


def _pose(tx, yaw_deg=0.0):
    c, s = np.cos(np.deg2rad(yaw_deg)), np.sin(np.deg2rad(yaw_deg))
    T = np.eye(4)
    T[:3, :3] = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
    T[0, 3] = tx
    return T


def _rand_desc(rng, n):
    d = rng.normal(size=(n, 64)).astype(np.float32)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def kidnapped_world():
    """(system, T_query, feats_query): a mapped world whose newest KF looks
    away from the kidnap target."""
    rng = np.random.default_rng(11)
    # cluster A in front of KF0 (identity pose)
    X_a = np.column_stack([rng.uniform(-2, 2, N_LM),
                           rng.uniform(-1.5, 1.5, N_LM),
                           rng.uniform(4, 8, N_LM)])
    desc_a = _rand_desc(rng, N_LM)

    cfg = parse_config(["--dataset", "kitti", "--headless", "--no_viz3d",
                        "--max_features", "128"])
    system = SLAMSystem(cfg, K_INTR, None, img_hw=IMG_HW)
    system.matcher = Matcher(name="test-l2nn",
                             fn=lambda f0, f1: bf_match(f0, f1))

    poses = [_pose(0.0)] + [_pose(30.0 + 10.0 * k, yaw_deg=90.0)
                            for k in range(1, N_KF)]
    for k in range(N_KF):
        if k == 0:
            feats = _feats(_project(poses[0], X_a), desc_a)
        else:
            kp = np.column_stack([rng.uniform(0, IMG_HW[1], N_LM),
                                  rng.uniform(0, IMG_HW[0], N_LM)])
            feats = _feats(kp, _rand_desc(rng, N_LM))
        system.kfs.append(Keyframe(idx=k, frame_idx=k, path="", feats=feats,
                                   pose=poses[k].copy(), thumb=b""))
        system.world_map.add_pose(poses[k].copy(), is_keyframe=True)
        system.frame_ids.append(k)
    pids = system.world_map.add_points(X_a, keyframe_idx=0)
    for kp_i, pid in enumerate(pids):
        system.world_map.points[pid].add_observation(0, kp_i, desc_a[kp_i])
    system.initialised = True

    # kidnap target: cluster A viewed from a slightly offset pose
    T_q = _pose(0.4, yaw_deg=3.0)
    feats_q = _feats(_project(T_q, X_a), desc_a)
    return system, T_q, feats_q


def test_local_reloc_fails_after_kidnap(kidnapped_world):
    """Last-KF reloc can't help: the newest keyframe observes nothing."""
    system, T_q, feats_q = kidnapped_world
    n_poses = len(system.world_map.poses)
    assert not system._relocalize(50, feats_q, system.kfs[-1].pose)
    assert len(system.world_map.poses) == n_poses


def test_global_reloc_recovers_pose(kidnapped_world):
    system, T_q, feats_q = kidnapped_world
    n_poses = len(system.world_map.poses)
    ok = system._global_relocalize(51, feats_q)
    assert ok
    assert len(system.world_map.poses) == n_poses + 1
    T_rec = system.world_map.poses[-1]
    # recovered the query pose (not KF0's, which was the PnP init)
    c_rec = -T_rec[:3, :3].T @ T_rec[:3, 3]
    c_q = -T_q[:3, :3].T @ T_q[:3, 3]
    assert np.linalg.norm(c_rec - c_q) < 0.05
    # the motion model is flagged for reset: const-vel across the jump is
    # meaningless
    assert system._vel_reset
    # place vectors were ingested for every keyframe
    assert len(system._place_vecs) == len(system.kfs)


def test_global_reloc_rejects_unseen_place(kidnapped_world):
    """A view of scenery that was never mapped must NOT relocalize (every
    candidate fails the PnP inlier gate)."""
    system, _T_q, _f = kidnapped_world
    rng = np.random.default_rng(99)
    kp = np.column_stack([rng.uniform(0, IMG_HW[1], N_LM),
                          rng.uniform(0, IMG_HW[0], N_LM)])
    feats_alien = _feats(kp, _rand_desc(rng, N_LM))
    n_poses = len(system.world_map.poses)
    assert not system._global_relocalize(52, feats_alien)
    assert len(system.world_map.poses) == n_poses


def _fresh_kidnap_system():
    """Standalone copy of the kidnapped_world construction (the fused test
    donates/mutates device state, so it must not share the module fixture)."""
    rng = np.random.default_rng(11)
    X_a = np.column_stack([rng.uniform(-2, 2, N_LM),
                           rng.uniform(-1.5, 1.5, N_LM),
                           rng.uniform(4, 8, N_LM)])
    desc_a = _rand_desc(rng, N_LM)
    cfg = parse_config(["--dataset", "kitti", "--headless", "--no_viz3d",
                        "--max_features", "128", "--map_capacity", "1024"])
    system = SLAMSystem(cfg, K_INTR, None, img_hw=IMG_HW)
    system.matcher = Matcher(name="test-l2nn",
                             fn=lambda f0, f1: bf_match(f0, f1))
    poses = [_pose(0.0)] + [_pose(30.0 + 10.0 * k, yaw_deg=90.0)
                            for k in range(1, N_KF)]
    feats_all = []
    for k in range(N_KF):
        if k == 0:
            feats = _feats(_project(poses[0], X_a), desc_a)
        else:
            kp = np.column_stack([rng.uniform(0, IMG_HW[1], N_LM),
                                  rng.uniform(0, IMG_HW[0], N_LM)])
            feats = _feats(kp, _rand_desc(rng, N_LM))
        feats_all.append(feats)
        system.kfs.append(Keyframe(idx=k, frame_idx=k, path="", feats=feats,
                                   pose=poses[k].copy(), thumb=b""))
        system.world_map.add_pose(poses[k].copy(), is_keyframe=True)
        system.world_map.keyframe_indices.append(k)
        system.frame_ids.append(k)
    pids = system.world_map.add_points(X_a, keyframe_idx=0)
    for kp_i, pid in enumerate(pids):
        system.world_map.points[pid].add_observation(0, kp_i, desc_a[kp_i])
    system.initialised = True
    system.last_kf_frame_no = N_KF - 1
    T_q = _pose(0.4, yaw_deg=3.0)
    feats_q = _feats(_project(T_q, X_a), desc_a)
    return system, T_q, feats_q, feats_all, rng


def test_fused_global_reloc_recovers_after_streak():
    """Device-resident kidnapped-robot recovery: three unmatchable frames
    build the lost streak, then a frame viewing KF0's (distant, mapped)
    cluster must relocalize through the KF ring's place vectors — one
    fused dispatch per frame, no host involvement."""
    import jax
    from simpleslam_tpu.core.fused import (build_fused_step,
                                           make_fused_config,
                                           state_from_host)

    system, T_q, feats_q, feats_all, rng = _fresh_kidnap_system()
    cfg = system.cfg

    # feature "bank" keyed by the image's constant pixel value: 3 alien
    # frames (unmatchable, build the streak) + the kidnap view of cluster A
    alien = []
    for _ in range(3):
        kp = np.column_stack([rng.uniform(0, IMG_HW[1], N_LM),
                              rng.uniform(0, IMG_HW[0], N_LM)])
        alien.append(_feats(kp, _rand_desc(rng, N_LM)))
    bank = jax.tree.map(lambda *xs: jnp.stack(xs), *(alien + [feats_q]))

    def fake_extract(img):
        i = jnp.clip(jnp.round(img[0, 0]).astype(jnp.int32), 0, 3)
        return jax.tree.map(lambda x: x[i], bank)

    fc = make_fused_config(cfg, IMG_HW, n_kp=N_PAD, desc_dim=64,
                           log_capacity=64)
    assert fc.global_reloc and fc.greloc_after == 3
    step = build_fused_step(fc, system.K, fake_extract,
                            lambda f0, f1: bf_match(f0, f1), None)
    state = state_from_host(system, fc, feats_all[-1])
    assert state.kf_place.shape == (fc.kf_ring,
                                    fc.place_grid ** 2 * 64)

    H, W = IMG_HW
    for i in range(4):
        img = jnp.full((H, W), np.uint8(i), jnp.uint8)
        state = step(state, img)

    flags = np.asarray(state.log_flags)[:4]
    assert flags[:3, 0].sum() == 0          # alien frames: all lost
    assert flags[3, 0] == 1                 # kidnap frame: tracked
    assert int(np.asarray(state.lost_streak)) == 0
    T_rec = np.asarray(state.Tcw, np.float64)
    c_rec = -T_rec[:3, :3].T @ T_rec[:3, 3]
    c_q = -T_q[:3, :3].T @ T_q[:3, 3]
    assert np.linalg.norm(c_rec - c_q) < 0.05
    # motion model was zeroed across the jump
    np.testing.assert_allclose(np.asarray(state.Tcw_prev),
                               np.asarray(state.Tcw), atol=1e-6)


def test_global_reloc_flags():
    cfg = parse_config(["--dataset", "kitti"])
    assert cfg.global_reloc is True and cfg.global_reloc_after == 3
    cfg2 = parse_config(["--dataset", "kitti", "--no_global_reloc",
                         "--global_reloc_after", "7"])
    assert cfg2.global_reloc is False and cfg2.global_reloc_after == 7
