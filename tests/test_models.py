"""Learned front-end tests: ALIKED extraction, LightGlue matching, and the
self-supervised training step (loss decreases; matching improves).

Mirrors the reference's split-vs-monolithic equivalence test idea
(tests/test_lightglue_vs_manual.py) at the facade level.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpleslam_tpu.core.types import Features
from simpleslam_tpu.models import aliked as aliked_mod
from simpleslam_tpu.models import lightglue as lg_mod
from simpleslam_tpu.models import train as train_mod


@pytest.fixture(scope="module")
def aliked_small():
    model, params = aliked_mod.init_aliked(jax.random.PRNGKey(0), desc_dim=64,
                                           image_hw=(64, 64))
    return model, params


def test_aliked_extract_shapes_and_masks(aliked_small):
    model, params = aliked_small
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (2, 64, 96, 1)).astype(np.float32))
    feats = aliked_mod.extract_batch(model, params, img, max_kp=128)
    assert feats.kpts.shape == (2, 128, 2)
    assert feats.desc.shape == (2, 128, 64)
    v = np.asarray(feats.valid)
    assert v.sum() > 0
    kp = np.asarray(feats.kpts)
    # border respected, descriptors unit-norm where valid
    assert (kp[v][:, 0] >= 7.0).all() and (kp[v][:, 0] <= 89.0).all()
    norms = np.linalg.norm(np.asarray(feats.desc)[v], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # scores sorted descending
    sc = np.asarray(feats.scores[0])[v[0]]
    assert (np.diff(sc) <= 1e-5).all()


def test_aliked_deterministic(aliked_small):
    model, params = aliked_small
    img = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 1)),
                      jnp.float32)
    f1 = aliked_mod.extract_batch(model, params, img, max_kp=64)
    f2 = aliked_mod.extract_batch(model, params, img, max_kp=64)
    np.testing.assert_array_equal(np.asarray(f1.kpts), np.asarray(f2.kpts))


def test_preprocess_image_pads():
    img = np.zeros((37, 61, 3), np.uint8)
    out = aliked_mod.preprocess_image(img)
    assert out.shape == (40, 64, 1)
    assert float(out.max()) <= 1.0


def test_matches_from_assignment_gating():
    P = np.zeros((4, 4), np.float32)
    P[0, 1] = 0.9   # mutual, confident
    P[1, 0] = 0.4   # mutual, below conf
    P[2, 3] = 0.8
    P[3, 3] = 0.85  # row 3 also wants col 3 -> row 2 loses mutuality
    m = lg_mod.matches_from_assignment(jnp.asarray(P), min_conf=0.7)
    v = np.asarray(m.valid)
    pairs = set(zip(np.asarray(m.idx0)[v].tolist(),
                    np.asarray(m.idx1)[v].tolist()))
    assert (0, 1) in pairs
    assert (1, 0) not in pairs        # below confidence
    assert (2, 3) not in pairs        # lost mutual check
    assert (3, 3) in pairs


def test_lightglue_masking_and_determinism():
    model, params = lg_mod.init_lightglue(jax.random.PRNGKey(0), desc_dim=16,
                                          n_kp=32, dim=64, n_layers=2)
    rng = np.random.default_rng(2)
    kp = jnp.asarray(rng.uniform(0, 64, (1, 32, 2)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(1, 32, 16)), jnp.float32)
    valid = jnp.arange(32) < 20
    P, s0, s1 = model.apply(params, kp, d, valid[None], kp, d, valid[None],
                            (64, 64))
    P = np.asarray(P[0])
    # padded rows/cols contribute zero probability
    assert np.abs(P[20:, :]).max() == 0.0
    assert np.abs(P[:, 20:]).max() == 0.0
    P2, _, _ = model.apply(params, kp, d, valid[None], kp, d, valid[None],
                           (64, 64))
    np.testing.assert_array_equal(P, np.asarray(P2[0]))


def test_train_step_reduces_loss_and_improves_matching():
    key = jax.random.PRNGKey(0)
    a_model, l_model, tx, state = train_mod.make_train_state(
        key, lr=3e-4, desc_dim=32, n_kp=24, dim=64, n_layers=2,
        image_hw=(48, 48))
    step = train_mod.make_train_step(a_model, l_model, tx, (48, 48))
    bkey = jax.random.PRNGKey(42)
    batch = train_mod.synthetic_pair_batch(bkey, B=2, H=48, W=48, G=24)

    _, m0 = step(state, batch)
    losses = [float(m0["total"])]
    for i in range(30):
        batch_i = train_mod.synthetic_pair_batch(
            jax.random.fold_in(bkey, i), B=2, H=48, W=48, G=24)
        state, metrics = step(state, batch_i)
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0] * 0.9, losses[::6]

    # matching accuracy on a fresh batch improves over random params
    test_batch = train_mod.synthetic_pair_batch(
        jax.random.PRNGKey(99), B=1, H=48, W=48, G=24)
    P, _, _ = l_model.apply(
        state.params["lightglue"], test_batch["pts0"],
        jax.vmap(train_mod._sample_many)(
            a_model.apply(state.params["aliked"], test_batch["img0"])[1],
            test_batch["pts0"]),
        test_batch["pt_valid"], test_batch["pts1"],
        jax.vmap(train_mod._sample_many)(
            a_model.apply(state.params["aliked"], test_batch["img1"])[1],
            test_batch["pts1"]),
        test_batch["pt_valid"], (48, 48))
    pv = np.asarray(test_batch["pt_valid"][0])
    correct = (np.argmax(np.asarray(P[0]), axis=1) == np.arange(24))[pv].mean()
    assert correct > 0.3  # far above the 1/24 chance level


def test_learned_pipeline_facade():
    """Facade path: aliked detector + lightglue matcher through frontend."""
    from simpleslam_tpu.config import SLAMConfig
    from simpleslam_tpu.core import frontend

    cfg = SLAMConfig(use_lightglue=True, max_features=128, min_conf=0.0)
    det, mat = frontend.init_feature_pipeline(cfg)
    assert det.learned and mat.learned
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (64, 96), np.uint8)
    f0 = frontend.feature_extractor(cfg, img, det)
    f1 = frontend.feature_extractor(cfg, img, det)
    assert int(np.asarray(f0.valid).sum()) > 0
    m = frontend.feature_matcher(cfg, f0, f1, mat)
    # identical inputs through identical weights -> some mutual matches and
    # every match maps a keypoint to itself
    v = np.asarray(m.valid)
    if v.sum():
        np.testing.assert_array_equal(np.asarray(m.idx0)[v],
                                      np.asarray(m.idx1)[v])
