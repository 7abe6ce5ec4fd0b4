"""Learned front-end wiring: ALIKED extraction + LightGlue matching behind
the frontend facade (reference: features_utils.py's lightglue code path).

Weights: seeded random by default (no network access on this machine); set
``SLAM_ALIKED_WEIGHTS`` / ``SLAM_LIGHTGLUE_WEIGHTS`` to torch checkpoint paths
or orbax directories to load real ones.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from simpleslam_tpu.core.types import Features, Matches
from simpleslam_tpu.models import aliked as aliked_mod
from simpleslam_tpu.models import lightglue as lg_mod

DESC_DIM = 128

# repo-local checkpoint written by models/train_frontend.py;
# SLAM_FRONTEND_CKPT overrides the directory (orbax tree with
# {"aliked": ..., "lightglue": ...})
_CKPT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "checkpoints",
    "learned_frontend")
_CKPT_CACHE = [False, None]


def _abstract_checkpoint_target():
    """ShapeDtypeStruct tree of the PINNED pipeline topology (must match
    models/train_frontend.py: desc_dim 128, dim 256, heads 4, 9 layers).
    Restoring against this target makes a stale/incompatible checkpoint fail
    loudly at load time instead of silently via orbax's untyped restore."""
    from simpleslam_tpu.models import train as train_mod

    def mk():
        _a, _l, params = train_mod.make_models(
            jax.random.PRNGKey(0), desc_dim=DESC_DIM, n_kp=64, dim=256,
            n_layers=9, image_hw=(64, 64))
        return params

    return jax.eval_shape(mk)


def _load_repo_checkpoint(on_error: str = "warn"):
    """Load (and memoize) the trained front-end checkpoint if present,
    restored against the pinned-topology abstract target (no orbax UNSAFE
    untyped restore). ``on_error='raise'`` surfaces incompatibilities."""
    if _CKPT_CACHE[0]:
        return _CKPT_CACHE[1]
    _CKPT_CACHE[0] = True
    ckpt_dir = os.environ.get("SLAM_FRONTEND_CKPT", _CKPT_DIR)
    if os.path.isdir(ckpt_dir):
        try:
            import orbax.checkpoint as ocp

            _CKPT_CACHE[1] = ocp.StandardCheckpointer().restore(
                os.path.abspath(ckpt_dir), _abstract_checkpoint_target())
        except Exception as e:
            _CKPT_CACHE[0] = False
            _CKPT_CACHE[1] = None
            if on_error == "raise":
                raise
            import warnings

            warnings.warn(f"learned-frontend checkpoint at {ckpt_dir} "
                          f"failed to restore ({e}); using random weights")
    return _CKPT_CACHE[1]


def _graft_matching(params, loaded):
    """Copy checkpoint leaves whose paths + shapes match the live tree
    (tolerates architecture deltas between training and inference configs)."""
    import jax

    flat_live = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_new = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    out = []
    n_hit = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        cand = flat_new.get(path)
        if cand is not None and tuple(cand.shape) == tuple(leaf.shape):
            out.append(jax.numpy.asarray(cand, leaf.dtype))
            n_hit += 1
        else:
            out.append(leaf)
    tree = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(tree, out)


class LearnedExtractor:
    """ALIKED bundle satisfying the frontend Detector protocol."""

    def __init__(self, max_kp: int, seed: int = 0, desc_dim: int = DESC_DIM):
        self.name = "aliked"
        self.max_kp = max_kp
        self.learned = True
        self.desc_dim = desc_dim
        self.model, self.params = aliked_mod.init_aliked(
            jax.random.PRNGKey(seed), desc_dim=desc_dim)
        ckpt = os.environ.get("SLAM_ALIKED_WEIGHTS")
        if ckpt and os.path.exists(ckpt):
            self.params = aliked_mod.load_torch_aliked(ckpt, self.params)
        else:
            loaded = _load_repo_checkpoint()
            if loaded is not None and "aliked" in loaded:
                self.params = _graft_matching(self.params, loaded["aliked"])
        self.image_hw: Optional[Tuple[int, int]] = None

    def fn(self, gray: jax.Array) -> Features:
        """(H, W) float gray [0..255] -> padded Features."""
        return self.fn_p(self.params, gray)

    def fn_p(self, params, gray: jax.Array) -> Features:
        """Parametric twin of :meth:`fn`: weights passed as a pytree
        argument instead of a closure constant. Jitted consumers that trace
        the whole pipeline (core/fused.build_fused_step) use this so the
        weights become jit ARGUMENTS — closed-over params are baked into
        the HLO as literals, duplicated per call site and lax.cond branch
        (measured: a 724 MB fused-step binary, ~300 s to ship through the
        device tunnel at every process start)."""
        img = aliked_mod.preprocess_image(gray)
        self.image_hw = gray.shape[:2]
        feats = aliked_mod.extract_batch(self.model, params,
                                         img[None], self.max_kp)
        return jax.tree.map(lambda x: x[0], feats)

    def extract_batch(self, images: jax.Array) -> Features:
        """(B, H, W, 1) float [0,1] -> batched Features (throughput mode)."""
        return aliked_mod.extract_batch(self.model, self.params, images,
                                        self.max_kp)


class LearnedMatcher:
    """LightGlue bundle satisfying the frontend Matcher protocol."""

    def __init__(self, extractor: LearnedExtractor, min_conf: float = 0.7,
                 seed: int = 1, n_layers: int = 9):
        self.name = "lightglue"
        self.learned = True
        self.min_conf = float(min_conf)
        self.extractor = extractor
        self.model, self.params = lg_mod.init_lightglue(
            jax.random.PRNGKey(seed), desc_dim=extractor.desc_dim,
            n_kp=min(extractor.max_kp, 64), n_layers=n_layers)
        ckpt = os.environ.get("SLAM_LIGHTGLUE_WEIGHTS")
        if ckpt and os.path.exists(ckpt):
            self.params = lg_mod.load_torch_lightglue(ckpt, self.params)
        else:
            loaded = _load_repo_checkpoint()
            if loaded is not None and "lightglue" in loaded:
                self.params = _graft_matching(self.params, loaded["lightglue"])

    def fn(self, feats0: Features, feats1: Features) -> Matches:
        return self.fn_p(self.params, feats0, feats1)

    def fn_p(self, params, feats0: Features, feats1: Features) -> Matches:
        """Parametric twin of :meth:`fn` (see LearnedExtractor.fn_p)."""
        hw = self.extractor.image_hw or (480, 640)
        return lg_mod.match_pair(self.model, params, feats0, feats1,
                                 (int(hw[0]), int(hw[1])), self.min_conf)


def build_learned_extractor(args, n_pad: int) -> LearnedExtractor:
    return LearnedExtractor(max_kp=n_pad, seed=int(getattr(args, "seed", 0)))


def build_learned_matcher(args, extractor: LearnedExtractor) -> LearnedMatcher:
    return LearnedMatcher(extractor,
                          min_conf=float(getattr(args, "min_conf", 0.7)),
                          seed=int(getattr(args, "seed", 0)) + 1)
