"""Sharded batched extraction + matching over a device mesh.

The offline/throughput mode (SURVEY.md §2): a batch of frame pairs is
sharded over the 'dp' mesh axis; each shard runs the jitted
ALIKED-extract + LightGlue-match program locally; results gather back as
sharded pytrees. XLA inserts any cross-device collectives (none are needed
for pure dp; tp-sharded matcher weights add all-reduces over ICI).

All entry points dispatch through MODULE-LEVEL jitted functions keyed on
static (model, shape) args — a per-call ``@jax.jit`` closure would be a new
function object every call and re-trace each time (measured 0.6 frames/s
instead of >100 on the tunneled TPU).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simpleslam_tpu.core.types import Features, Matches
from simpleslam_tpu.models import aliked as aliked_mod
from simpleslam_tpu.models import lightglue as lg_mod


@partial(jax.jit, static_argnames=("a_model", "max_kp"))
def _extract(a_model, a_params, images, max_kp):
    return aliked_mod.extract_batch(a_model, a_params, images, max_kp)


@partial(jax.jit, static_argnames=("l_model", "image_hw", "min_conf"))
def _match(l_model, l_params, f0, f1, image_hw, min_conf):
    return lg_mod.match_batch(l_model, l_params, f0, f1, image_hw, min_conf)


@partial(jax.jit, static_argnames=("a_model", "l_model", "max_kp",
                                   "image_hw", "min_conf"))
def _extract_and_match(a_model, a_params, l_model, l_params, im0, im1,
                       max_kp, image_hw, min_conf):
    f0 = aliked_mod.extract_batch(a_model, a_params, im0, max_kp)
    f1 = aliked_mod.extract_batch(a_model, a_params, im1, max_kp)
    m = lg_mod.match_batch(l_model, l_params, f0, f1, image_hw, min_conf)
    return f0, f1, m


def sharded_extract(a_model, a_params, images: jax.Array, mesh: Mesh, *,
                    max_kp: int):
    """Batched ALIKED extraction, batch sharded over the 'dp' mesh axis.

    images: (B, H, W, 1) float32 in [0, 1]; B divisible by dp. Returns
    Features with a leading batch axis (sharded; device_get to gather).
    """
    bspec = NamedSharding(mesh, P("dp"))
    images = jax.device_put(images, bspec)
    return _extract(a_model, a_params, images, max_kp)


def sharded_extract_classical(det_fn, grays: jax.Array, mesh: Mesh):
    """Batched classical extraction (ORB/SIFT/AKAZE detector fn vmapped),
    batch sharded over 'dp'. grays: (B, H, W) float32; B divisible by dp."""
    bspec = NamedSharding(mesh, P("dp"))
    grays = jax.device_put(jax.numpy.asarray(grays, jax.numpy.float32), bspec)
    return jax.jit(jax.vmap(det_fn))(grays)


def sharded_match(l_model, l_params, f0: Features, f1: Features, mesh: Mesh,
                  *, image_hw: Tuple[int, int], min_conf: float = 0.7):
    """Batched LightGlue matching of already-extracted feature batches,
    sharded over 'dp'."""
    bspec = NamedSharding(mesh, P("dp"))
    f0 = jax.device_put(f0, bspec)
    f1 = jax.device_put(f1, bspec)
    return _match(l_model, l_params, f0, f1, image_hw, min_conf)


def sharded_extract_and_match(a_model, a_params, l_model, l_params,
                              images0: jax.Array, images1: jax.Array,
                              mesh: Mesh, *, max_kp: int,
                              image_hw: Tuple[int, int],
                              min_conf: float = 0.7):
    """(B, H, W, 1) image pair batches -> (Features, Features, Matches),
    batch sharded over the mesh's 'dp' axis.

    B must be divisible by the dp axis size.
    """
    bspec = NamedSharding(mesh, P("dp"))
    images0 = jax.device_put(images0, bspec)
    images1 = jax.device_put(images1, bspec)
    return _extract_and_match(a_model, a_params, l_model, l_params,
                              images0, images1, max_kp, image_hw, min_conf)
