"""Sharded batched extraction + matching over a device mesh.

The offline/throughput mode (SURVEY.md §2): a batch of frame pairs is
sharded over the 'dp' mesh axis; each shard runs the jitted
ALIKED-extract + LightGlue-match program locally; results gather back as
sharded pytrees. XLA inserts any cross-device collectives (none are needed
for pure dp; tp-sharded matcher weights add all-reduces over ICI).
"""
from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simpleslam_tpu.core.types import Features, Matches
from simpleslam_tpu.models import aliked as aliked_mod
from simpleslam_tpu.models import lightglue as lg_mod


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

    @jax.jit
    def run(params_a, params_l, im0, im1):
        f0 = aliked_mod.extract_batch(a_model, params_a, im0, max_kp)
        f1 = aliked_mod.extract_batch(a_model, params_a, im1, max_kp)
        m = lg_mod.match_batch(l_model, params_l, f0, f1, image_hw, min_conf)
        return f0, f1, m

    return run(a_params, l_params, images0, images1)
