"""Mesh construction helpers.

The throughput design (SURVEY.md §2): data parallelism over frame *pairs*
for extraction/matching rides the 'dp' axis; tensor parallelism over the
matcher's hidden dimension rides 'tp'. Collectives stay on ICI; the host only
feeds frames (DCN/dataloader side).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int = 0, tp: Optional[int] = None,
              axis_names: Tuple[str, str] = ("dp", "tp")) -> Mesh:
    """Build a (dp, tp) mesh over the first ``n_devices`` devices.

    tp defaults to 2 when the device count is even and > 1, else 1 —
    callers can force tp=1 for pure data parallelism.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"make_mesh: asked for {n} devices but only {len(devs)} are "
            f"visible on platform '{devs[0].platform}'. For a virtual mesh, "
            f"start the process with JAX_PLATFORMS=cpu and XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n} (plus "
            f"jax.config.update('jax_platforms','cpu') on this machine), or "
            f"use __graft_entry__.dryrun_multichip which bootstraps one.")
    devs = devs[:n]
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    dp = n // tp
    arr = np.asarray(devs[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names)
