"""Matmul-precision control for geometry code.

On TPU, float32 matmuls default to reduced (bfloat16-ish) MXU precision —
~1e-3 relative error. That is fine for the neural front-end (which we run in
bfloat16 deliberately) but catastrophic for multi-view geometry: projections,
DLT triangulation, PnP refinement and bundle adjustment all need sub-pixel
(<1e-5 relative) accuracy for RANSAC gating and LM convergence.

Every public geometry op in ``simpleslam_tpu.ops`` is wrapped with
:func:`highest_precision` so its dot/einsum/conv primitives run in full
float32 on the MXU (3-pass bf16 / native f32 depending on generation). The
3x3 / Nx3 matmuls involved are tiny, so the cost is negligible relative to
the NN workload.
"""
from __future__ import annotations

import functools

import jax

HIGHEST = jax.lax.Precision.HIGHEST


def highest_precision(fn):
    """Decorator: trace ``fn`` under full-f32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
