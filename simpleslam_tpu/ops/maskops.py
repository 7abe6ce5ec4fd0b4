"""Masked statistics over padded arrays (static-shape replacements for
numpy reductions over ragged inlier sets)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Median of x[mask] without dynamic shapes (0.0 when mask is empty)."""
    n = jnp.sum(mask.astype(jnp.int32))
    s = jnp.sort(jnp.where(mask, x, jnp.inf))
    k = jnp.maximum(n, 1)
    lo = s[jnp.maximum((k - 1) // 2, 0)]
    hi = s[jnp.maximum(k // 2, 0)]
    return jnp.where(n > 0, 0.5 * (lo + hi), 0.0)


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    n = jnp.maximum(jnp.sum(mask.astype(x.dtype)), 1.0)
    return jnp.sum(jnp.where(mask, x, 0.0)) / n


def masked_fraction(cond: jax.Array, mask: jax.Array) -> jax.Array:
    """Fraction of masked entries satisfying cond (0.0 when mask empty)."""
    n = jnp.sum(mask.astype(jnp.float32))
    c = jnp.sum((cond & mask).astype(jnp.float32))
    return jnp.where(n > 0, c / jnp.maximum(n, 1.0), 0.0)
