"""Pallas fused-attention kernel: equivalence vs the XLA path (interpret
mode on CPU; the compiled kernel runs on real TPU in bench)."""
import numpy as np
import jax
import jax.numpy as jnp

from simpleslam_tpu.ops.pallas.attention import (pallas_masked_attention,
                                                 xla_masked_attention)


def test_pallas_attention_matches_xla_interpret():
    rng = np.random.default_rng(0)
    BH, N, d = 4, 256, 64
    q = jnp.asarray(rng.normal(size=(BH, N, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(BH, N, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(BH, N, d)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(BH, N)) > 0.3)

    want = np.asarray(xla_masked_attention(q, k, v, mask))
    got = np.asarray(pallas_masked_attention(q, k, v, mask, block_q=128,
                                             interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_attention_fully_masked_rows_finite():
    # every key masked: softmax over -1e9 row must stay finite
    BH, N, d = 1, 128, 64
    q = jnp.ones((BH, N, d))
    k = jnp.ones((BH, N, d))
    v = jnp.ones((BH, N, d))
    mask = jnp.zeros((BH, N), bool)
    out = pallas_masked_attention(q, k, v, mask, block_q=128, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
