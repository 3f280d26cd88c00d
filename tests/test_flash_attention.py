"""Pallas fused-attention kernel vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.ops.attention import dot_product_attention
from rcdms_tpu.ops.flash import flash_attention


@pytest.mark.parametrize("shape", [
    # (batch..., heads, seq_q, seq_kv, head_dim)
    ((2,), 2, 256, 256, 64),     # aligned self-attention
    ((1,), 4, 256, 91, 40),      # cross-attention, unaligned kv + head_dim
    ((2, 5), 2, 300, 300, 80),   # unaligned q, leading (b, f) dims
])
def test_flash_matches_xla(shape):
    lead, h, sq, skv, d = shape
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, lead + (h, sq, d), jnp.float32)
    k = jax.random.normal(kk, lead + (h, skv, d), jnp.float32)
    v = jax.random.normal(kv, lead + (h, skv, d), jnp.float32)
    scale = d ** -0.5
    ref = dot_product_attention(q, k, v, scale=scale, impl="xla")
    out = flash_attention(q, k, v, scale=scale, q_block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_bf16():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (2, 256, 64), jnp.bfloat16)
    ref = dot_product_attention(q, q, q, scale=0.125, impl="xla")
    out = flash_attention(q, q, q, scale=0.125, q_block=128, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)
