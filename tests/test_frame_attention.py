"""Pallas frame-attention kernel vs the XLA oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.ops.attention import dot_product_attention
from rcdms_tpu.ops.frame_attention import frame_attention


def _oracle(q, k, v, heads):
    """Standard multi-head attention over the frame axis via the XLA path."""
    *lead, f, c = q.shape
    dh = c // heads

    def split(t):
        t = t.reshape(tuple(lead) + (f, heads, dh))
        return jnp.swapaxes(t, -3, -2)

    o = dot_product_attention(split(q), split(k), split(v), scale=dh ** -0.5,
                              impl="xla")
    o = jnp.swapaxes(o, -3, -2)
    return o.reshape(q.shape)


@pytest.mark.parametrize("shape,heads", [
    ((2, 7, 5, 16), 2),      # (b, n, f, c) unaligned everything
    ((1, 130, 5, 320), 8),   # SD level-0 channel count, B not block-aligned
    ((3, 5, 64), 4),         # single leading dim
])
def test_frame_attention_matches_oracle(shape, heads):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    ref = _oracle(q, k, v, heads)
    out = frame_attention(q, k, v, heads, block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_frame_attention_bf16():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (4, 9, 5, 32), jnp.bfloat16)
    ref = _oracle(x, x, x, 4)
    out = frame_attention(x, x, x, 4, block=128, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)
