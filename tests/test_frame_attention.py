"""Pallas frame-attention kernel vs the XLA oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.ops import flash
from rcdms_tpu.ops.attention import dot_product_attention
from rcdms_tpu.ops.frame_attention import frame_attention_bfnc


@pytest.fixture(autouse=True)
def interpret_kernels():
    flash.set_kernel_interpret(True)
    yield
    flash.set_kernel_interpret(False)


def _oracle(q, k, v, heads, c_real):
    """Multi-head attention over the frame axis (axis -3) via the XLA path,
    on (b, f, n, c_pad) inputs with zero pad lanes."""
    dh = c_real // heads

    def split(t):
        t = jnp.swapaxes(t[..., :c_real], -3, -2)  # (b, n, f, c)
        t = t.reshape(t.shape[:-1] + (heads, dh))
        return jnp.swapaxes(t, -3, -2)             # (b, n, h, f, dh)

    o = dot_product_attention(split(q), split(k), split(v), scale=dh ** -0.5,
                              impl="xla")
    o = jnp.swapaxes(o, -3, -2)
    o = o.reshape(o.shape[:-2] + (c_real,))
    o = jnp.swapaxes(o, -3, -2)                    # back to (b, f, n, c)
    return jnp.pad(o, [(0, 0)] * (o.ndim - 1)
                   + [(0, q.shape[-1] - c_real)])


@pytest.mark.parametrize("shape,heads,c_real", [
    ((2, 5, 7, 128), 2, 16),      # unaligned token count
    ((1, 5, 130, 384), 8, 320),   # SD level-0 channel count, n not aligned
    ((3, 5, 8, 128), 4, 64),
])
def test_frame_attention_matches_oracle(shape, heads, c_real):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q, k, v = (jax.random.normal(ks, shape, jnp.float32)
               for ks in (kq, kk, kv))
    q, k, v = (t.at[..., c_real:].set(0) for t in (q, k, v))
    ref = _oracle(q, k, v, heads, c_real)
    out = frame_attention_bfnc(q, k, v, heads, c_real, block=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_frame_attention_bf16():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (4, 5, 9, 128), jnp.bfloat16)
    x = x.at[..., 32:].set(0)
    ref = _oracle(x, x, x, 4, 32)
    out = frame_attention_bfnc(x, x, x, 4, 32, block=128)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)
