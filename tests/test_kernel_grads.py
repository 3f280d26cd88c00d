"""Kernel differentiability: custom-VJP (Pallas forward, XLA-recompute
backward) must match grads of the pure XLA path — this is what makes TPU
training work, since the frame/flash kernels are on the training hot path."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from rcdms_tpu.ops import flash, frame_attention as fa

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m 'not slow'


def test_flash_attention_grads_match_xla():
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (2, 128, 32))
               for i in range(3))
    scale = 32 ** -0.5

    def loss_kernel(q, k, v):
        return jnp.sum(flash.flash_attention(q, k, v, scale, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(flash._xla_reference(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_frame_attention_grads_match_xla():
    key = jax.random.PRNGKey(1)
    flash.set_kernel_interpret(True)
    try:
        _frame_attention_grads_check(key)
    finally:
        flash.set_kernel_interpret(False)


def _frame_attention_grads_check(key):
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (3, 5, 4, 128))
               for i in range(3))
    q, k, v = (t.at[..., 16:].set(0) for t in (q, k, v))

    def loss_kernel(q, k, v):
        return jnp.sum(fa.frame_attention_bfnc(q, k, v, 2, 16, None,
                                               128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(fa._bfnc_xla_reference(q, k, v, 2, 8 ** -0.5,
                                              16) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
