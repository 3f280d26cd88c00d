"""Fused GEGLU feed-forward kernel (ops/geglu.py) vs the unfused oracle.

The FF math is the diffusers `FeedForward` geglu branch (reference
`src/models/attention.py:368-526` uses it in every transformer block); the
kernel keeps the (tokens, 2*inner) intermediate in VMEM. Tests run the
kernel in interpret mode on CPU."""

import re
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.core.layers import FeedForward
from rcdms_tpu.ops import flash
from rcdms_tpu.ops.attention import (
    configure_for_mesh,
    set_default_attention_impl,
)
from rcdms_tpu.ops.geglu import (
    _xla_gelu_reference,
    _xla_reference,
    ff_flat,
    fits_kernel,
    gelu_ff,
    geglu_ff,
)


@pytest.fixture(autouse=True)
def _interpret_kernels():
    flash.set_kernel_interpret(True)
    try:
        yield
    finally:
        flash.set_kernel_interpret(False)
        set_default_attention_impl("auto")
        configure_for_mesh(None)


def _mk(n=256, c=64, mult=4, lead=(2, 3), dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    inner = c * mult
    x = jnp.asarray(rng.standard_normal(lead + (n, c)), dtype)
    w1 = jnp.asarray(rng.standard_normal((c, 2 * inner)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((2 * inner,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((inner, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def test_kernel_matches_oracle_fp32():
    x, w1, b1, w2, b2 = _mk()
    ref = _xla_reference(x, w1, b1, w2, b2)
    out = jax.jit(geglu_ff)(x, w1, b1, w2, b2)
    assert out.shape == x.shape and out.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kernel_matches_oracle_bf16():
    x, w1, b1, w2, b2 = _mk(dtype=jnp.bfloat16, seed=1)
    ref = np.asarray(_xla_reference(x, w1, b1, w2, b2), np.float32)
    out = np.asarray(jax.jit(geglu_ff)(x, w1, b1, w2, b2), np.float32)
    # bf16 accumulation-order differences only
    np.testing.assert_allclose(out, ref, atol=0.15, rtol=0.05)


def test_multi_iblock_accumulation():
    """inner large enough that the kernel needs >1 inner block (the fp32
    scratch accumulates across grid steps)."""
    x, w1, b1, w2, b2 = _mk(n=128, c=256, mult=4, lead=(1,), seed=2)
    assert fits_kernel(128, 256, 1024)
    ref = _xla_reference(x, w1, b1, w2, b2)
    out = jax.jit(geglu_ff)(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_odd_shapes_fall_back():
    """Token counts that do not tile (e.g. 97) route to the XLA reference
    inside the op — same results, no error."""
    x, w1, b1, w2, b2 = _mk(n=97, c=64, lead=(2,), seed=3)
    assert not fits_kernel(97, 64, 256)
    ref = _xla_reference(x, w1, b1, w2, b2)
    out = jax.jit(geglu_ff)(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_gradients_match_oracle():
    x, w1, b1, w2, b2 = _mk(n=128, c=32, lead=(2,), seed=4)

    def loss_fused(*args):
        return jnp.sum(geglu_ff(*args) ** 2)

    def loss_ref(*args):
        return jnp.sum(_xla_reference(*args) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2,
                                                            b2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def _mk_gelu(n=256, c=64, mult=4, lead=(2, 3), dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    inner = c * mult
    x = jnp.asarray(rng.standard_normal(lead + (n, c)), dtype)
    w1 = jnp.asarray(rng.standard_normal((c, inner)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((inner,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((inner, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def test_gelu_kernel_matches_oracle():
    """The plain-gelu variant (prior spatial FF) vs its unfused oracle."""
    x, w1, b1, w2, b2 = _mk_gelu(seed=7)
    ref = _xla_gelu_reference(x, w1, b1, w2, b2)
    out = jax.jit(gelu_ff)(x, w1, b1, w2, b2)
    assert out.shape == x.shape and out.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_gelu_gradients_match_oracle():
    x, w1, b1, w2, b2 = _mk_gelu(n=128, c=32, lead=(2,), seed=8)
    g_fused = jax.grad(lambda *a: jnp.sum(gelu_ff(*a) ** 2),
                       argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_ref = jax.grad(lambda *a: jnp.sum(_xla_gelu_reference(*a) ** 2),
                     argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("fn,ref_fn,gate", [(geglu_ff, _xla_reference, True),
                                            (gelu_ff, _xla_gelu_reference,
                                             False)])
def test_ff_flat_matches_oracle(fn, ref_fn, gate):
    """Short token dims flattened + row-padded (the prior's (2,5,97,c) FF
    inputs): same results as the unfused oracle on the original layout."""
    x, w1, b1, w2, b2 = (_mk if gate else _mk_gelu)(n=97, c=64, lead=(2, 5),
                                                    seed=9)
    ref = ref_fn(x, w1, b1, w2, b2)
    out = jax.jit(lambda a: ff_flat(fn, a, w1, b1, w2, b2))(x)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_feedforward_module_dispatch_and_tree():
    """FeedForward with impl forced to 'pallas' uses the fused op, produces
    the SAME param tree as the unfused path, and matches its output."""
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 256, 64)),
                    jnp.float32)
    ff = FeedForward("geglu")

    set_default_attention_impl("xla")
    params = ff.init(jax.random.PRNGKey(0), x)
    ref = ff.apply(params, x)

    set_default_attention_impl("pallas")
    params_fused = ff.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_fused)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_fused)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    out = ff.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sharded_ff_no_collectives():
    """Token-sharded input: the FF partitions elementwise — zero
    collectives, output stays sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rcdms_tpu.train.sharding import inference_mesh

    x, w1, b1, w2, b2 = _mk(n=512, c=64, lead=(2,), seed=6)
    ref = jax.jit(geglu_ff)(x, w1, b1, w2, b2)

    mesh = inference_mesh(jax.devices())
    xs = jax.device_put(x, NamedSharding(mesh, P("cfg", "space", None)))
    fn = jax.jit(geglu_ff)
    out = fn(xs, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    assert "space" in tuple(out.sharding.spec)
    txt = fn.lower(xs, w1, b1, w2, b2).compile().as_text()
    colls = Counter(re.findall(
        r"(all-gather|all-reduce|collective-permute|all-to-all)", txt))
    assert sum(colls.values()) == 0, colls
