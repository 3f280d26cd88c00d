"""FrameConv taps9 dot formulation vs the native conv (core/layers.py).

3x3 stride-1 SAME convs with lane-aligned Cin run as the sum of 9 shifted
matmuls on TPU (~1.5x XLA's conv emitter at SD1.5 level-1/2 shapes,
tools/conv_variants_study.py); the param tree stays identical to nn.Conv so
checkpoints/converters are unaffected. Reference: `InflatedConv3d`,
`/root/reference/src/models/resnet.py:10-18`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.core.layers import FrameConv
from rcdms_tpu.ops.attention import set_default_attention_impl


@pytest.fixture(autouse=True)
def _reset_impl():
    try:
        yield
    finally:
        set_default_attention_impl("auto")


@pytest.mark.parametrize("cin,cout", [(128, 128), (128, 64), (256, 128)])
def test_taps9_matches_native_conv(cin, cout):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 2, 8, 8, cin)),
        jnp.float32)
    conv = FrameConv(cout)

    set_default_attention_impl("xla")
    params = conv.init(jax.random.PRNGKey(0), x)
    ref = conv.apply(params, x)

    set_default_attention_impl("pallas")  # forces taps9 on CPU
    params_t = conv.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_t)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_t)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    out = conv.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_unaligned_or_strided_keep_native():
    """Cin not lane-aligned (level 0's 320) and strided/1x1 convs always
    use the native path — outputs identical across impl settings."""
    rng = np.random.default_rng(1)
    for kwargs, shape in [
        (dict(features=64), (1, 2, 8, 8, 96)),           # cin % 128 != 0
        (dict(features=128, stride=2), (1, 2, 8, 8, 128)),
        (dict(features=128, kernel_size=1, padding=0), (1, 2, 8, 8, 128)),
    ]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        conv = FrameConv(**kwargs)
        set_default_attention_impl("xla")
        params = conv.init(jax.random.PRNGKey(0), x)
        ref = conv.apply(params, x)
        set_default_attention_impl("pallas")
        out = conv.apply(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=0, rtol=0)


def test_taps9_gradients():
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 1, 8, 8, 128)),
        jnp.float32)
    conv = FrameConv(128)
    set_default_attention_impl("xla")
    params = conv.init(jax.random.PRNGKey(0), x)

    def loss(p, impl):
        set_default_attention_impl(impl)
        try:
            return jnp.sum(conv.apply(p, x) ** 2)
        finally:
            set_default_attention_impl("auto")

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    g_t9 = jax.grad(lambda p: loss(p, "pallas"))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_t9)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
