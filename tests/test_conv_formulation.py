"""FrameConv taps9 dot formulation vs the native conv (core/layers.py).

3x3 stride-1 SAME convs with Cin >= 640 (Cin % 64 == 0) run as the sum of
9 shifted matmuls on TPU (~1.5-2x XLA's conv emitter at SD1.5 level-1/2 and
up-block concat shapes, tools/conv_variants_study.py + end-to-end A/B); the param tree stays identical to nn.Conv so
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


@pytest.mark.parametrize("cin,cout", [(640, 320), (640, 640), (704, 128)])
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
        (dict(features=64), (1, 2, 8, 8, 96)),            # cin % 64 != 0
        (dict(features=64), (1, 2, 8, 8, 320)),           # cin < 640 (L0)
        (dict(features=128, stride=2), (1, 2, 8, 8, 640)),
        (dict(features=128, kernel_size=1, padding=0), (1, 2, 8, 8, 640)),
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
        np.random.default_rng(2).standard_normal((1, 1, 8, 8, 640)),
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


def test_taps9_disabled_under_mesh():
    """Under a >1-device mesh taps9 must yield to the native conv (its 9
    shifted slices each pay a halo exchange — comm audit measured 8.7 GB
    vs 0.9 GB of collective-permutes per story)."""
    from rcdms_tpu.core.layers import _use_taps9
    from rcdms_tpu.ops.attention import configure_for_mesh
    from rcdms_tpu.train.sharding import inference_mesh

    set_default_attention_impl("pallas")
    assert _use_taps9()
    configure_for_mesh(inference_mesh(jax.devices()))
    try:
        assert not _use_taps9()
    finally:
        configure_for_mesh(None)
    assert _use_taps9()


class TestChannelMajorResnet:
    """RCDMS_L0_CONV=cm: the channel-major level-0 resnet segment
    (core/resnet.py + layers.cm_*) must match the standard path exactly in
    math (fp32) with an identical param tree, and leave non-eligible
    blocks untouched."""

    def _block(self, cin, cout, hw=8, temb=True):
        from rcdms_tpu.core.resnet import ResnetBlock

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 3, hw, hw, cin)),
                        jnp.float32)
        t = jnp.asarray(rng.standard_normal((2, 64)),
                        jnp.float32) if temb else None
        return ResnetBlock(cout, groups=8), x, t

    @pytest.mark.parametrize("temb", [True, False])
    @pytest.mark.parametrize("cin,cout", [(64, 64), (192, 64)])
    def test_cm_matches_standard(self, monkeypatch, temb, cin, cout):
        block, x, t = self._block(cin, cout, temb=temb)
        set_default_attention_impl("xla")
        params = block.init(jax.random.PRNGKey(0), x, t)
        ref = np.asarray(block.apply(params, x, t))

        monkeypatch.setenv("RCDMS_L0_CONV", "cm")
        set_default_attention_impl("pallas")  # forces the formulation on CPU
        params_cm = block.init(jax.random.PRNGKey(0), x, t)
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params_cm)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(params),
                jax.tree_util.tree_leaves_with_path(params_cm)):
            assert ka == kb and a.shape == b.shape
        out = np.asarray(block.apply(params, x, t))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)

    def test_gate_rejects_channel_change_and_misaligned(self, monkeypatch):
        from rcdms_tpu.core.layers import _use_cm_l0

        monkeypatch.setenv("RCDMS_L0_CONV", "cm")
        set_default_attention_impl("pallas")
        assert _use_cm_l0(64, 64) and _use_cm_l0(320, 320)
        assert _use_cm_l0(640, 320)       # up-block channel change
        assert _use_cm_l0(960, 320)
        assert not _use_cm_l0(640, 640)   # taps9 territory
        assert not _use_cm_l0(40, 40)     # lane-misaligned
        assert not _use_cm_l0(40, 64)
        from rcdms_tpu.ops.quant import set_quant_mode

        set_quant_mode("int8")            # stronger opt-in wins level 0
        try:
            assert not _use_cm_l0(320, 320)
        finally:
            set_quant_mode(None)
        monkeypatch.delenv("RCDMS_L0_CONV")
        assert not _use_cm_l0(320, 320)   # strictly opt-in

    def test_cm_disabled_under_mesh(self, monkeypatch):
        from rcdms_tpu.core.layers import _use_cm_l0
        from rcdms_tpu.ops.attention import configure_for_mesh
        from rcdms_tpu.train.sharding import inference_mesh

        monkeypatch.setenv("RCDMS_L0_CONV", "cm")
        set_default_attention_impl("pallas")
        assert _use_cm_l0(320, 320)
        configure_for_mesh(inference_mesh(jax.devices()))
        try:
            assert not _use_cm_l0(320, 320)
        finally:
            configure_for_mesh(None)

    @pytest.mark.parametrize("cin,cout", [(64, 64), (192, 64)])
    def test_cm_grads_match(self, monkeypatch, cin, cout):
        """The formulation is plain XLA, so autodiff must agree with the
        native path (training uses whatever formulation is active)."""
        block, x, t = self._block(cin, cout)
        set_default_attention_impl("xla")
        params = block.init(jax.random.PRNGKey(0), x, t)

        def loss(p, xx):
            return jnp.sum(block.apply(p, xx, t) ** 2)

        g_ref = jax.grad(loss)(params, x)
        monkeypatch.setenv("RCDMS_L0_CONV", "cm")
        set_default_attention_impl("pallas")
        g_cm = jax.grad(loss)(params, x)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_cm)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-4)
