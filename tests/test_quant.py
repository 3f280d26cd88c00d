"""Opt-in w8a8 int8 inference quantization (ops/quant.py).

The mode is a TPU-serving capability beyond reference parity (the torch
reference has no quantized path); these tests pin its numerics on CPU:
symmetric per-tensor activation / per-output-channel weight quantization,
the int8 taps9 conv against the exact conv within quantization-error
bounds, zero-channel safety (the temporal modules' zero-init proj_out),
and that the DEFAULT path is untouched when the mode is off."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.core.layers import FrameConv
from rcdms_tpu.ops.attention import set_default_attention_impl
from rcdms_tpu.ops import quant


@pytest.fixture(autouse=True)
def _reset_modes():
    try:
        yield
    finally:
        set_default_attention_impl("auto")
        quant.set_quant_mode(None)


def test_quantize_act_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 128)),
                    jnp.float32)
    q, s = quant.quantize_act(x)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q, np.float32) * float(s) - np.asarray(x))
    assert err.max() <= float(s) * 0.5 + 1e-7  # round-to-nearest bound
    # zero-safe
    q0, s0 = quant.quantize_act(jnp.zeros((8, 8)))
    assert np.all(np.asarray(q0) == 0) and np.isfinite(float(s0))


def test_quantize_weight_per_channel():
    w = jnp.asarray(np.random.default_rng(1).standard_normal((3, 3, 16, 8)),
                    jnp.float32)
    # scale one output channel way up: per-channel scales must keep the
    # others' resolution
    w = w.at[..., 0].mul(100.0)
    q, s = quant.quantize_weight(w, out_axis=-1)
    assert s.shape == (8,)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    err = np.abs(deq - np.asarray(w))
    for c in range(8):
        assert err[..., c].max() <= float(s[c]) * 0.5 + 1e-7
    # a zero-init channel stays exactly zero (temporal proj_out)
    wz = w.at[..., 3].set(0.0)
    qz, sz = quant.quantize_weight(wz, out_axis=-1)
    assert np.all(np.asarray(qz[..., 3]) == 0)
    assert np.isfinite(np.asarray(sz)).all()


def test_mode_validation():
    with pytest.raises(ValueError):
        quant.set_quant_mode("int4")
    quant.set_quant_mode("int8")
    assert quant.int8_enabled()
    quant.set_quant_mode(None)
    assert not quant.int8_enabled()


@pytest.mark.parametrize("cin,cout", [(320, 320), (640, 640), (960, 320)])
def test_int8_taps9_close_to_exact(cin, cout):
    """The w8a8 conv tracks the exact conv within quantization error —
    and the int8 gate admits level 0's Cin=320 (where the bf16 taps9
    formulation is rejected)."""
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 2, 8, 8, cin)),
        jnp.float32)
    conv = FrameConv(cout)

    set_default_attention_impl("xla")
    params = conv.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(conv.apply(params, x))

    set_default_attention_impl("pallas")  # forces the formulation on CPU
    quant.set_quant_mode("int8")
    params_q = conv.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_q)  # checkpoint tree unchanged
    out = np.asarray(conv.apply(params, x))

    rel_rms = np.sqrt(((out - ref) ** 2).mean()) / \
        np.sqrt((ref ** 2).mean() + 1e-12)
    assert rel_rms < 0.02, rel_rms
    assert np.isfinite(out).all()


def test_int8_off_means_exact_path():
    """With the mode off, 'pallas' dispatch must produce the bf16 taps9 /
    native results — bit-identical to a run that never imported quant."""
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 1, 8, 8, 320)),
        jnp.float32)
    conv = FrameConv(64)
    set_default_attention_impl("pallas")
    params = conv.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(conv.apply(params, x))
    quant.set_quant_mode("int8")
    out_q = np.asarray(conv.apply(params, x))
    quant.set_quant_mode(None)
    out = np.asarray(conv.apply(params, x))
    np.testing.assert_array_equal(out, ref)
    assert not np.array_equal(out_q, ref)  # the mode actually engaged


def test_int8_disabled_under_mesh():
    """Same halo-exchange reasoning as bf16 taps9: sharded programs keep
    the native conv (and the per-tensor amax would be a cross-shard
    all-reduce)."""
    from rcdms_tpu.core.layers import _use_taps9_int8
    from rcdms_tpu.ops.attention import configure_for_mesh
    from rcdms_tpu.train.sharding import inference_mesh

    set_default_attention_impl("pallas")
    quant.set_quant_mode("int8")
    assert _use_taps9_int8()
    configure_for_mesh(inference_mesh(jax.devices()))
    try:
        assert not _use_taps9_int8()
    finally:
        configure_for_mesh(None)
    assert _use_taps9_int8()


@pytest.mark.slow
def test_int8_unet_forward_tiny():
    """Tiny StoryUNet forward (64/128-channel convs so the int8 gate
    engages), int8 vs exact: same param tree, outputs finite and within
    loose quantization error end to end."""
    from rcdms_tpu.models.unet3d import StoryUNet
    from rcdms_tpu.configs import StoryUNetConfig
    from rcdms_tpu.ops import flash

    cfg = StoryUNetConfig.tiny(block_channels=(64, 128))
    unet = StoryUNet(cfg)
    b, f, hw = 1, 2, 16
    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (b, f, hw, hw, cfg.in_channels)), jnp.float32)
    t = jnp.array([500], jnp.int32)
    ctx = jnp.asarray(np.random.default_rng(5).standard_normal(
        (b, f, 77, cfg.cross_attention_dim)), jnp.float32)

    set_default_attention_impl("xla")
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    ref = np.asarray(unet.apply(params, x, t, ctx))

    set_default_attention_impl("pallas")
    flash.set_kernel_interpret(True)
    quant.set_quant_mode("int8")
    try:
        out = np.asarray(unet.apply(params, x, t, ctx))
    finally:
        flash.set_kernel_interpret(False)
    assert np.isfinite(out).all()
    rel_rms = np.sqrt(((out - ref) ** 2).mean()) / \
        np.sqrt((ref ** 2).mean() + 1e-12)
    assert rel_rms < 0.15, rel_rms
