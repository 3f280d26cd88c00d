"""Shape/dtype/semantics unit tests for core blocks (SURVEY.md §4: the test
pyramid the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np

from rcdms_tpu.configs import TemporalConfig
from rcdms_tpu.core.attention import Attention, BasicTransformerBlock, SpatialTransformer
from rcdms_tpu.core.layers import (
    FeedForward,
    FrameConv,
    GroupNorm,
    sinusoidal_time_embedding,
    temporal_positional_encoding,
)
from rcdms_tpu.core.resnet import Downsample, ResnetBlock, Upsample
from rcdms_tpu.core.temporal import TemporalModule


def test_sinusoidal_time_embedding_matches_reference_formula():
    t = jnp.array([0, 500], jnp.float32)
    emb = np.asarray(sinusoidal_time_embedding(t, 8, flip_sin_to_cos=True))
    # t=0: sin->0, cos->1; flip puts cos first
    np.testing.assert_allclose(emb[0], [1, 1, 1, 1, 0, 0, 0, 0], atol=1e-6)
    half = 4
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    np.testing.assert_allclose(emb[1, :half], np.cos(500 * freqs), atol=1e-3)
    np.testing.assert_allclose(emb[1, half:], np.sin(500 * freqs), atol=1e-3)


def test_temporal_pe_matches_sin_cos_interleave():
    pe = np.asarray(temporal_positional_encoding(5, 6))
    div = np.exp(np.arange(0, 6, 2) * (-np.log(10000.0) / 6))
    for pos in range(5):
        np.testing.assert_allclose(pe[pos, 0::2], np.sin(pos * div), atol=1e-6)
        np.testing.assert_allclose(pe[pos, 1::2], np.cos(pos * div), atol=1e-6)


def test_groupnorm_per_frame_stats():
    """Stats must be independent per (batch, frame) — InflatedGroupNorm."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 5, 4, 4, 8))
    gn = GroupNorm(num_groups=2)
    params = gn.init(key, x)
    y = gn.apply(params, x)
    # scale frame 3 of batch 1 by 100: only that frame's output may change
    x2 = x.at[1, 3].multiply(100.0)
    y2 = gn.apply(params, x2)
    diff = np.abs(np.asarray(y2 - y)).sum(axis=(2, 3, 4))
    assert diff[1, 3] > 0
    diff_others = diff.copy(); diff_others[1, 3] = 0
    np.testing.assert_allclose(diff_others, 0, atol=1e-5)
    # normalized output: per-(b,f,group) mean ~0 var ~1 before affine
    yg = np.asarray(y).reshape(2, 5, 16, 2, 4)
    np.testing.assert_allclose(yg.mean(axis=(2, 4)), 0, atol=1e-5)
    np.testing.assert_allclose(yg.var(axis=(2, 4)), 1, atol=1e-4)


def test_attention_masking():
    key = jax.random.PRNGKey(1)
    attn = Attention(heads=2, head_dim=4)
    x = jax.random.normal(key, (1, 3, 8))
    params = attn.init(key, x)
    # mask out token 2 as a key for every query
    mask = jnp.array([[0.0, 0.0, -1e9]])[None, None]
    y_masked = attn.apply(params, x, mask=mask)
    # changing token 2's content must not affect outputs of queries 0/1
    x2 = x.at[0, 2].set(99.0)
    y2 = attn.apply(params, x2, mask=mask)
    np.testing.assert_allclose(np.asarray(y_masked[0, :2]),
                               np.asarray(y2[0, :2]), atol=1e-5)


def test_attention_batched_leading_dims():
    key = jax.random.PRNGKey(2)
    attn = Attention(heads=2, head_dim=4)
    x = jax.random.normal(key, (2, 5, 3, 8))
    params = attn.init(key, x)
    y = attn.apply(params, x)
    assert y.shape == (2, 5, 3, 8)
    # must equal applying per (b, f) slice independently
    y00 = attn.apply(params, x[0, 0][None])
    np.testing.assert_allclose(np.asarray(y[0, 0]), np.asarray(y00[0]),
                               atol=1e-5)


def test_feedforward_geglu_shapes():
    key = jax.random.PRNGKey(3)
    for act in ("geglu", "gelu"):
        ff = FeedForward(act)
        x = jax.random.normal(key, (2, 7, 16))
        params = ff.init(key, x)
        assert ff.apply(params, x).shape == (2, 7, 16)


def test_temporal_module_identity_at_init():
    """zero-init proj_out => exact identity at init (motion_module.py:84-85)."""
    key = jax.random.PRNGKey(4)
    cfg = TemporalConfig(num_heads=2, num_blocks=1)
    # token mode (prior)
    x = jax.random.normal(key, (2, 5, 7, 16))
    mod = TemporalModule(16, cfg)
    params = mod.init(key, x)
    np.testing.assert_allclose(np.asarray(mod.apply(params, x)),
                               np.asarray(x), atol=1e-6)
    # spatial mode (unet)
    xs = jax.random.normal(key, (1, 5, 4, 4, 32))
    mod = TemporalModule(32, cfg)
    params = mod.init(key, xs)
    np.testing.assert_allclose(np.asarray(mod.apply(params, xs)),
                               np.asarray(xs), atol=1e-6)


def test_temporal_module_mixes_frames_after_perturbation():
    key = jax.random.PRNGKey(5)
    cfg = TemporalConfig(num_heads=2, num_blocks=1, zero_init_output=False)
    x = jax.random.normal(key, (1, 5, 3, 16))
    mod = TemporalModule(16, cfg)
    params = mod.init(key, x)
    y = mod.apply(params, x)
    # random (non-constant) perturbation of frame 0 — a constant shift would
    # be erased by the LayerNorm's shift invariance
    x2 = x.at[0, 0].add(jax.random.normal(jax.random.PRNGKey(9), (3, 16)))
    y2 = mod.apply(params, x2)
    # other frames' outputs must change (cross-frame attention)
    assert np.abs(np.asarray(y2[0, 1:] - y[0, 1:])).max() > 1e-6


def test_resnet_block_and_samplers_shapes():
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (1, 5, 8, 8, 16))
    temb = jax.random.normal(key, (1, 32))
    rb = ResnetBlock(out_channels=24, groups=8)
    params = rb.init(key, x, temb)
    assert rb.apply(params, x, temb).shape == (1, 5, 8, 8, 24)

    down = Downsample(16)
    params = down.init(key, x)
    assert down.apply(params, x).shape == (1, 5, 4, 4, 16)

    up = Upsample(16)
    params = up.init(key, x)
    assert up.apply(params, x).shape == (1, 5, 16, 16, 16)


def test_frameconv_equals_per_frame_conv():
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (2, 5, 6, 6, 3))
    conv = FrameConv(4)
    params = conv.init(key, x)
    y = conv.apply(params, x)
    y3 = conv.apply(params, x[:, 3:4])
    np.testing.assert_allclose(np.asarray(y[:, 3:4]), np.asarray(y3),
                               atol=1e-5)


def test_spatial_transformer_per_frame_independent():
    """Spatial attention must NOT mix frames."""
    key = jax.random.PRNGKey(8)
    x = jax.random.normal(key, (1, 5, 4, 4, 16))
    ctx = jax.random.normal(key, (1, 5, 7, 12))
    st = SpatialTransformer(heads=2, head_dim=8, norm_groups=4)
    params = st.init(key, x, ctx)
    y = st.apply(params, x, ctx)
    assert y.shape == x.shape
    x2 = x.at[0, 0].add(5.0)
    y2 = st.apply(params, x2, ctx)
    np.testing.assert_allclose(np.asarray(y2[0, 1:]), np.asarray(y[0, 1:]),
                               atol=1e-5)


def test_basic_transformer_block_cross_attention_uses_context():
    key = jax.random.PRNGKey(9)
    blk = BasicTransformerBlock(heads=2, head_dim=4, use_cross=True)
    x = jax.random.normal(key, (2, 3, 8))
    ctx = jax.random.normal(key, (2, 6, 8))
    params = blk.init(key, x, ctx)
    y1 = blk.apply(params, x, ctx)
    y2 = blk.apply(params, x, ctx + 1.0)
    assert np.abs(np.asarray(y1 - y2)).max() > 1e-6
