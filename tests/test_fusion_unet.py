"""Stage-2 fusion routing + story UNet tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rcdms_tpu.configs import FusionConfig, StoryUNetConfig
from rcdms_tpu.models.fusion import (
    CrossFeatureStack,
    FusionModule,
    frame_known_from_mask,
)
from rcdms_tpu.models.unet3d import StoryUNet
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m 'not slow'


def test_fusion_routing_matches_reference_gather_semantics():
    """where-select must equal the reference's boolean-index-and-concat for
    a prefix-contiguous mask — and also work for non-contiguous masks."""
    cfg = FusionConfig.tiny()
    key = jax.random.PRNGKey(0)
    b, f, t = 2, 5, 7
    ks = jax.random.split(key, 4)
    img_tokens = jax.random.normal(ks[0], (b, f, 9, cfg.seen_vis_dim))
    img_proj = jax.random.normal(ks[1], (b, f, cfg.unseen_vis_dim))
    text = jax.random.normal(ks[2], (b, f, t, cfg.text_dim))
    known = jnp.array([[1, 1, 0, 0, 0], [1, 0, 1, 0, 1]], jnp.int32)

    mod = FusionModule(cfg)
    params = mod.init(key, img_tokens, img_proj, text, known)
    out = mod.apply(params, img_tokens, img_proj, text, known)
    assert out.shape == (b, f, t, cfg.hidden_dim)

    # reference semantics: run each stack separately, place by mask
    seen = CrossFeatureStack(cfg).apply(
        {"params": params["params"]["seen_module"]}, img_tokens, text)
    unseen = CrossFeatureStack(cfg).apply(
        {"params": params["params"]["unseen_module"]},
        img_proj[:, :, None, :], text)
    for bi in range(b):
        for fi in range(f):
            expect = seen[bi, fi] if known[bi, fi] else unseen[bi, fi]
            np.testing.assert_allclose(np.asarray(out[bi, fi]),
                                       np.asarray(expect), atol=1e-6)


def test_frame_known_from_mask():
    mask = jnp.zeros((1, 5, 4, 4, 1)).at[:, :2].set(1.0)
    known = frame_known_from_mask(mask)
    assert known.tolist() == [[True, True, False, False, False]]


def test_story_unet_shapes_and_determinism():
    cfg = StoryUNetConfig.tiny()
    key = jax.random.PRNGKey(1)
    b, f, hw = 1, 5, 16
    sample = jax.random.normal(key, (b, f, hw, hw, cfg.in_channels))
    t = jnp.array([500], jnp.int32)
    ctx = jax.random.normal(key, (b, f, 7, cfg.cross_attention_dim))
    model = StoryUNet(cfg)
    params = model.init(key, sample, t, ctx)
    apply = jax.jit(model.apply)
    out = apply(params, sample, t, ctx)
    assert out.shape == (b, f, hw, hw, cfg.out_channels)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(apply(params, sample, t, ctx)))
    assert np.isfinite(np.asarray(out)).all()


def test_story_unet_temporal_coupling():
    cfg = StoryUNetConfig.tiny()
    key = jax.random.PRNGKey(2)
    sample = jax.random.normal(key, (1, 5, 16, 16, cfg.in_channels))
    t = jnp.array([10], jnp.int32)
    ctx = jax.random.normal(key, (1, 5, 7, cfg.cross_attention_dim))
    model = StoryUNet(cfg)
    params = model.init(key, sample, t, ctx)
    out = model.apply(params, sample, t, ctx)
    out2 = model.apply(params, sample.at[:, 0].add(1.0), t, ctx)
    # temporal modules are zero-init (identity) at init => frames independent
    np.testing.assert_allclose(np.asarray(out2[:, 1:]),
                               np.asarray(out[:, 1:]), atol=1e-4)


def test_story_unet_context_reaches_output():
    cfg = StoryUNetConfig.tiny()
    key = jax.random.PRNGKey(3)
    sample = jax.random.normal(key, (1, 5, 16, 16, cfg.in_channels))
    t = jnp.array([10], jnp.int32)
    ctx = jax.random.normal(key, (1, 5, 7, cfg.cross_attention_dim))
    model = StoryUNet(cfg)
    params = model.init(key, sample, t, ctx)
    out = model.apply(params, sample, t, ctx)
    out2 = model.apply(params, sample, t, ctx + 1.0)
    assert np.abs(np.asarray(out - out2)).max() > 1e-6


def test_story_unet_single_frame():
    """BASELINE config #2: single-frame denoise must work (f=1; temporal PE
    slices to one frame, attention degenerates gracefully)."""
    cfg = StoryUNetConfig.tiny()
    key = jax.random.PRNGKey(7)
    sample = jax.random.normal(key, (2, 1, 16, 16, cfg.in_channels))
    t = jnp.array([500, 3], jnp.int32)
    ctx = jax.random.normal(key, (2, 1, 7, cfg.cross_attention_dim))
    model = StoryUNet(cfg)
    params = model.init(key, sample, t, ctx)
    out = model.apply(params, sample, t, ctx)
    assert out.shape == (2, 1, 16, 16, cfg.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_story_unet_remat_matches():
    cfg = StoryUNetConfig.tiny()
    key = jax.random.PRNGKey(4)
    sample = jax.random.normal(key, (1, 5, 8, 8, cfg.in_channels))
    t = jnp.array([3], jnp.int32)
    ctx = jax.random.normal(key, (1, 5, 7, cfg.cross_attention_dim))
    model = StoryUNet(cfg)
    params = model.init(key, sample, t, ctx)
    out = model.apply(params, sample, t, ctx)
    model_r = StoryUNet(StoryUNetConfig.tiny(remat=True))
    out_r = model_r.apply(params, sample, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)
