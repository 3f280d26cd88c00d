"""Sampler tests: tiny end-to-end prior + story sampling, seed determinism,
noise injection for parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.configs import FusionConfig, PriorConfig, StoryUNetConfig
from rcdms_tpu.models.fusion import FusionModule
from rcdms_tpu.models.prior import FramePrior
from rcdms_tpu.models.unet3d import StoryUNet
from rcdms_tpu.sample.prior_sampler import PriorConditioning, PriorSampler
from rcdms_tpu.sample.story_sampler import StoryConditioning, StorySampler


def _prior_setup(key, b=1, steps=3):
    cfg = PriorConfig.tiny()
    f, d, t = cfg.num_frames, cfg.embedding_dim, cfg.num_text_tokens
    model = FramePrior(cfg)
    ks = jax.random.split(key, 8)
    cond = PriorConditioning(
        text_embed=jax.random.normal(ks[0], (b, f, d)),
        text_hidden=jax.random.normal(ks[1], (b, f, t, d)),
        text_mask=jnp.ones((b, f, t), bool),
        text_embed_u=jax.random.normal(ks[2], (b, f, d)),
        text_hidden_u=jax.random.normal(ks[3], (b, f, t, d)),
        text_mask_u=jnp.ones((b, f, t), bool),
        image_embed=jax.random.normal(ks[4], (b, f, d)),
        mask_embed=jax.random.normal(ks[5], (b, f, d)),
    )
    params = model.init(ks[6], cond.text_embed, jnp.zeros((b, f), jnp.int32),
                        cond.text_embed, cond.text_hidden, cond.image_embed,
                        cond.mask_embed, cond.text_mask)
    sampler = PriorSampler(model, num_steps=steps, guidance_scale=2.0)
    return sampler, params, cond


def test_prior_sampler_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    sampler, params, cond = _prior_setup(key)
    run = jax.jit(sampler.__call__)
    out1 = run(params, cond, jax.random.PRNGKey(7))
    out2 = run(params, cond, jax.random.PRNGKey(7))
    out3 = run(params, cond, jax.random.PRNGKey(8))
    assert out1.shape == (1, 5, 16)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.abs(np.asarray(out1 - out3)).max() > 1e-6
    assert np.isfinite(np.asarray(out1)).all()


def test_prior_sampler_injected_latents_reproducible():
    key = jax.random.PRNGKey(1)
    sampler, params, cond = _prior_setup(key)
    init = jnp.ones((1, 5, 16)) * 0.3
    out1 = sampler(params, cond, jax.random.PRNGKey(0), init_latents=init)
    out2 = sampler(params, cond, jax.random.PRNGKey(0), init_latents=init)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_prior_sampler_guidance_scale_changes_output():
    key = jax.random.PRNGKey(2)
    s1, params, cond = _prior_setup(key)
    s2 = PriorSampler(s1.model, num_steps=3, guidance_scale=5.0)
    o1 = s1(params, cond, jax.random.PRNGKey(0))
    o2 = s2(params, cond, jax.random.PRNGKey(0))
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-6


def test_prior_autoregressive_commits_unknown_frames():
    key = jax.random.PRNGKey(9)
    sampler, params, cond = _prior_setup(key, steps=2)
    white = jnp.full((1, 16), 0.7)
    # frames 0-1 known: their mask embeds equal the white embed
    mask_embed = cond.mask_embed.at[:, :2].set(white[:, None, :])
    cond = cond._replace(mask_embed=mask_embed)
    out = sampler.autoregressive(params, cond, jax.random.PRNGKey(1), white)
    assert out.shape == (1, 5, 16)
    # known frames keep their original conditioning embeddings
    np.testing.assert_array_equal(np.asarray(out[:, :2]),
                                  np.asarray(cond.image_embed[:, :2]))
    # unknown frames were replaced by predictions
    assert np.abs(np.asarray(out[:, 2:] - cond.image_embed[:, 2:])).min() > 0


def _story_setup(key, b=1, hw=16, steps=2):
    ucfg = StoryUNetConfig.tiny()
    fcfg = FusionConfig.tiny(hidden_dim=ucfg.cross_attention_dim,
                             text_dim=ucfg.cross_attention_dim)
    unet, fusion = StoryUNet(ucfg), FusionModule(fcfg)
    f, t = 5, 7
    ks = jax.random.split(key, 8)
    cond = StoryConditioning(
        text_hidden=jax.random.normal(ks[0], (b, f, t, fcfg.text_dim)),
        text_hidden_u=jax.random.normal(ks[1], (b, f, t, fcfg.text_dim)),
        image_tokens=jax.random.normal(ks[2], (b, f, 9, fcfg.seen_vis_dim)),
        image_proj=jax.random.normal(ks[3], (b, f, fcfg.unseen_vis_dim)),
        frame_known=jnp.array([[1, 1, 0, 0, 0]] * b, bool),
        masked_latents=jax.random.normal(ks[4], (b, f, hw, hw, 4)),
        mask_label=jnp.ones((b, f, hw, hw, 1)),
    )
    fusion_p = fusion.init(ks[5], cond.image_tokens, cond.image_proj,
                           cond.text_hidden, cond.frame_known)
    x9 = jnp.zeros((b, f, hw, hw, ucfg.in_channels))
    ctx = jnp.zeros((b, f, t, ucfg.cross_attention_dim))
    unet_p = unet.init(ks[6], x9, jnp.zeros((b,), jnp.int32), ctx)
    sampler = StorySampler(unet, fusion, num_steps=steps, guidance_scale=2.0)
    return sampler, unet_p, fusion_p, cond


def test_story_sampler_shapes_and_determinism():
    key = jax.random.PRNGKey(3)
    sampler, unet_p, fusion_p, cond = _story_setup(key)
    run = jax.jit(sampler.__call__)
    out1 = run(unet_p, fusion_p, cond, jax.random.PRNGKey(1))
    out2 = run(unet_p, fusion_p, cond, jax.random.PRNGKey(1))
    assert out1.shape == (1, 5, 16, 16, 4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


@pytest.mark.slow
def test_story_sampler_batch2():
    """The reference pipeline is hard-wired to batch 1
    (`RCDMs_pipeline.py:408`, `:476`); ours must batch."""
    key = jax.random.PRNGKey(4)
    sampler, unet_p, fusion_p, cond = _story_setup(key, b=2)
    out = sampler(unet_p, fusion_p, cond, jax.random.PRNGKey(1))
    assert out.shape == (2, 5, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_story_sampler_sequential_cfg_matches_batched():
    """Single-chip sequential-CFG (lax.map over the context pair) must equal
    the batch-doubled form — same math, different batching."""
    import dataclasses

    from tests.test_pipeline import _build

    pipeline, params, inputs = _build(jax.random.PRNGKey(11))
    key = jax.random.PRNGKey(12)
    seq = pipeline  # sequential_cfg defaults True
    assert seq.story_sampler.sequential_cfg
    batched = dataclasses.replace(
        pipeline, story_sampler=dataclasses.replace(
            pipeline.story_sampler, sequential_cfg=False))
    f_seq, e_seq = jax.jit(seq.generate)(params, inputs, key)
    f_bat, e_bat = jax.jit(batched.generate)(params, inputs, key)
    np.testing.assert_allclose(np.asarray(f_seq), np.asarray(f_bat),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(e_seq), np.asarray(e_bat))


@pytest.mark.slow
def test_story_sampler_encoder_propagation():
    """Opt-in fast sampling (encoder reuse every k steps): exact when every
    step is a key step (1 step), finite + right-shaped when caching kicks
    in at k=2."""
    import dataclasses

    from tests.test_pipeline import _build

    pipeline, params, inputs = _build(jax.random.PRNGKey(13))
    key = jax.random.PRNGKey(14)

    def sampler(**kw):
        return dataclasses.replace(pipeline.story_sampler, **kw)

    def run(s, steps):
        p = dataclasses.replace(
            pipeline, story_sampler=dataclasses.replace(s, num_steps=steps),
            prior_sampler=dataclasses.replace(pipeline.prior_sampler,
                                              num_steps=steps))
        return jax.jit(p.generate)(params, inputs, key)

    # one step: the single step is a key step -> bit-identical to exact
    f_exact1, _ = run(sampler(encoder_propagation=0), 1)
    f_prop1, _ = run(sampler(encoder_propagation=2), 1)
    np.testing.assert_array_equal(np.asarray(f_exact1), np.asarray(f_prop1))

    # two steps with k=2: step 1 reuses the encoder -> approximate
    f_prop2, _ = run(sampler(encoder_propagation=2), 2)
    arr = np.asarray(f_prop2)
    assert np.isfinite(arr).all() and arr.shape == (1, 5, 32, 32, 3)
    f_exact2, _ = run(sampler(encoder_propagation=0), 2)
    assert not np.array_equal(arr, np.asarray(f_exact2))
