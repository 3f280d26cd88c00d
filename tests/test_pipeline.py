"""End-to-end two-stage pipeline test (tiny configs, CPU): captions +
known frames -> story images, jitted, deterministic."""

import jax
import jax.numpy as jnp
import numpy as np

from rcdms_tpu.configs import (
    CLIPTextConfig,
    CLIPVisionConfig,
    FusionConfig,
    PriorConfig,
    StoryUNetConfig,
    VAEConfig,
)
from rcdms_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
from rcdms_tpu.models.fusion import FusionModule
from rcdms_tpu.models.prior import FramePrior
from rcdms_tpu.models.unet3d import StoryUNet
from rcdms_tpu.models.vae import VAE
from rcdms_tpu.sample.pipeline import StoryInputs, StoryPipeline, _padding_mask
from rcdms_tpu.sample.prior_sampler import PriorSampler
from rcdms_tpu.sample.story_sampler import StorySampler
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m 'not slow'


def _build(key):
    prior_cfg = PriorConfig.tiny()
    unet_cfg = StoryUNetConfig.tiny()
    fusion_cfg = FusionConfig.tiny(
        hidden_dim=unet_cfg.cross_attention_dim,
        text_dim=unet_cfg.cross_attention_dim,
        unseen_vis_dim=prior_cfg.embedding_dim)
    vae_cfg = VAEConfig.tiny()
    t = prior_cfg.num_text_tokens
    t1_cfg = CLIPTextConfig.tiny(max_positions=t,
                                 width=prior_cfg.embedding_dim,
                                 projection_dim=prior_cfg.embedding_dim)
    t2_cfg = CLIPTextConfig.tiny(max_positions=t,
                                 width=unet_cfg.cross_attention_dim,
                                 projection_dim=unet_cfg.cross_attention_dim)
    v_cfg = CLIPVisionConfig.tiny(width=fusion_cfg.seen_vis_dim,
                                  projection_dim=prior_cfg.embedding_dim)

    text1 = CLIPTextEncoder(t1_cfg)
    text2 = CLIPTextEncoder(t2_cfg)
    vision = CLIPVisionEncoder(v_cfg)
    vae = VAE(vae_cfg)
    prior = FramePrior(prior_cfg)
    unet = StoryUNet(unet_cfg)
    fusion = FusionModule(fusion_cfg)

    f, img, cimg = 5, 32, v_cfg.image_size
    ks = jax.random.split(key, 8)
    ids = jnp.zeros((1, f, t), jnp.int32).at[:, :, 3].set(
        t1_cfg.eos_token_id)
    params = {
        "text_s1": text1.init(ks[0], ids.reshape(f, t)),
        "text_s2": text2.init(ks[1], ids.reshape(f, t)),
        "vision": vision.init(ks[2], jnp.zeros((1, cimg, cimg, 3))),
        "vae": vae.init(ks[3], jnp.zeros((1, img, img, 3)),
                        jnp.zeros((1, img // 2, img // 2, 4))),
        "prior": prior.init(
            ks[4], jnp.zeros((1, f, prior_cfg.embedding_dim)),
            jnp.zeros((1, f), jnp.int32),
            jnp.zeros((1, f, prior_cfg.embedding_dim)),
            jnp.zeros((1, f, t, prior_cfg.embedding_dim)),
            jnp.zeros((1, f, prior_cfg.embedding_dim)),
            jnp.zeros((1, f, prior_cfg.embedding_dim)),
            jnp.ones((1, f, t), bool)),
        "unet": unet.init(
            ks[5],
            jnp.zeros((1, f, img // 2, img // 2, unet_cfg.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, f, t, unet_cfg.cross_attention_dim))),
        "fusion": fusion.init(
            ks[6], jnp.zeros((1, f, 5, fusion_cfg.seen_vis_dim)),
            jnp.zeros((1, f, fusion_cfg.unseen_vis_dim)),
            jnp.zeros((1, f, t, fusion_cfg.text_dim)),
            jnp.zeros((1, f), bool)),
    }
    pipeline = StoryPipeline(
        text_encoder_s1=text1, text_encoder_s2=text2, vision_encoder=vision,
        vae=vae,
        prior_sampler=PriorSampler(prior, num_steps=2, guidance_scale=2.0),
        story_sampler=StorySampler(unet, fusion, num_steps=2,
                                   guidance_scale=2.0))

    inputs = StoryInputs(
        tokens_s1=ids, tokens_s1_u=ids, tokens_s2=ids, tokens_s2_u=ids,
        source_clip=jax.random.normal(ks[7], (1, f, cimg, cimg, 3)),
        mask_clip=jnp.zeros((1, f, cimg, cimg, 3)),
        source_pixels=jnp.zeros((1, f, img, img, 3)),
        frame_known=jnp.array([[True, False, False, False, False]]),
    )
    return pipeline, params, inputs


def test_pipeline_end_to_end():
    key = jax.random.PRNGKey(0)
    pipeline, params, inputs = _build(key)
    generate = jax.jit(pipeline.generate)
    frames, embeds = generate(params, inputs, jax.random.PRNGKey(1))
    assert frames.shape == (1, 5, 32, 32, 3)
    assert embeds.shape == (1, 5, 16)
    fr = np.asarray(frames)
    assert np.isfinite(fr).all()
    assert fr.min() >= 0.0 and fr.max() <= 1.0
    # determinism
    frames2, _ = generate(params, inputs, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(fr, np.asarray(frames2))


def test_padding_mask_from_tokens():
    ids = jnp.array([[[1, 2, 63, 0, 0, 0, 0]]], jnp.int32)  # eos=63 at pos 2
    mask = _padding_mask(ids, 63)
    assert mask.shape == (1, 1, 7)
    assert mask[0, 0].tolist() == [True, True, True, False, False, False,
                                   False]
    # no EOS anywhere -> everything attended
    mask2 = _padding_mask(jnp.ones((1, 1, 7), jnp.int32), 63)
    assert mask2[0, 0].all()
