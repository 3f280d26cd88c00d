"""Full two-stage story-generation pipeline: captions + known frames ->
5-frame story images, in one jittable program.

Ties together what the reference spreads across
`stage1_batchtest_rcdms_model.py` (CLIP encodes, prior pipeline, .npy
embedding hand-off) and `stage2_batchtest_rcdms_model.py` /
`RCDMs_pipeline.py` (fusion, UNet DDIM loop, per-frame VAE decode): here the
stage-1 -> stage-2 hand-off is an in-program tensor, not a .npy file, so a
whole story generates in a single compiled forward."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rcdms_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
from rcdms_tpu.models.vae import VAE
from rcdms_tpu.sample.prior_sampler import PriorConditioning, PriorSampler
from rcdms_tpu.sample.story_sampler import StoryConditioning, StorySampler

Array = jax.Array


class StoryInputs(NamedTuple):
    """Host-prepared story inputs (see data/protocol.py for construction).

    tokens_s1 / tokens_s1_u: (b, f, T1) int32 — captions (and "" uncond)
        tokenized for the stage-1 (bigG) text tower.
    tokens_s2 / tokens_s2_u: (b, f, T2) int32 — same for the stage-2 (SD)
        text tower.
    source_clip: (b, f, 224, 224, 3) — CLIP-preprocessed known frames
        (black images at unknown positions).
    mask_clip:   (b, f, 224, 224, 3) — CLIP-preprocessed white/black
        mask images.
    source_pixels: (b, f, H, W, 3) in [-1, 1] — known frames (black at
        unknown positions) for VAE encoding.
    frame_known: (b, f) bool.
    """

    tokens_s1: Array
    tokens_s1_u: Array
    tokens_s2: Array
    tokens_s2_u: Array
    source_clip: Array
    mask_clip: Array
    source_pixels: Array
    frame_known: Array


@dataclass(frozen=True)
class StoryPipeline:
    text_encoder_s1: CLIPTextEncoder
    text_encoder_s2: CLIPTextEncoder
    vision_encoder: CLIPVisionEncoder
    vae: VAE
    prior_sampler: PriorSampler
    story_sampler: StorySampler
    vae_scale: float = 0.18215

    def _encode_text(self, encoder, params, tokens: Array):
        b, f, t = tokens.shape
        hidden, embeds = encoder.apply(params, tokens.reshape(b * f, t))
        return (hidden.reshape(b, f, t, -1), embeds.reshape(b, f, -1))

    def _encode_images(self, params, images: Array):
        b, f = images.shape[:2]
        tokens, embeds = self.vision_encoder.apply(
            params, images.reshape((b * f,) + images.shape[2:]))
        return (tokens.reshape((b, f) + tokens.shape[1:]),
                embeds.reshape(b, f, -1))

    def generate(self, params: dict, inputs: StoryInputs, key: Array):
        """params keys: text_s1, text_s2, vision, vae, prior, unet, fusion.
        Returns (images in [0,1] (b, f, H, W, 3), predicted stage-1 embeds)."""
        key1, key2, key_vae = jax.random.split(key, 3)
        b, f = inputs.frame_known.shape

        # ---- stage 1: predict CLIP embeddings for unknown frames ----------
        th_c, te_c = self._encode_text(self.text_encoder_s1,
                                       params["text_s1"], inputs.tokens_s1)
        th_u, te_u = self._encode_text(self.text_encoder_s1,
                                       params["text_s1"], inputs.tokens_s1_u)
        src_tokens, src_embed = self._encode_images(params["vision"],
                                                    inputs.source_clip)
        _, mask_embed = self._encode_images(params["vision"],
                                            inputs.mask_clip)

        t1 = inputs.tokens_s1.shape[-1]
        eos1 = self.text_encoder_s1.cfg.eos_token_id
        cond1 = PriorConditioning(
            text_embed=te_c, text_hidden=th_c,
            text_mask=_padding_mask(inputs.tokens_s1, eos1),
            text_embed_u=te_u, text_hidden_u=th_u,
            text_mask_u=_padding_mask(inputs.tokens_s1_u, eos1),
            image_embed=src_embed, mask_embed=mask_embed)
        pred_embeds = self.prior_sampler(params["prior"], cond1, key1)

        # stage-1 -> stage-2 hand-off: unknown frames use the predicted
        # embeds; known frames keep their real CLIP projection (the semantic
        # stack only ever sees unknown frames, but keep the tensor exact).
        image_proj = jnp.where(inputs.frame_known[..., None],
                               src_embed, pred_embeds)

        # ---- stage 2: generate latents and decode --------------------------
        th2_c, _ = self._encode_text(self.text_encoder_s2, params["text_s2"],
                                     inputs.tokens_s2)
        th2_u, _ = self._encode_text(self.text_encoder_s2, params["text_s2"],
                                     inputs.tokens_s2_u)

        px = inputs.source_pixels
        mean, logvar = self.vae.apply(
            params["vae"], px.reshape((b * f,) + px.shape[2:]),
            method=VAE.encode)
        noise = jax.random.normal(key_vae, mean.shape)
        masked_latents = VAE.sample_latent(mean, logvar, noise) * self.vae_scale
        masked_latents = masked_latents.reshape(
            (b, f) + masked_latents.shape[1:])
        h8, w8 = masked_latents.shape[2:4]
        mask_label = jnp.broadcast_to(
            inputs.frame_known[:, :, None, None, None].astype(px.dtype),
            (b, f, h8, w8, 1))

        cond2 = StoryConditioning(
            text_hidden=th2_c, text_hidden_u=th2_u,
            image_tokens=src_tokens, image_proj=image_proj,
            frame_known=inputs.frame_known,
            masked_latents=masked_latents, mask_label=mask_label)
        latents = self.story_sampler(params["unet"], params["fusion"],
                                     cond2, key2)

        # decode sequentially per frame (lax.map): peak decoder activations
        # at 512px are ~5x smaller than a batched decode, which is what tips
        # the full pipeline over one chip's HBM (the reference's per-frame
        # python loop, RCDMs_pipeline.py:274-287, exists for the same reason
        # — ours stays inside the compiled program)
        z = latents.reshape((b * f,) + latents.shape[2:]) / self.vae_scale
        frames = jax.lax.map(
            lambda zi: self.vae.apply(params["vae"], zi[None],
                                      method=VAE.decode)[0], z)
        frames = frames.reshape((b, f) + frames.shape[1:])
        return jnp.clip(frames / 2 + 0.5, 0.0, 1.0), pred_embeds

    def generate_stage1_autoreg(self, params: dict, inputs: StoryInputs,
                                key: Array, white_clip: Array) -> Array:
        """Stage-1-only autoregressive generation (the reference's
        `--autoreg` protocol, `stage1_batchtest_rcdms_model.py:186-242`):
        one full sampling pass per frame; after pass i the predicted
        embedding of frame i is committed as a known-image condition and its
        mask embed flipped to the white-image CLIP embedding before pass
        i+1. `white_clip`: (224, 224, 3) CLIP-preprocessed white image.
        Returns (b, f, d) predicted embeddings."""
        th_c, te_c = self._encode_text(self.text_encoder_s1,
                                       params["text_s1"], inputs.tokens_s1)
        th_u, te_u = self._encode_text(self.text_encoder_s1,
                                       params["text_s1"], inputs.tokens_s1_u)
        _, src_embed = self._encode_images(params["vision"],
                                           inputs.source_clip)
        _, mask_embed = self._encode_images(params["vision"],
                                            inputs.mask_clip)
        _, white_embed = self.vision_encoder.apply(params["vision"],
                                                   white_clip[None])

        eos1 = self.text_encoder_s1.cfg.eos_token_id
        cond1 = PriorConditioning(
            text_embed=te_c, text_hidden=th_c,
            text_mask=_padding_mask(inputs.tokens_s1, eos1),
            text_embed_u=te_u, text_hidden_u=th_u,
            text_mask_u=_padding_mask(inputs.tokens_s1_u, eos1),
            image_embed=src_embed, mask_embed=mask_embed)
        b = src_embed.shape[0]
        white_embed = jnp.broadcast_to(white_embed, (b,) + white_embed.shape[1:])
        return self.prior_sampler.autoregressive(
            params["prior"], cond1, key, white_embed, inputs.frame_known)


def _padding_mask(tokens: Array, eos_token_id: int) -> Array:
    """True for real tokens (everything up to and including the first EOS) —
    the tokenizer's attention mask recomputed device-side."""
    is_eos = (tokens == eos_token_id).astype(jnp.int32)
    eos_pos = jnp.argmax(is_eos, axis=-1)
    has_eos = jnp.any(is_eos > 0, axis=-1)
    idx = jnp.arange(tokens.shape[-1])
    mask = idx[None, None, :] <= eos_pos[..., None]
    return jnp.where(has_eos[..., None], mask, jnp.ones_like(mask, bool))
