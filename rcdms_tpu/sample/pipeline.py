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
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rcdms_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
from rcdms_tpu.models.vae import VAE
from rcdms_tpu.sample.prior_sampler import PriorConditioning, PriorSampler
from rcdms_tpu.sample.story_sampler import StoryConditioning, StorySampler
from rcdms_tpu.train.sharding import constrain

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


class CondCache(NamedTuple):
    """Checkpoint-constant conditioning, precomputed once per loaded model
    (`StoryPipeline.precompute_cond_cache`).

    The reference re-encodes all of this per story: the white/black mask
    CLIP images through the ViT-bigG tower
    (`stage1_batchtest_rcdms_model.py:160-178`) and the "" negative prompt
    through both text towers (`prior_pipeline.py:283-285`,
    `RCDMs_pipeline.py:421-423`) — but none of it depends on the story,
    only on the frozen towers. Hoisting it out cuts the per-story vision
    batch from 2·f to f images and each text tower from 2·f to f captions
    (exact: the same towers on the same inputs).

    s1_hidden_u: (T1, d1)  stage-1 text tower last_hidden_state of the
                           uncond caption
    s1_embed_u:  (d1,)     its text projection
    s2_hidden_u: (T2, d2)  stage-2 text tower last_hidden_state
    white_embed: (d,)      CLIP image embed of the white mask image
    black_embed: (d,)      CLIP image embed of the black mask image
    """

    s1_hidden_u: Array
    s1_embed_u: Array
    s2_hidden_u: Array
    white_embed: Array
    black_embed: Array


@dataclass(frozen=True)
class StoryPipeline:
    text_encoder_s1: CLIPTextEncoder
    text_encoder_s2: CLIPTextEncoder
    vision_encoder: CLIPVisionEncoder
    vae: VAE
    prior_sampler: PriorSampler
    story_sampler: StorySampler
    vae_scale: float = 0.18215
    # optional ('cfg','space') inference mesh (train/sharding.py::
    # inference_mesh). Encoders/VAE shard their (b*f) image batches over the
    # whole mesh; the samplers carry their own mesh-aware constraints.
    mesh: object = None

    def _all_devices(self, x: Array) -> Array:
        # leading axis over every mesh device (uneven sizes are padded by
        # GSPMD — 5 frames over 8 devices is fine)
        return constrain(x, self.mesh, ("cfg", "frame", "space"))

    def _spatial(self, x: Array) -> Array:
        # NHWC image/latent batch with H over every device (GSPMD inserts
        # the conv halo exchanges). Used for the VAE: its batch is b*f=5
        # (doesn't divide 8, so batch sharding forces replicate-then-slice
        # reshards at both sampler boundaries — the MULTICHIP_r03
        # involuntary-rematerialization warnings), while the H axis both
        # divides evenly at every scale AND matches the samplers' 'space'
        # row sharding, so the latents flow through without resharding.
        return constrain(x, self.mesh, None, ("cfg", "frame", "space"))

    def _encode_text_pair(self, encoder, params, tokens: Array,
                          tokens_u: Array):
        """One tower forward for the [cond | uncond] caption pair: 2x the
        matmul batch, half the dispatches vs two calls (the encoders are
        ~0.19 s of the single-chip full-pipeline p50 — BASELINE.md)."""
        b, f, t = tokens.shape
        both = jnp.concatenate([tokens, tokens_u]).reshape(2 * b * f, t)
        hidden, embeds = encoder.apply(params, self._all_devices(both))
        hidden = hidden.reshape(2, b, f, t, -1)
        embeds = embeds.reshape(2, b, f, -1)
        return (hidden[0], embeds[0]), (hidden[1], embeds[1])

    def _encode_text(self, encoder, params, tokens: Array):
        """One tower forward for the cond captions only (the uncond side
        comes from a CondCache)."""
        b, f, t = tokens.shape
        hidden, embeds = encoder.apply(
            params, self._all_devices(tokens.reshape(b * f, t)))
        return hidden.reshape(b, f, t, -1), embeds.reshape(b, f, -1)

    def precompute_cond_cache(self, params: dict, tokens_u_s1: Array,
                              tokens_u_s2: Array, white_clip: Array,
                              black_clip: Array) -> CondCache:
        """Run the frozen towers once over the story-independent
        conditioning (see CondCache). tokens_u_s1/s2: (T,) int32 uncond
        caption rows; white_clip/black_clip: (c, c, 3) CLIP-preprocessed
        constant mask images (`data/protocol.py::_cached_const`)."""
        h1, e1 = self.text_encoder_s1.apply(params["text_s1"],
                                            tokens_u_s1[None])
        h2, _ = self.text_encoder_s2.apply(params["text_s2"],
                                           tokens_u_s2[None])
        _, emb = self.vision_encoder.apply(
            params["vision"], jnp.stack([white_clip, black_clip]))
        return CondCache(s1_hidden_u=h1[0], s1_embed_u=e1[0],
                         s2_hidden_u=h2[0], white_embed=emb[0],
                         black_embed=emb[1])

    def _encode_images(self, params, images: Array, images2: Array = None):
        """CLIP-vision encode; pass `images2` to fold a second (b, f) image
        batch into the same tower forward (returns a pair of results)."""
        b, f = images.shape[:2]
        flat = images.reshape((b * f,) + images.shape[2:])
        if images2 is not None:
            flat = jnp.concatenate(
                [flat, images2.reshape((b * f,) + images2.shape[2:])])
        tokens, embeds = self.vision_encoder.apply(
            params, self._all_devices(flat))
        tokens = tokens.reshape((-1, b, f) + tokens.shape[1:])
        embeds = embeds.reshape(-1, b, f, embeds.shape[-1])
        if images2 is None:
            return tokens[0], embeds[0]
        return (tokens[0], embeds[0]), (tokens[1], embeds[1])

    def generate(self, params: dict, inputs: StoryInputs, key: Array,
                 cond_cache: Optional[CondCache] = None):
        """params keys: text_s1, text_s2, vision, vae, prior, unet, fusion.
        `cond_cache` (precompute_cond_cache) replaces the uncond text
        encodes and the white/black mask-image encodes with their cached
        values — exact, and ~half the encoder work per story.
        Returns (images in [0,1] (b, f, H, W, 3), predicted stage-1 embeds)."""
        key1, key2, key_vae = jax.random.split(key, 3)
        b, f = inputs.frame_known.shape

        # ---- stage 1: predict CLIP embeddings for unknown frames ----------
        if cond_cache is None:
            (th_c, te_c), (th_u, te_u) = self._encode_text_pair(
                self.text_encoder_s1, params["text_s1"],
                inputs.tokens_s1, inputs.tokens_s1_u)
            (src_tokens, src_embed), (_, mask_embed) = self._encode_images(
                params["vision"], inputs.source_clip, inputs.mask_clip)
        else:
            th_c, te_c = self._encode_text(
                self.text_encoder_s1, params["text_s1"], inputs.tokens_s1)
            th_u = jnp.broadcast_to(cond_cache.s1_hidden_u, (b, f)
                                    + cond_cache.s1_hidden_u.shape)
            te_u = jnp.broadcast_to(cond_cache.s1_embed_u, (b, f)
                                    + cond_cache.s1_embed_u.shape)
            src_tokens, src_embed = self._encode_images(
                params["vision"], inputs.source_clip)
            # mask_clip is white(known)/black(unknown) by protocol
            # (data/protocol.py::build_story_example) — select the cached
            # embeds by the same flag instead of re-encoding 5 constants
            mask_embed = jnp.where(inputs.frame_known[..., None],
                                   cond_cache.white_embed,
                                   cond_cache.black_embed)

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
        if cond_cache is None:
            (th2_c, _), (th2_u, _) = self._encode_text_pair(
                self.text_encoder_s2, params["text_s2"],
                inputs.tokens_s2, inputs.tokens_s2_u)
        else:
            th2_c, _ = self._encode_text(
                self.text_encoder_s2, params["text_s2"], inputs.tokens_s2)
            th2_u = jnp.broadcast_to(cond_cache.s2_hidden_u, (b, f)
                                     + cond_cache.s2_hidden_u.shape)

        px = inputs.source_pixels
        mean, logvar = self.vae.apply(
            params["vae"],
            self._spatial(px.reshape((b * f,) + px.shape[2:])),
            method=VAE.encode)
        noise = jax.random.normal(key_vae, mean.shape)
        masked_latents = VAE.sample_latent(mean, logvar, noise) * self.vae_scale
        masked_latents = self._spatial(masked_latents).reshape(
            (b, f) + masked_latents.shape[1:])
        masked_latents = constrain(masked_latents, self.mesh,
                                   None, "frame", "space")
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

        # pin the fold-reshape's input layout (frame/space kept in place),
        # then hand the decoder an H-sharded batch: 'space' 4-way -> full
        # 8-way on the SAME axis is a local slice, so no reshard at all
        latents = constrain(latents, self.mesh, None, "frame", "space")
        z = latents.reshape((b * f,) + latents.shape[2:]) / self.vae_scale
        if self.mesh is not None:
            # sharded: one batched decode with H over all devices (same
            # spatial scheme as encode; per-device activations are 1/8th)
            frames = self.vae.apply(params["vae"], self._spatial(z),
                                    method=VAE.decode)
        else:
            # decode sequentially per frame (lax.map): peak decoder
            # activations at 512px are ~5x smaller than a batched decode,
            # which is what tips the full pipeline over one chip's HBM (the
            # reference's per-frame python loop, RCDMs_pipeline.py:274-287,
            # exists for the same reason — ours stays inside the compiled
            # program)
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
        (th_c, te_c), (th_u, te_u) = self._encode_text_pair(
            self.text_encoder_s1, params["text_s1"],
            inputs.tokens_s1, inputs.tokens_s1_u)
        (_, src_embed), (_, mask_embed) = self._encode_images(
            params["vision"], inputs.source_clip, inputs.mask_clip)
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


def build_tiny_pipeline(key: Optional[Array] = None,
                        mesh: object = None,
                        num_steps: int = 2,
                        num_frames: int = 5,
                        unet_channels: Optional[tuple] = None):
    """Tiny random-weights two-stage pipeline + params + example inputs —
    shared by the unit tests, the multichip dryrun, and smoke benches.
    `num_frames` demonstrates story lengths != 5 (the reference hardcodes
    5 throughout — `motion_module.py:151`, `RCDMs_pipeline.py:261`)."""
    import dataclasses

    from rcdms_tpu.configs import (
        CLIPTextConfig,
        CLIPVisionConfig,
        FusionConfig,
        PriorConfig,
        StoryUNetConfig,
        VAEConfig,
    )
    from rcdms_tpu.models.fusion import FusionModule
    from rcdms_tpu.models.prior import FramePrior
    from rcdms_tpu.models.unet3d import StoryUNet

    key = key if key is not None else jax.random.PRNGKey(0)
    prior_cfg = PriorConfig.tiny(num_frames=num_frames)
    ukw = {"block_channels": unet_channels} if unet_channels else {}
    # lane-aligned channels (e.g. (64, 128)) let the taps9/int8 conv
    # formulations engage on tiny models — the parity gate's dry-run uses
    # this; default tiny stays (32, 64)
    unet_cfg = StoryUNetConfig.tiny(num_frames=num_frames, **ukw)
    if num_frames > prior_cfg.temporal.max_frames:
        # temporal PE table must cover the story length
        prior_cfg = dataclasses.replace(
            prior_cfg, temporal=dataclasses.replace(
                prior_cfg.temporal, max_frames=num_frames))
        unet_cfg = dataclasses.replace(
            unet_cfg, temporal=dataclasses.replace(
                unet_cfg.temporal, max_frames=num_frames))
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

    f, img, cimg = num_frames, 32, v_cfg.image_size
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
        prior_sampler=PriorSampler(prior, num_steps=num_steps,
                                   guidance_scale=2.0, mesh=mesh),
        story_sampler=StorySampler(unet, fusion, num_steps=num_steps,
                                   guidance_scale=2.0, mesh=mesh),
        mesh=mesh)

    inputs = StoryInputs(
        tokens_s1=ids, tokens_s1_u=ids, tokens_s2=ids, tokens_s2_u=ids,
        source_clip=jax.random.normal(ks[7], (1, f, cimg, cimg, 3)),
        mask_clip=jnp.zeros((1, f, cimg, cimg, 3)),
        source_pixels=jnp.zeros((1, f, img, img, 3)),
        frame_known=(jnp.arange(f) < 1)[None],
    )
    return pipeline, params, inputs


def _padding_mask(tokens: Array, eos_token_id: int) -> Array:
    """True for real tokens (everything up to and including the first EOS) —
    the tokenizer's attention mask recomputed device-side."""
    is_eos = (tokens == eos_token_id).astype(jnp.int32)
    eos_pos = jnp.argmax(is_eos, axis=-1)
    has_eos = jnp.any(is_eos > 0, axis=-1)
    idx = jnp.arange(tokens.shape[-1])
    mask = idx[None, None, :] <= eos_pos[..., None]
    return jnp.where(has_eos[..., None], mask, jnp.ones_like(mask, bool))
