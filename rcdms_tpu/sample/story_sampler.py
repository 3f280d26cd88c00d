"""Stage-2 sampler: generate the 5-frame story latents with the rich-
contextual UNet under CFG + DDIM, then the caller decodes via the VAE.

TPU-native re-design of `RCDMsPipeline.__call__`
(`src/pipelines/RCDMs_pipeline.py:374-517`): the fused-conditioning
computation runs once, and the whole CFG+concat+DDIM loop compiles into ONE
`lax.scan`. The 9-channel concat [noisy | mask | masked-source latents]
happens inside the scan exactly as the reference does per step (`:486`).
Mask routing is batch-safe (see models/fusion.py) — the reference's
`view(2,1,5,64,64)` batch-1 hack (`:476`) is gone."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rcdms_tpu.core.schedulers import DDIMSchedule, cfg_combine
from rcdms_tpu.models.fusion import FusionModule
from rcdms_tpu.models.unet3d import StoryUNet
from rcdms_tpu.train.sharding import constrain

Array = jax.Array


class StoryConditioning(NamedTuple):
    text_hidden: Array     # (b, f, T, text_dim) caption hidden states
    text_hidden_u: Array   # unconditional branch ("" captions)
    image_tokens: Array    # (b, f, 257, 1664) CLIP tokens of known frames
    image_proj: Array      # (b, f, 1280) stage-1 embeds for unknown frames
    frame_known: Array     # (b, f) bool
    masked_latents: Array  # (b, f, h8, w8, 4) VAE-encoded masked sources
    mask_label: Array      # (b, f, h8, w8, 1) {0,1} per-frame masks


@dataclass(frozen=True)
class StorySampler:
    unet: StoryUNet
    fusion: FusionModule
    schedule: DDIMSchedule = DDIMSchedule.stage2_inference()
    num_steps: int = 20           # reference eval default
    guidance_scale: float = 2.0   # reference eval default
    eta: float = 0.0
    # optional ('cfg','space') inference mesh (train/sharding.py::
    # inference_mesh): CFG branches over 'cfg', latent rows over 'space'
    mesh: object = None
    # single-chip: run the two CFG branches as a lax.map over the context
    # pair instead of batch-doubling. Identical math and one UNet
    # compilation, but the conv batch is b*f instead of 2*b*f — measured
    # 10-26% faster per conv on v5e (XLA's conv tiling degrades at the
    # CFG-doubled batch of 10) and half the UNet activation memory. With a
    # mesh the batched form is kept (the 'cfg' axis shards it away).
    sequential_cfg: bool = True

    def __call__(self, unet_params, fusion_params, cond: StoryConditioning,
                 key: Array, init_latents: Optional[Array] = None) -> Array:
        """Returns (b, f, h8, w8, 4) denoised story latents (still scaled by
        the VAE scaling factor)."""
        b, f, h8, w8, _ = cond.masked_latents.shape
        do_cfg = self.guidance_scale > 1.0

        # ---- fused conditioning, once, outside the loop -------------------
        ctx_c = self.fusion.apply(fusion_params, cond.image_tokens,
                                  cond.image_proj, cond.text_hidden,
                                  cond.frame_known)
        seq_cfg = do_cfg and self.sequential_cfg and self.mesh is None
        if do_cfg:
            ctx_u = self.fusion.apply(fusion_params, cond.image_tokens,
                                      cond.image_proj, cond.text_hidden_u,
                                      cond.frame_known)
        if seq_cfg:
            context = jnp.stack([ctx_u, ctx_c])  # (2, b, f, T, d)
            masked_latents, mask_label = cond.masked_latents, cond.mask_label
        elif do_cfg:
            context = jnp.concatenate([ctx_u, ctx_c])
            masked_latents = jnp.concatenate([cond.masked_latents] * 2)
            mask_label = jnp.concatenate([cond.mask_label] * 2)
        else:
            context = ctx_c
            masked_latents, mask_label = cond.masked_latents, cond.mask_label
        context = constrain(context, self.mesh, "cfg")
        masked_latents = constrain(masked_latents, self.mesh,
                                   "cfg", None, "space")
        mask_label = constrain(mask_label, self.mesh, "cfg", None, "space")

        key, init_key = jax.random.split(key)
        if init_latents is None:
            init_latents = jax.random.normal(init_key, (b, f, h8, w8, 4))
        latents = init_latents * self.schedule.init_noise_sigma
        latents = constrain(latents, self.mesh, None, None, "space")

        ts = jnp.asarray(self.schedule.timesteps(self.num_steps))
        prev_ts = jnp.asarray(self.schedule.prev_timesteps(self.num_steps))

        def body(carry, step):
            lat = carry
            i, t, prev_t = step
            if seq_cfg:
                # the 9-ch concat is branch-independent; only the context
                # differs — two explicit UNet calls (a lax.map would add
                # ~250 ms/story of output-stacking fusions)
                x = jnp.concatenate([lat, mask_label, masked_latents],
                                    axis=-1)
                tb = jnp.full((x.shape[0],), t, jnp.int32)
                pred_u = self.unet.apply(unet_params, x, tb, context[0])
                pred_c = self.unet.apply(unet_params, x, tb, context[1])
                pred = cfg_combine(pred_u, pred_c, self.guidance_scale)
            else:
                x = jnp.concatenate([lat] * 2) if do_cfg else lat
                x = jnp.concatenate([x, mask_label, masked_latents], axis=-1)
                x = constrain(x, self.mesh, "cfg", None, "space")
                tb = jnp.full((x.shape[0],), t, jnp.int32)
                pred = self.unet.apply(unet_params, x, tb, context)
                pred = constrain(pred, self.mesh, "cfg", None, "space")
                if do_cfg:
                    pred_u, pred_c = jnp.split(pred, 2)
                    pred = cfg_combine(pred_u, pred_c, self.guidance_scale)
            noise = (jax.random.normal(jax.random.fold_in(key, i), lat.shape)
                     if self.eta > 0 else None)
            lat = self.schedule.step(pred, t, prev_t, lat, eta=self.eta,
                                     noise=noise)
            lat = constrain(lat, self.mesh, None, None, "space")
            return lat, None

        steps = (jnp.arange(self.num_steps), ts, prev_ts)
        latents, _ = jax.lax.scan(body, latents, steps)
        return latents
