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
    # optional ('cfg','frame','space') inference mesh (train/sharding.py::
    # inference_mesh): CFG branches over 'cfg', frames over 'frame',
    # latent rows over 'space' (audited default: frame=1 — BASELINE.md r3)
    mesh: object = None
    # single-chip: run the two CFG branches as a lax.map over the context
    # pair instead of batch-doubling. Identical math and one UNet
    # compilation, but the conv batch is b*f instead of 2*b*f — measured
    # 10-26% faster per conv on v5e (XLA's conv tiling degrades at the
    # CFG-doubled batch of 10) and half the UNet activation memory. With a
    # mesh the batched form is kept (the 'cfg' axis shards it away).
    sequential_cfg: bool = True
    # OPT-IN approximate fast sampling ("Faster Diffusion", arXiv
    # 2312.09608 encoder propagation): recompute the UNet encoder (down
    # path) only every k-th step and reuse the cached encoder features on
    # the other steps — the decoder still sees the current step's time
    # embedding and latent-independent conditioning. k <= 1 (default 0) is
    # OFF = bit-exact reference math; k >= 2 CHANGES NUMERICS and must not
    # be used for the parity gate.
    encoder_propagation: int = 0

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
            # constrain the operands BEFORE the CFG-doubling concats:
            # upstream producers arrive all-device-sharded on dim 0/1, and
            # GSPMD cannot reshard through a concat without an involuntary
            # full rematerialization (replicate-then-slice; the
            # MULTICHIP_r03 dryrun tail) — pre-resharding each operand to
            # the concat output's non-cfg layout makes the concat local
            ctx_u = constrain(ctx_u, self.mesh, None, "frame")
            ctx_c = constrain(ctx_c, self.mesh, None, "frame")
            ml = constrain(cond.masked_latents, self.mesh,
                           None, "frame", "space")
            lbl = constrain(cond.mask_label, self.mesh,
                            None, "frame", "space")
            context = jnp.concatenate([ctx_u, ctx_c])
            masked_latents = jnp.concatenate([ml] * 2)
            mask_label = jnp.concatenate([lbl] * 2)
        else:
            context = ctx_c
            masked_latents, mask_label = cond.masked_latents, cond.mask_label
        context = constrain(context, self.mesh, "cfg", "frame")
        masked_latents = constrain(masked_latents, self.mesh,
                                   "cfg", "frame", "space")
        mask_label = constrain(mask_label, self.mesh, "cfg", "frame", "space")

        key, init_key = jax.random.split(key)
        if init_latents is None:
            init_latents = jax.random.normal(init_key, (b, f, h8, w8, 4))
        latents = init_latents * self.schedule.init_noise_sigma
        latents = constrain(latents, self.mesh, None, "frame", "space")

        ts = jnp.asarray(self.schedule.timesteps(self.num_steps))
        prev_ts = jnp.asarray(self.schedule.prev_timesteps(self.num_steps))

        prop = int(self.encoder_propagation or 0)
        use_prop = prop >= 2

        def call_unet(x, t, ctx, cache, is_key):
            """UNet forward; with encoder propagation the down path only
            runs when is_key, otherwise the cached features are decoded
            under the current time embedding."""
            tb = jnp.full((x.shape[0],), t, jnp.int32)
            if not use_prop:
                return self.unet.apply(unet_params, x, tb, ctx), cache
            temb = self.unet.apply(unet_params, tb,
                                   method=StoryUNet.time_embed)

            def key_fn(_):
                h, skips = self.unet.apply(unet_params, x, temb, ctx,
                                           method=StoryUNet.encode)
                return (h, tuple(skips))

            cache = jax.lax.cond(is_key, key_fn, lambda c: c, cache)
            h, skips = cache
            out = self.unet.apply(unet_params, h, list(skips), temb, ctx,
                                  method=StoryUNet.decode)
            return out, cache

        def init_cache(x_tmpl, ctx):
            """Zero cache matching encode's output types exactly (the scan
            carry and lax.cond branches must agree)."""
            if not use_prop:
                return ()
            t0 = jnp.zeros((x_tmpl.shape[0],), jnp.int32)
            shapes = jax.eval_shape(
                lambda xx, tt, cc: self.unet.apply(
                    unet_params, xx,
                    self.unet.apply(unet_params, tt,
                                    method=StoryUNet.time_embed),
                    cc, method=StoryUNet.encode), x_tmpl, t0, ctx)
            h_s, skips_s = shapes
            return (jnp.zeros(h_s.shape, h_s.dtype),
                    tuple(jnp.zeros(s.shape, s.dtype) for s in skips_s))

        def body(carry, step):
            lat, caches = carry
            i, t, prev_t = step
            is_key = (i % prop) == 0 if use_prop else jnp.bool_(True)
            if seq_cfg:
                # the 9-ch concat is branch-independent; only the context
                # differs — two explicit UNet calls (a lax.map would add
                # ~250 ms/story of output-stacking fusions)
                x = jnp.concatenate([lat, mask_label, masked_latents],
                                    axis=-1)
                cache_u, cache_c = caches
                pred_u, cache_u = call_unet(x, t, context[0], cache_u,
                                            is_key)
                pred_c, cache_c = call_unet(x, t, context[1], cache_c,
                                            is_key)
                caches = (cache_u, cache_c)
                pred = cfg_combine(pred_u, pred_c, self.guidance_scale)
            else:
                x = jnp.concatenate([lat] * 2) if do_cfg else lat
                x = jnp.concatenate([x, mask_label, masked_latents], axis=-1)
                x = constrain(x, self.mesh, "cfg", "frame", "space")
                (cache,) = caches
                pred, cache = call_unet(x, t, context, cache, is_key)
                caches = (cache,)
                pred = constrain(pred, self.mesh, "cfg", "frame", "space")
                if do_cfg:
                    pred_u, pred_c = jnp.split(pred, 2)
                    pred = cfg_combine(pred_u, pred_c, self.guidance_scale)
            noise = (jax.random.normal(jax.random.fold_in(key, i), lat.shape)
                     if self.eta > 0 else None)
            lat = self.schedule.step(pred, t, prev_t, lat, eta=self.eta,
                                     noise=noise)
            lat = constrain(lat, self.mesh, None, "frame", "space")
            return (lat, caches), None

        if not use_prop:
            caches0 = ((), ()) if seq_cfg else ((),)
        elif seq_cfg:
            x_tmpl = jnp.concatenate([latents, mask_label, masked_latents],
                                     axis=-1)
            caches0 = (init_cache(x_tmpl, context[0]),
                       init_cache(x_tmpl, context[1]))
        else:
            x2 = jnp.concatenate([latents] * 2) if do_cfg else latents
            x_tmpl = jnp.concatenate([x2, mask_label, masked_latents],
                                     axis=-1)
            caches0 = (init_cache(x_tmpl, context),)
        steps = (jnp.arange(self.num_steps), ts, prev_ts)
        (latents, _), _ = jax.lax.scan(body, (latents, caches0), steps)
        return latents
