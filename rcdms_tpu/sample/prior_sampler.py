"""Stage-1 sampler: denoise the unknown frames' CLIP image embeddings with
the frame prior under classifier-free guidance and the UnCLIP scheduler.

TPU-native re-design of `Seq_Inpaint_Prior_Pipeline.__call__`
(`src/pipelines/prior_pipeline.py:246-373`): the whole denoising loop —
CFG batch-doubling, prior forward, guidance mix, UnCLIP step with explicit
prev_timestep — compiles into ONE `lax.scan` program; all randomness is an
explicit key (and `init_latents`/per-step noise can be injected for parity
testing)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rcdms_tpu.core.schedulers import UnCLIPSchedule, cfg_combine
from rcdms_tpu.models.prior import FramePrior
from rcdms_tpu.train.sharding import constrain

Array = jax.Array


class PriorConditioning(NamedTuple):
    """CFG-paired conditioning. `*_u` are the unconditional (empty-caption)
    branch; image/mask embeddings are shared between branches (the reference
    simply tiles them, `prior_pipeline.py:301-302`)."""

    text_embed: Array    # (b, f, d)
    text_hidden: Array   # (b, f, T, d)
    text_mask: Array     # (b, f, T) bool
    text_embed_u: Array
    text_hidden_u: Array
    text_mask_u: Array
    image_embed: Array   # (b, f, d) known-frame CLIP embeds (black if none)
    mask_embed: Array    # (b, f, d) white/black mask-image CLIP embeds


@dataclass(frozen=True)
class PriorSampler:
    model: FramePrior
    schedule: UnCLIPSchedule = UnCLIPSchedule()
    num_steps: int = 20          # reference default (`stage1_batchtest:284`)
    guidance_scale: float = 2.0  # reference default (`stage1_batchtest:286`)
    # optional ('cfg','frame','space') inference mesh. The frame axis maps
    # over BOTH 'frame' and 'space' (f=5 pads to the combined extent): under
    # the stage-2-optimal space4 mesh (cfg 2, frame 1, space 4) the prior
    # would otherwise shard only 2-way and dominate the sharded full-story
    # p50 (0.73 s/2 = 0.365 s vs stage-2's 2.18/8 — comm_audit --full).
    # Cost: the temporal modules' cross-frame attention all-gathers f per
    # step — audited, ~MBs per gather over ICI.
    mesh: object = None

    def __call__(self, params, cond: PriorConditioning, key: Array,
                 init_latents: Optional[Array] = None,
                 step_noise: Optional[Array] = None) -> Array:
        """Returns (b, f, embedding_dim) predicted CLIP image embeddings
        (denormalized, ready for stage 2).

        `init_latents` (b, f, d) and `step_noise` (num_steps, b, f, d) may be
        injected so parity tests can feed noise generated elsewhere (e.g. by
        the torch reference at equal seeds — SURVEY.md §7 'hard parts')."""
        b, f, _ = cond.text_embed.shape
        d = self.model.cfg.embedding_dim
        do_cfg = self.guidance_scale > 1.0

        key, init_key = jax.random.split(key)
        if init_latents is None:
            init_latents = jax.random.normal(init_key, (b, f, d))
        latents = init_latents * self.schedule.init_noise_sigma

        ts = jnp.asarray(self.schedule.timesteps(self.num_steps))
        prev_ts = jnp.asarray(self.schedule.prev_timesteps(self.num_steps))

        if do_cfg:
            # batch-doubled conditioning: [uncond | cond]. Operands are
            # pre-constrained to the concat output's non-cfg layout so the
            # concat partitions locally (GSPMD otherwise falls back to an
            # involuntary full rematerialization — replicate-then-slice)
            def pair(u, c):
                u = constrain(u, self.mesh, None, ("frame", "space"))
                c = constrain(c, self.mesh, None, ("frame", "space"))
                out = jnp.concatenate([u, c])
                return constrain(out, self.mesh, "cfg", ("frame", "space"))

            text_embed = pair(cond.text_embed_u, cond.text_embed)
            text_hidden = pair(cond.text_hidden_u, cond.text_hidden)
            text_mask = pair(cond.text_mask_u, cond.text_mask)
            image_embed = pair(cond.image_embed, cond.image_embed)
            mask_embed = pair(cond.mask_embed, cond.mask_embed)
        else:
            text_embed, text_hidden, text_mask = (
                cond.text_embed, cond.text_hidden, cond.text_mask)
            image_embed, mask_embed = cond.image_embed, cond.mask_embed

        def body(carry, step):
            lat = carry
            i, t, prev_t = step
            # pin the carry's layout: GSPMD otherwise back-propagates an
            # f-axis sharding into the carry and the CFG concat below needs
            # an involuntary full rematerialization to undo it
            lat = constrain(lat, self.mesh, None, ("frame", "space"))
            x = jnp.concatenate([lat] * 2) if do_cfg else lat
            x = constrain(x, self.mesh, "cfg", ("frame", "space"))
            tb = jnp.full(x.shape[:2], t, jnp.int32)
            pred = self.model.apply(
                params, x, tb, text_embed, text_hidden, image_embed,
                mask_embed, text_mask)
            if do_cfg:
                pred_u, pred_c = jnp.split(pred, 2)
                pred = cfg_combine(pred_u, pred_c, self.guidance_scale)
            if step_noise is None:
                noise = jax.random.normal(jax.random.fold_in(key, i),
                                          lat.shape)
            else:
                noise = step_noise[i]
            lat = self.schedule.step(pred, t, prev_t, lat, noise)
            return constrain(lat, self.mesh, None, ("frame", "space")), None

        steps = (jnp.arange(self.num_steps), ts, prev_ts)
        latents, _ = jax.lax.scan(body, latents, steps)
        return self.model.denormalize(latents)

    def autoregressive(self, params, cond: PriorConditioning, key: Array,
                       white_mask_embed: Array,
                       frame_known: Optional[Array] = None) -> Array:
        """One-frame-at-a-time generation (the reference's `--autoreg` loop,
        `stage1_batchtest_rcdms_model.py:186-242`): after each full sampling
        pass, the next unknown frame's predicted embedding is committed as a
        known-frame condition (and its mask flipped to 'known') before the
        next pass. `white_mask_embed`: (b, d) CLIP embedding of the white
        mask image. The per-frame known flag is inferred from mask_embed ==
        white_mask_embed being supplied by the caller through `cond`; here we
        just commit frames left-to-right starting from the first unknown one.

        Returns (b, f, d) embeddings: original conditions for known frames,
        autoregressively predicted for the rest."""
        f = cond.image_embed.shape[1]
        image_embed = cond.image_embed
        mask_embed = cond.mask_embed
        known = (frame_known if frame_known is not None else jnp.all(
            jnp.isclose(mask_embed, white_mask_embed[:, None, :]), axis=-1))

        result = image_embed
        for i in range(f):
            c = cond._replace(image_embed=image_embed, mask_embed=mask_embed)
            pred = self(params, c, jax.random.fold_in(key, i))
            commit = ~known[:, i]  # only unknown frames get committed
            new_frame = jnp.where(commit[:, None], pred[:, i],
                                  image_embed[:, i])
            result = result.at[:, i].set(new_frame)
            image_embed = image_embed.at[:, i].set(new_frame)
            mask_embed = mask_embed.at[:, i].set(
                jnp.where(commit[:, None], white_mask_embed,
                          mask_embed[:, i]))
        return result
