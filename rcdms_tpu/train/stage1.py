"""Stage-1 training: denoise CLIP frame embeddings with the frame prior.

TPU-native re-design of the `train_stage1.py:300-406` hot loop: one pure
`train_step(state, batch, key)` under jit over the ('data',) mesh — the
frozen-encoder passes live in `encode_batch` (also jitted, frozen params),
DeepSpeed ZeRO-2 becomes sharded optimizer state (train/sharding.py), the
fp16 loss-scaling machinery disappears (bf16 on TPU), and
`accelerator.gather` of the loss becomes the jit-internal mean (a psum XLA
inserts)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rcdms_tpu.core.schedulers import DDPMSchedule
from rcdms_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
from rcdms_tpu.models.prior import FramePrior
from rcdms_tpu.train.train_state import TrainState

Array = jax.Array


class Stage1Batch(NamedTuple):
    """Frozen-encoder outputs feeding the prior (see `encode_batch`)."""

    target_embed: Array  # (b, f, d)  CLIP embeds of ALL real frames
    source_embed: Array  # (b, f, d)  CLIP embeds of known/black frames
    mask_embed: Array    # (b, f, d)  CLIP embeds of white/black mask images
    text_embed: Array    # (b, f, d)
    text_hidden: Array   # (b, f, T, d)
    text_mask: Array     # (b, f, T) bool


@dataclass(frozen=True)
class Stage1Trainer:
    model: FramePrior
    schedule: DDPMSchedule = DDPMSchedule.stage1_train()
    noise_offset: float = 0.1

    def loss_fn(self, params, batch: Stage1Batch, key: Array) -> Array:
        b, f, d = batch.target_embed.shape
        k_noise, k_offset, k_t = jax.random.split(key, 3)

        target = self.model.normalize(batch.target_embed)
        noise = jax.random.normal(k_noise, target.shape)
        if self.noise_offset:
            # per-frame scalar offset (train_stage1.py:339-341)
            noise = noise + self.noise_offset * jax.random.normal(
                k_offset, (b, f, 1))
        # independent timestep per frame (train_stage1.py:344-347)
        t = jax.random.randint(k_t, (b, f), 0,
                               self.schedule.num_train_timesteps)
        noisy = self.schedule.add_noise(target, noise, t)

        pred = self.model.apply(params, noisy, t, batch.text_embed,
                                batch.text_hidden, batch.source_embed,
                                batch.mask_embed, batch.text_mask)
        return jnp.mean((pred.astype(jnp.float32)
                         - target.astype(jnp.float32)) ** 2)

    def train_step(self, state: TrainState, batch: Stage1Batch,
                   key: Array) -> Tuple[TrainState, Array]:
        loss, grads = jax.value_and_grad(self.loss_fn)(state.params, batch,
                                                       key)
        return state.apply_gradients(grads), loss


def encode_batch(text_encoder: CLIPTextEncoder, text_params,
                 vision_encoder: CLIPVisionEncoder, vision_params,
                 raw: dict) -> Stage1Batch:
    """Frozen-encoder pass: raw protocol batch (data/protocol.py keys) ->
    Stage1Batch. Mirrors `train_stage1.py:307-333` (no_grad region)."""
    def enc_img(x):
        b, f = x.shape[:2]
        _, embeds = vision_encoder.apply(vision_params,
                                         x.reshape((b * f,) + x.shape[2:]))
        return embeds.reshape(b, f, -1)

    ids = raw["input_ids"]
    b, f, t = ids.shape
    hidden, embeds = text_encoder.apply(text_params, ids.reshape(b * f, t))
    return Stage1Batch(
        target_embed=enc_img(raw["reference_clip"]),
        source_embed=enc_img(raw["source_clip"]),
        mask_embed=enc_img(raw["mask_clip"]),
        text_embed=embeds.reshape(b, f, -1),
        text_hidden=hidden.reshape(b, f, t, -1),
        text_mask=raw["text_mask"],
    )
