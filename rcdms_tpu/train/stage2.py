"""Stage-2 training: epsilon-prediction MSE on story latents with the
rich-contextual UNet + fusion stacks trained jointly (the reference's
`SDModel`, `train_stage2.py:174-192`; hot loop `:413-521`).

The VAE/CLIP encodes are the frozen `encode_batch` pass; the trainable
pytree is {"unet": ..., "fusion": ...}."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rcdms_tpu.core.schedulers import DDPMSchedule
from rcdms_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
from rcdms_tpu.models.fusion import FusionModule
from rcdms_tpu.models.unet3d import StoryUNet
from rcdms_tpu.models.vae import VAE
from rcdms_tpu.train.train_state import TrainState

Array = jax.Array


class Stage2Batch(NamedTuple):
    latents: Array         # (b, f, h8, w8, 4) VAE(target) * 0.18215
    masked_latents: Array  # (b, f, h8, w8, 4) VAE(source) * 0.18215
    mask_label: Array      # (b, f, h8, w8, 1)
    image_tokens: Array    # (b, f, 257, 1664)
    image_proj: Array      # (b, f, 1280)
    text_hidden: Array     # (b, f, T, 768)
    frame_known: Array     # (b, f) bool


@dataclass(frozen=True)
class Stage2Trainer:
    unet: StoryUNet
    fusion: FusionModule
    schedule: DDPMSchedule = DDPMSchedule.stage2_train()
    noise_offset: float = 0.1

    def loss_fn(self, params, batch: Stage2Batch, key: Array) -> Array:
        b, f, h8, w8, c = batch.latents.shape
        k_noise, k_offset, k_t = jax.random.split(key, 3)

        noise = jax.random.normal(k_noise, batch.latents.shape)
        if self.noise_offset:
            # per-(story, frame, channel) offset (train_stage2.py:445-449)
            noise = noise + self.noise_offset * jax.random.normal(
                k_offset, (b, f, 1, 1, c))
        # one timestep per story (train_stage2.py:451-453)
        t = jax.random.randint(k_t, (b,), 0,
                               self.schedule.num_train_timesteps)
        noisy = self.schedule.add_noise(batch.latents, noise, t)

        context = self.fusion.apply(
            {"params": params["params"]["fusion"]},
            batch.image_tokens, batch.image_proj, batch.text_hidden,
            batch.frame_known)
        x = jnp.concatenate([noisy, batch.mask_label, batch.masked_latents],
                            axis=-1)
        pred = self.unet.apply({"params": params["params"]["unet"]},
                               x, t, context)
        return jnp.mean((pred.astype(jnp.float32)
                         - noise.astype(jnp.float32)) ** 2)

    def train_step(self, state: TrainState, batch: Stage2Batch,
                   key: Array) -> Tuple[TrainState, Array]:
        loss, grads = jax.value_and_grad(self.loss_fn)(state.params, batch,
                                                       key)
        return state.apply_gradients(grads), loss

    def init_params(self, key: Array, batch: Stage2Batch) -> dict:
        """Joint trainable pytree {"params": {"unet", "fusion"}}."""
        b, f, h8, w8, _ = batch.latents.shape
        ku, kf = jax.random.split(key)
        x = jnp.concatenate(
            [batch.latents, batch.mask_label, batch.masked_latents], axis=-1)
        unet_p = self.unet.init(ku, x, jnp.zeros((b,), jnp.int32),
                                jnp.zeros(batch.text_hidden.shape[:3]
                                          + (self.unet.cfg.cross_attention_dim,
                                             )))
        fusion_p = self.fusion.init(kf, batch.image_tokens, batch.image_proj,
                                    batch.text_hidden, batch.frame_known)
        return {"params": {"unet": unet_p["params"],
                           "fusion": fusion_p["params"]}}


def encode_batch(vae: VAE, vae_params,
                 text_encoder: CLIPTextEncoder, text_params,
                 vision_encoder: CLIPVisionEncoder, vision_params,
                 raw: dict, key: Array,
                 vae_scale: float = 0.18215) -> Stage2Batch:
    """Frozen-encoder pass mirroring `train_stage2.py:421-476` (no_grad):
    VAE-encode targets and masked sources (sampled posteriors), CLIP-encode
    captions (768 tower) and reference frames (bigG tokens + projection)."""
    k1, k2 = jax.random.split(key)

    def vae_encode(x, k):
        b, f = x.shape[:2]
        mean, logvar = vae.apply(vae_params,
                                 x.reshape((b * f,) + x.shape[2:]),
                                 method=VAE.encode)
        z = VAE.sample_latent(mean, logvar,
                              jax.random.normal(k, mean.shape)) * vae_scale
        return z.reshape((b, f) + z.shape[1:])

    ids = raw["input_ids"]
    b, f, t = ids.shape
    hidden, _ = text_encoder.apply(text_params, ids.reshape(b * f, t))

    ref = raw["reference_clip"]
    tokens, embeds = vision_encoder.apply(
        vision_params, ref.reshape((b * f,) + ref.shape[2:]))

    latents = vae_encode(raw["target"], k1)
    # mask maps at LATENT resolution (the dataset's size/8 maps assume the
    # SD VAE's 8x factor; rebuild from the per-frame flag so any VAE works)
    h8, w8 = latents.shape[2:4]
    mask_label = jnp.broadcast_to(
        raw["frame_known"][:, :, None, None, None].astype(latents.dtype),
        (b, f, h8, w8, 1))

    return Stage2Batch(
        latents=latents,
        masked_latents=vae_encode(raw["source"], k2),
        mask_label=mask_label,
        image_tokens=tokens.reshape((b, f) + tokens.shape[1:]),
        image_proj=embeds.reshape(b, f, -1),
        text_hidden=hidden.reshape(b, f, t, -1),
        frame_known=raw["frame_known"],
    )
