"""SD-v1.5 AutoencoderKL equivalent in NHWC — the frozen pixel<->latent
codec for stage 2 (reference loads it at `train_stage2.py:248` and decodes
per frame at `RCDMs_pipeline.py:274-287`).

Applied per frame: callers fold the story axis, (b, f, h, w, 3) ->
(b*f, h, w, 3). The reference's per-frame python decode loop becomes a
single batched call (XLA tiles the conv work; no CPU-offload/slicing
shims needed on TPU)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rcdms_tpu.configs import VAEConfig
from rcdms_tpu.core.layers import GroupNorm
from rcdms_tpu.ops.attention import dot_product_attention

Array = jax.Array


class VAEResnetBlock(nn.Module):
    """GN -> SiLU -> conv -> GN -> SiLU -> conv (+1x1 shortcut); no temb."""

    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        h = GroupNorm(self.groups, eps=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = GroupNorm(self.groups, eps=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head full self-attention over h*w at the bottleneck."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        res = x
        y = GroupNorm(self.groups, eps=1e-6, name="norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        o = dot_product_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        o = nn.Dense(c, dtype=self.dtype, name="to_out")(o)
        return res + o.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        h = nn.Conv(cfg.block_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for level, ch in enumerate(cfg.block_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnetBlock(ch, cfg.norm_groups, dtype=self.dtype,
                                   name=f"down_{level}_{j}")(h)
            if level != len(cfg.block_channels) - 1:
                # asymmetric pad (0,1) + stride-2 conv, SD Downsample2D
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=2, padding="VALID",
                            dtype=self.dtype,
                            name=f"down_{level}_downsample")(h)
        ch = cfg.block_channels[-1]
        h = VAEResnetBlock(ch, cfg.norm_groups, dtype=self.dtype,
                           name="mid_block_0")(h)
        h = VAEAttnBlock(cfg.norm_groups, dtype=self.dtype,
                         name="mid_attn")(h)
        h = VAEResnetBlock(ch, cfg.norm_groups, dtype=self.dtype,
                           name="mid_block_1")(h)
        h = GroupNorm(cfg.norm_groups, eps=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                    dtype=self.dtype, name="conv_out")(h)
        return nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype,
                       name="quant_conv")(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        cfg = self.cfg
        h = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype,
                    name="post_quant_conv")(z)
        rev = list(reversed(cfg.block_channels))
        ch = rev[0]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(h)
        h = VAEResnetBlock(ch, cfg.norm_groups, dtype=self.dtype,
                           name="mid_block_0")(h)
        h = VAEAttnBlock(cfg.norm_groups, dtype=self.dtype,
                         name="mid_attn")(h)
        h = VAEResnetBlock(ch, cfg.norm_groups, dtype=self.dtype,
                           name="mid_block_1")(h)
        for level, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnetBlock(ch, cfg.norm_groups, dtype=self.dtype,
                                   name=f"up_{level}_{j}")(h)
            if level != len(rev) - 1:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{level}_upsample")(h)
        h = GroupNorm(cfg.norm_groups, eps=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class VAE(nn.Module):
    """encode -> (mean, logvar); decode(z) -> image. Use `sample_latent` for
    the reparameterized draw and `scaling_factor` (0.18215) at call sites."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)

    def encode(self, x: Array) -> Tuple[Array, Array]:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: Array) -> Array:
        return self.decoder(z)

    def __call__(self, x: Array, noise: Array) -> Array:
        mean, logvar = self.encode(x)
        z = self.sample_latent(mean, logvar, noise)
        return self.decode(z)

    @staticmethod
    def sample_latent(mean: Array, logvar: Array, noise: Array) -> Array:
        return mean + jnp.exp(0.5 * logvar) * noise
