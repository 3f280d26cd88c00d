"""Stage-2 rich-contextual story UNet: SD-v1.5 UNet "inflated" over the
5-frame story axis with temporal attention after every spatial transformer,
and a 9-channel input concat [noisy latents | mask | masked-source latents].

TPU-native re-design of the reference `UNet3DConditionModel`
(`src/models/unet.py:37-462`) + `unet_blocks.py`: canonical NHWC
(b, f, h, w, c) layout, per-frame convs on the folded (b*f) axis, spatial
attention over h*w tokens per frame, temporal attention over f per pixel.
Gradient checkpointing = `nn.remat` over down/up sub-blocks (reference uses
torch.utils.checkpoint per submodule, `unet_blocks.py:389-409`).

The forward is split into `encode` (conv_in + down path) and `decode`
(mid + up path + head) sharing one parameter tree, which enables the
opt-in encoder-propagation fast sampler (sample/story_sampler.py): on
non-key steps the decoder runs on cached encoder features with the current
step's time embedding."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rcdms_tpu.configs import StoryUNetConfig
from rcdms_tpu.core.attention import SpatialTransformer
from rcdms_tpu.core.layers import (
    FrameConv,
    GroupNorm,
    TimestepEmbedding,
    sinusoidal_time_embedding,
)
from rcdms_tpu.core.resnet import Downsample, ResnetBlock, Upsample
from rcdms_tpu.core.temporal import TemporalModule

Array = jax.Array


class _SubBlock(nn.Module):
    """resnet -> [spatial transformer] -> [temporal module] — one unit of a
    down/up level (remat boundary)."""

    cfg: StoryUNetConfig
    out_channels: int
    use_cross: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Array, context: Array) -> Array:
        cfg = self.cfg
        x = ResnetBlock(self.out_channels, groups=cfg.norm_groups,
                        eps=cfg.norm_eps, dtype=self.dtype, name="resnet")(
                            x, temb)
        if self.use_cross:
            x = SpatialTransformer(
                cfg.num_attention_heads,
                self.out_channels // cfg.num_attention_heads,
                norm_groups=cfg.norm_groups, dtype=self.dtype,
                name="attn")(x, context)
            if cfg.use_temporal:
                x = TemporalModule(self.out_channels, cfg.temporal,
                                   dtype=self.dtype, name="temporal")(x)
        elif cfg.use_temporal:
            x = TemporalModule(self.out_channels, cfg.temporal,
                               dtype=self.dtype, name="temporal")(x)
        return x


class StoryUNet(nn.Module):
    """Inputs:
      sample:    (b, f, h, w, in_channels=9)
      timesteps: (b,) int32 — one timestep per story (`train_stage2.py:451`)
      context:   (b, f, T, cross_attention_dim) fused text/image features

    Returns (b, f, h, w, out_channels=4) epsilon prediction."""

    cfg: StoryUNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        ch0 = cfg.block_channels[0]
        n_levels = len(cfg.block_channels)
        sub = _SubBlock
        if cfg.remat:
            sub = nn.remat(_SubBlock, static_argnums=())

        self.time_embedding = TimestepEmbedding(ch0 * 4)
        self.conv_in = FrameConv(ch0, dtype=self.dtype)

        for level, ch in enumerate(cfg.block_channels):
            use_cross = cfg.cross_attn_levels[level]
            for j in range(cfg.layers_per_block):
                setattr(self, f"down_{level}_{j}",
                        sub(cfg, ch, use_cross, dtype=self.dtype))
            if level != n_levels - 1:
                setattr(self, f"down_{level}_downsample",
                        Downsample(ch, dtype=self.dtype))

        mid_ch = cfg.block_channels[-1]
        self.mid_resnet_0 = ResnetBlock(mid_ch, groups=cfg.norm_groups,
                                        eps=cfg.norm_eps, dtype=self.dtype)
        self.mid_attn = SpatialTransformer(
            cfg.num_attention_heads, mid_ch // cfg.num_attention_heads,
            norm_groups=cfg.norm_groups, dtype=self.dtype)
        if cfg.use_temporal and cfg.temporal_mid_block:
            self.mid_temporal = TemporalModule(mid_ch, cfg.temporal,
                                               dtype=self.dtype)
        self.mid_resnet_1 = ResnetBlock(mid_ch, groups=cfg.norm_groups,
                                        eps=cfg.norm_eps, dtype=self.dtype)

        rev_channels = list(reversed(cfg.block_channels))
        rev_cross = list(reversed(cfg.cross_attn_levels))
        for level, ch in enumerate(rev_channels):
            for j in range(cfg.layers_per_block + 1):
                setattr(self, f"up_{level}_{j}",
                        sub(cfg, ch, rev_cross[level], dtype=self.dtype))
            if level != n_levels - 1:
                setattr(self, f"up_{level}_upsample",
                        Upsample(ch, dtype=self.dtype))

        self.conv_norm_out = GroupNorm(cfg.norm_groups, eps=cfg.norm_eps)
        self.conv_out = FrameConv(cfg.out_channels, dtype=self.dtype)

    def time_embed(self, timesteps: Array) -> Array:
        """(b,) int32 -> (b, ch0*4) time embedding."""
        ch0 = self.cfg.block_channels[0]
        t_emb = sinusoidal_time_embedding(
            timesteps, ch0, flip_sin_to_cos=True,
            freq_shift=0.0).astype(self.dtype)
        return self.time_embedding(t_emb)

    def encode(self, sample: Array, temb: Array,
               context: Array) -> Tuple[Array, Sequence[Array]]:
        """conv_in + down path -> (bottleneck h, skip stack)."""
        cfg = self.cfg
        n_levels = len(cfg.block_channels)
        h = self.conv_in(sample)
        skips = [h]
        for level in range(n_levels):
            for j in range(cfg.layers_per_block):
                h = getattr(self, f"down_{level}_{j}")(h, temb, context)
                skips.append(h)
            if level != n_levels - 1:
                h = getattr(self, f"down_{level}_downsample")(h)
                skips.append(h)
        return h, skips

    def decode(self, h: Array, skips: Sequence[Array], temb: Array,
               context: Array) -> Array:
        """mid + up path + output head (consumes the skip stack)."""
        cfg = self.cfg
        n_levels = len(cfg.block_channels)
        skips = list(skips)
        h = self.mid_resnet_0(h, temb)
        h = self.mid_attn(h, context)
        if cfg.use_temporal and cfg.temporal_mid_block:
            h = self.mid_temporal(h)
        h = self.mid_resnet_1(h, temb)

        for level in range(n_levels):
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = getattr(self, f"up_{level}_{j}")(h, temb, context)
            if level != n_levels - 1:
                h = getattr(self, f"up_{level}_upsample")(h)

        h = self.conv_norm_out(h)
        h = nn.silu(h)
        return self.conv_out(h)

    def __call__(self, sample: Array, timesteps: Array,
                 context: Array) -> Array:
        temb = self.time_embed(timesteps)
        h, skips = self.encode(sample, temb, context)
        return self.decode(h, skips, temb, context)
