"""Stage-2 rich-contextual story UNet: SD-v1.5 UNet "inflated" over the
5-frame story axis with temporal attention after every spatial transformer,
and a 9-channel input concat [noisy latents | mask | masked-source latents].

TPU-native re-design of the reference `UNet3DConditionModel`
(`src/models/unet.py:37-462`) + `unet_blocks.py`: canonical NHWC
(b, f, h, w, c) layout, per-frame convs on the folded (b*f) axis, spatial
attention over h*w tokens per frame, temporal attention over f per pixel.
Gradient checkpointing = `nn.remat` over down/up sub-blocks (reference uses
torch.utils.checkpoint per submodule, `unet_blocks.py:389-409`)."""

from __future__ import annotations

from typing import Optional

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

    @nn.compact
    def __call__(self, sample: Array, timesteps: Array,
                 context: Array) -> Array:
        cfg = self.cfg
        ch0 = cfg.block_channels[0]
        n_levels = len(cfg.block_channels)

        # time embedding: sinusoidal(ch0) -> MLP(ch0*4)
        t_emb = sinusoidal_time_embedding(
            timesteps, ch0, flip_sin_to_cos=True,
            freq_shift=0.0).astype(self.dtype)
        temb = TimestepEmbedding(ch0 * 4, name="time_embedding")(t_emb)

        sub = _SubBlock
        if cfg.remat:
            sub = nn.remat(_SubBlock, static_argnums=())

        h = FrameConv(ch0, dtype=self.dtype, name="conv_in")(sample)

        # ---- down path -----------------------------------------------------
        skips = [h]
        for level, ch in enumerate(cfg.block_channels):
            use_cross = cfg.cross_attn_levels[level]
            for j in range(cfg.layers_per_block):
                h = sub(cfg, ch, use_cross, dtype=self.dtype,
                        name=f"down_{level}_{j}")(h, temb, context)
                skips.append(h)
            if level != n_levels - 1:
                h = Downsample(ch, dtype=self.dtype,
                               name=f"down_{level}_downsample")(h)
                skips.append(h)

        # ---- mid -------------------------------------------------------------
        mid_ch = cfg.block_channels[-1]
        h = ResnetBlock(mid_ch, groups=cfg.norm_groups, eps=cfg.norm_eps,
                        dtype=self.dtype, name="mid_resnet_0")(h, temb)
        h = SpatialTransformer(
            cfg.num_attention_heads, mid_ch // cfg.num_attention_heads,
            norm_groups=cfg.norm_groups, dtype=self.dtype,
            name="mid_attn")(h, context)
        if cfg.use_temporal and cfg.temporal_mid_block:
            h = TemporalModule(mid_ch, cfg.temporal, dtype=self.dtype,
                               name="mid_temporal")(h)
        h = ResnetBlock(mid_ch, groups=cfg.norm_groups, eps=cfg.norm_eps,
                        dtype=self.dtype, name="mid_resnet_1")(h, temb)

        # ---- up path ---------------------------------------------------------
        rev_channels = list(reversed(cfg.block_channels))
        rev_cross = list(reversed(cfg.cross_attn_levels))
        for level, ch in enumerate(rev_channels):
            use_cross = rev_cross[level]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = sub(cfg, ch, use_cross, dtype=self.dtype,
                        name=f"up_{level}_{j}")(h, temb, context)
            if level != n_levels - 1:
                h = Upsample(ch, dtype=self.dtype,
                             name=f"up_{level}_upsample")(h)

        # ---- out --------------------------------------------------------------
        h = GroupNorm(cfg.norm_groups, eps=cfg.norm_eps, name="conv_norm_out")(h)
        h = nn.silu(h)
        return FrameConv(cfg.out_channels, dtype=self.dtype,
                         name="conv_out")(h)
