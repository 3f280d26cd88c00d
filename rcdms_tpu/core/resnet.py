"""Residual conv blocks and up/down sampling over (b, f, h, w, c) stories —
the reference `src/models/resnet.py:32-212` in TPU-native NHWC (per-frame 2D
ops are plain convs over the folded (b*f) axis; no bf16 interpolate
workarounds needed on TPU)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rcdms_tpu.core.layers import FrameConv, GroupNorm

Array = jax.Array


class ResnetBlock(nn.Module):
    """GN -> SiLU -> conv3x3 -> (+time emb) -> GN -> SiLU -> conv3x3, with a
    1x1 shortcut when channels change (`ResnetBlock3D`, resnet.py:109-212;
    `time_embedding_norm='default'`, output_scale_factor=1)."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None) -> Array:
        """x: (b, f, h, w, c); temb: (b, time_dim) or None."""
        from rcdms_tpu.core import layers as L

        in_channels = x.shape[-1]
        if L._use_cm_l0(in_channels, self.out_channels):
            # channel-major level-0 segment (RCDMS_L0_CONV=cm): one
            # pack/unpack per BLOCK, every conv (incl. the 1x1 shortcut)
            # at the pad-free dot rate (tools/cm_conv_study.py). Param
            # tree identical to the standard path
            # (_GNParams/_ConvParamsTree/)
            b, f, hh, ww, _ = x.shape
            s1, b1 = L._GNParams(in_channels, name="norm1")()
            k1, cb1 = L._ConvParamsTree(in_channels, self.out_channels,
                                        name="conv1")()
            s2, b2 = L._GNParams(self.out_channels, name="norm2")()
            k2, cb2 = L._ConvParamsTree(self.out_channels,
                                        self.out_channels, name="conv2")()
            xcm = L.cm_pack(x)
            h = L.cm_groupnorm(xcm, (hh, ww), self.groups, self.eps, s1, b1)
            h = nn.silu(h)
            h = L.cm_conv3(h, (hh, ww), k1, cb1, self.dtype)
            if temb is not None:
                t = nn.Dense(self.out_channels, dtype=self.dtype,
                             name="time_emb_proj")(nn.silu(temb))
                t = jnp.repeat(t, f, axis=0)          # (b*f, c)
                # masked add keeps the zero ring intact for conv2
                h = h + (t[:, :, None]
                         * L._cm_mask(hh, ww)).astype(h.dtype)
            h = L.cm_groupnorm(h, (hh, ww), self.groups, self.eps, s2, b2)
            h = nn.silu(h)
            h = L.cm_conv3(h, (hh, ww), k2, cb2, self.dtype)
            if in_channels != self.out_channels:
                ks, cbs = L._ConvParamsTree(in_channels, self.out_channels,
                                            ksize=1,
                                            name="conv_shortcut")()
                xcm = L.cm_conv1(xcm, (hh, ww), ks, cbs, self.dtype)
            out_shape = x.shape[:-1] + (self.out_channels,)
            return L.cm_unpack(xcm + h, out_shape)

        h = GroupNorm(self.groups, eps=self.eps, name="norm1")(x)
        h = nn.silu(h)
        h = FrameConv(self.out_channels, dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, None, :]
        h = GroupNorm(self.groups, eps=self.eps, name="norm2")(h)
        h = nn.silu(h)
        h = FrameConv(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = FrameConv(self.out_channels, kernel_size=1, padding=0,
                          dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    """Stride-2 3x3 conv per frame (`Downsample3D`, resnet.py:83-106)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return FrameConv(self.channels, kernel_size=3, stride=2, padding=1,
                         dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest x2 spatial upsample + 3x3 conv per frame
    (`Upsample3D`, resnet.py:32-80)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, f, h, w, c = x.shape
        # nearest-neighbor x2: repeat rows/cols (cheaper than jax.image.resize)
        y = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return FrameConv(self.channels, dtype=self.dtype, name="conv")(y)
