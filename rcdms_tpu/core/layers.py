"""Core NN primitives (flax.linen), TPU-native NHWC / token layouts.

Replaces the reference's L1 layer (`src/models/resnet.py`,
`attention.py`, diffusers embeddings). The reference's "inflated" 2D-per-
frame ops (`InflatedConv3d`/`InflatedGroupNorm`, `resnet.py:10-29`) become
plain NHWC ops applied over a folded ``(b*f, h, w, c)`` view — no einops
churn in model code.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


# ---------------------------------------------------------------------------
# Timestep embeddings (diffusers Timesteps + TimestepEmbedding semantics)
# ---------------------------------------------------------------------------


def sinusoidal_time_embedding(timesteps: Array, dim: int,
                              flip_sin_to_cos: bool = True,
                              freq_shift: float = 0.0,
                              max_period: float = 10000.0) -> Array:
    """diffusers `get_timestep_embedding` semantics. timesteps: (batch,).
    Returns (batch, dim) float32."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP over the sinusoidal projection
    (diffusers `TimestepEmbedding`)."""

    time_embed_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: Array) -> Array:
        out_dim = self.out_dim or self.time_embed_dim
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        h = nn.silu(h)
        return nn.Dense(out_dim, dtype=self.dtype, name="linear_2")(h)


def temporal_positional_encoding(num_frames: int, dim: int) -> Array:
    """Sinusoidal PE over the frame axis (reference
    `motion_module.py:249-267`, max_len=5). Returns (num_frames, dim) f32."""
    position = jnp.arange(num_frames, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                       * (-math.log(10000.0) / dim))
    args = position * div_term
    pe = jnp.zeros((num_frames, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(args))
    pe = pe.at[:, 1::2].set(jnp.cos(args[:, : (dim + 1) // 2][:, : dim // 2]))
    return pe


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


class GroupNorm(nn.Module):
    """GroupNorm over the trailing `spatial_axes + channel` dims with stats
    computed independently for every leading index — so a ``(b, f, h, w, c)``
    input gets per-frame statistics (the reference's InflatedGroupNorm).
    Stats in fp32 regardless of compute dtype."""

    num_groups: int = 32
    eps: float = 1e-5
    spatial_axes: int = 2  # number of spatial dims before channels
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        # Keep the (..., c) layout end to end: a (..., g, c/g) view would put
        # c/g (e.g. 10) in the TPU lane dim and pad it ~13x. Reduce over
        # spatial in native layout, then group the tiny per-channel moments.
        spatial_axes = tuple(range(x.ndim - 1 - self.spatial_axes, x.ndim - 1))
        s1 = jnp.mean(xf, axis=spatial_axes)            # (lead, c)
        s2 = jnp.mean(xf * xf, axis=spatial_axes)       # (lead, c)
        lead = s1.shape[:-1]
        mean_g = s1.reshape(lead + (g, c // g)).mean(-1)
        ex2_g = s2.reshape(lead + (g, c // g)).mean(-1)
        var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
        mean_c = jnp.repeat(mean_g, c // g, axis=-1)    # (lead, c)
        inv_c = jnp.repeat(jax.lax.rsqrt(var_g + self.eps), c // g, axis=-1)

        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # fold affine into the broadcast factors: one fused elementwise pass
        mul = inv_c * scale                             # (lead, c)
        add = bias - mean_c * mul
        expand = (slice(None),) * len(lead) + (None,) * self.spatial_axes
        return (xf * mul[expand] + add[expand]).astype(orig_dtype)


class LayerNorm(nn.Module):
    """fp32-stats LayerNorm that casts back to the compute dtype."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        orig_dtype = x.dtype
        y = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln")(
                             x.astype(jnp.float32))
        return y.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Feed-forward (diffusers FeedForward: geglu / gelu variants)
# ---------------------------------------------------------------------------


class FeedForward(nn.Module):
    """diffusers `FeedForward` equivalent. `activation`: 'geglu' (UNet &
    temporal blocks) or 'gelu' (prior blocks). Exact (erf) gelu for parity
    with torch's default."""

    activation: str = "geglu"
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        inner = dim * self.mult
        if self.activation == "geglu":
            h = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * jax.nn.gelu(gate.astype(jnp.float32),
                                approximate=False).astype(h.dtype)
        elif self.activation == "gelu":
            h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
            h = jax.nn.gelu(h.astype(jnp.float32),
                            approximate=False).astype(h.dtype)
        else:
            raise ValueError(self.activation)
        return nn.Dense(dim, dtype=self.dtype, name="proj_out")(h)


def zeros_dense(features: int, dtype: jnp.dtype, name: str) -> nn.Dense:
    """Dense with zero-initialized kernel+bias (the reference zero-inits
    temporal proj_out — `motion_module.py:84-85` — and the 9-channel conv_in
    replacement trains fresh)."""
    return nn.Dense(features, dtype=dtype, name=name,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros)


# ---------------------------------------------------------------------------
# Per-frame conv helpers (the "inflated" ops, NHWC)
# ---------------------------------------------------------------------------


def fold_frames(x: Array) -> Array:
    """(b, f, h, w, c) -> (b*f, h, w, c)."""
    b, f = x.shape[:2]
    return x.reshape((b * f,) + x.shape[2:])


def unfold_frames(x: Array, num_frames: int) -> Array:
    """(b*f, h, w, c) -> (b, f, h, w, c)."""
    bf = x.shape[0]
    return x.reshape((bf // num_frames, num_frames) + x.shape[1:])


class FrameConv(nn.Module):
    """2D conv applied per frame on (b, f, h, w, c) — the TPU-native
    equivalent of `InflatedConv3d` (`resnet.py:10-18`)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f = x.shape[1]
        y = nn.Conv(self.features,
                    kernel_size=(self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=[(self.padding, self.padding)] * 2,
                    dtype=self.dtype, name="conv")(fold_frames(x))
        return unfold_frames(y, f)
