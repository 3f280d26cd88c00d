"""Temporal (cross-frame) attention module — the reference "motion module"
(`src/models/motion_module.py:53-353`) re-designed TPU-first.

The reference rearranges `(b f) d c -> (b d) f c` around every temporal
attention; here the story axis stays explicit: token inputs are
``(b, f, n, c)`` and feature maps ``(b, f, h, w, c)``, and temporal attention
is a batched einsum over the tiny f=5 axis at every token/pixel — exactly the
shape XLA tiles well (the (b·n) axis maps to MXU rows)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from rcdms_tpu.configs import TemporalConfig
from rcdms_tpu.core.attention import Attention
from rcdms_tpu.core.layers import (
    FeedForward,
    GroupNorm,
    LayerNorm,
    temporal_positional_encoding,
    zeros_dense,
)

Array = jax.Array


class TemporalTransformerBlock(nn.Module):
    """N x (LN -> [+PE] -> temporal self-attn -> +res) -> LN -> FF -> +res
    (reference `TemporalTransformerBlock`, `motion_module.py:185-246`;
    `attention_block_types=("Temporal_Self","Temporal_Self")`)."""

    cfg: TemporalConfig
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: (b, f, n, c) — the model-native layout; attention runs across
        the f axis at every token (Attention(frame_axis=True), so the Pallas
        path needs no transposes)."""
        f = x.shape[1]
        pe = None
        if self.cfg.use_positional_encoding:
            pe = temporal_positional_encoding(
                self.cfg.max_frames, x.shape[-1])[:f].astype(x.dtype)
            pe = pe[:, None, :]  # broadcast over tokens: (f, 1, c)
        for i in range(self.cfg.attn_layers_per_block):
            h = LayerNorm(name=f"norm_{i}")(x)
            if pe is not None:
                # PE enters q/k/v (applied to the normed states, matching
                # VersatileAttention.forward, motion_module.py:299-302)
                h = h + pe
            x = x + Attention(self.cfg.num_heads, self.head_dim,
                              dtype=self.dtype, frame_axis=True,
                              name=f"attn_{i}")(h)
        h = LayerNorm(name="ff_norm")(x)
        return x + FeedForward("geglu", dtype=self.dtype, name="ff")(h)


class TemporalModule(nn.Module):
    """`VanillaTemporalModule`/`TemporalTransformer3DModel` equivalent
    (`motion_module.py:53-182`). Accepts either

      * tokens (b, f, n, c)       — prior mode: LayerNorm in  (`:150-153`)
      * feature maps (b, f, h, w, c) — UNet mode: GroupNorm in (`:162`)

    then proj_in -> num_blocks x TemporalTransformerBlock (attention across
    the f axis at every token/pixel) -> zero-init proj_out -> +residual,
    so the module is an exact identity at initialization."""

    channels: int
    cfg: TemporalConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        spatial = x.ndim == 5
        residual = x
        if spatial:
            b, f, hh, ww, c = x.shape
            h = GroupNorm(32, eps=1e-6, name="norm")(x)
            h = h.reshape(b, f, hh * ww, c)
        else:
            h = LayerNorm(name="prior_norm")(x)

        inner = self.channels  # temporal_attention_dim_div = 1
        head_dim = inner // self.cfg.num_heads
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.cfg.num_blocks):
            h = TemporalTransformerBlock(self.cfg, head_dim,
                                         dtype=self.dtype,
                                         name=f"block_{i}")(h)
        if self.cfg.zero_init_output:
            h = zeros_dense(self.channels, self.dtype, "proj_out")(h)
        else:
            h = nn.Dense(self.channels, dtype=self.dtype, name="proj_out")(h)
        if spatial:
            h = h.reshape(residual.shape)
        return h + residual
