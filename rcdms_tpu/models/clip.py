"""CLIP text and vision towers (with projections) — JAX ports of the frozen
encoders the reference loads from HuggingFace:

  * CLIP text w/ projection, vocab resized with dataset character tokens and
    positions resized to 91/85 (`train_stage1.py:130-137`) — stage 1 uses the
    Kandinsky prior's bigG text tower (width 1280), stage 2 SD1.5's ViT-L
    tower (width 768).
  * CLIP ViT-bigG/14 vision w/ projection (257 tokens x 1664, proj 1280),
    loaded from `kandinsky-2-2-prior/image_encoder` (`train_stage1.py:123`).

Matches HF `CLIPTextModelWithProjection` / `CLIPVisionModelWithProjection`
semantics: text pooling at the first EOS-token position (robust to added
vocab), vision `last_hidden_state` WITHOUT post-layernorm (that norm applies
only to the pooled CLS token feeding the projection)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rcdms_tpu.configs import CLIPTextConfig, CLIPVisionConfig
from rcdms_tpu.ops.attention import dot_product_attention

Array = jax.Array

NEG_INF = jnp.finfo(jnp.float32).min


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPEncoderLayer(nn.Module):
    width: int
    num_heads: int
    hidden_act: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        head_dim = self.width // self.num_heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="layer_norm1")(x)
        q = nn.Dense(self.width, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(self.width, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(self.width, dtype=self.dtype, name="v_proj")(h)

        def split(t):
            t = t.reshape(t.shape[:-1] + (self.num_heads, head_dim))
            return jnp.swapaxes(t, -3, -2)

        o = dot_product_attention(split(q), split(k), split(v), mask=mask)
        o = jnp.swapaxes(o, -3, -2).reshape(h.shape)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="out_proj")(o)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="layer_norm2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="fc1")(h)
        h = _act(self.hidden_act)(h)
        return x + nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)


class CLIPTextEncoder(nn.Module):
    """Returns (last_hidden_state, text_embeds):
       last_hidden_state (b, T, width) AFTER final layernorm,
       text_embeds (b, projection_dim) = projection of the first-EOS pooled
       token (HF pools with `(ids == eos).argmax()` — correct under resized
       vocab, unlike raw argmax)."""

    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array) -> Tuple[Array, Array]:
        cfg = self.cfg
        b, t = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.width, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (cfg.max_positions, cfg.width), jnp.float32)
        h = tok + pos[None, :t].astype(self.dtype)

        causal = jnp.triu(jnp.full((t, t), NEG_INF, jnp.float32), k=1)
        mask = causal[None, None]
        for i in range(cfg.num_layers):
            h = CLIPEncoderLayer(cfg.width, cfg.num_heads, cfg.hidden_act,
                                 dtype=self.dtype, name=f"layer_{i}")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="final_layer_norm")(h).astype(self.dtype)

        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32),
                             axis=-1)
        pooled = jnp.take_along_axis(h, eos_pos[:, None, None], axis=1)[:, 0]
        text_embeds = nn.Dense(cfg.projection_dim, use_bias=False,
                               dtype=self.dtype, name="text_projection")(pooled)
        return h, text_embeds


class CLIPVisionEncoder(nn.Module):
    """Input: (b, H, W, 3) CLIP-preprocessed images. Returns
    (last_hidden_state (b, 1+N, width), image_embeds (b, projection_dim))."""

    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: Array) -> Tuple[Array, Array]:
        cfg = self.cfg
        b = pixels.shape[0]
        n_patches = (cfg.image_size // cfg.patch_size) ** 2

        patches = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                          strides=cfg.patch_size, padding="VALID",
                          use_bias=False, dtype=self.dtype,
                          name="patch_embedding")(pixels)
        patches = patches.reshape(b, n_patches, cfg.width)
        cls = self.param("class_embedding", nn.initializers.zeros,
                         (cfg.width,), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.width))
        h = jnp.concatenate([cls, patches], axis=1)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (1 + n_patches, cfg.width), jnp.float32)
        h = h + pos[None].astype(self.dtype)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="pre_layernorm")(h).astype(self.dtype)
        for i in range(cfg.num_layers):
            h = CLIPEncoderLayer(cfg.width, cfg.num_heads, cfg.hidden_act,
                                 dtype=self.dtype, name=f"layer_{i}")(h)
        # NOTE: last_hidden_state is returned WITHOUT post_layernorm (HF
        # applies it only to the pooled CLS) — the stage-2 fine_stack consumes
        # exactly these un-normed tokens (`train_stage2.py:472`).
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name="post_layernorm")(h[:, 0]).astype(self.dtype)
        image_embeds = nn.Dense(cfg.projection_dim, use_bias=False,
                                dtype=self.dtype,
                                name="visual_projection")(pooled)
        return h, image_embeds
