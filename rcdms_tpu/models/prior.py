"""Stage-1 frame-prior transformer: denoises the CLIP image embeddings of
unknown story frames, conditioned on all captions and the known frames.

TPU-native re-design of the reference `MyPriorTransformer`
(`src/models/myprior_transformer.py:39-448`): the story axis is an explicit
(b, f) pair of leading dims — spatial (per-frame, 97-token) attention and
temporal (cross-frame) attention are both plain batched einsums, no
`(b f) <-> (b d) f` rearranges.

Per-frame token sequence (97 = num_text_tokens(91) + 6, matching
`from_pretrained_2d`'s `num_embeddings=91, additional_embeddings=6` surgery,
`myprior_transformer.py:427-429`; layout comment `:374`):

    [ text hidden states (91) | text embed | known-image embed | mask embed |
      time embed | noisy image embed x_t | learned prd token ]

A causal mask over the 97 tokens plus the caption padding mask gates
attention (`:187-192`, `:389-393`); the prediction is read from the final
(prd) token (`:403-406`)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rcdms_tpu.configs import PriorConfig
from rcdms_tpu.core.attention import BasicTransformerBlock
from rcdms_tpu.core.layers import (
    LayerNorm,
    TimestepEmbedding,
    sinusoidal_time_embedding,
)
from rcdms_tpu.core.temporal import TemporalModule

Array = jax.Array

NEG_INF = -10000.0  # additive-mask value, matching the reference


class FramePrior(nn.Module):
    """The stage-1 denoiser. All inputs carry explicit (batch, frames) dims:

      x_t:         (b, f, embed_dim)   noisy CLIP image embeddings
      timesteps:   (b, f) int32        per-frame diffusion timesteps
                                       (training draws an independent t per
                                       frame — `train_stage1.py:344-347`;
                                       inference broadcasts one t)
      text_embed:  (b, f, embed_dim)   CLIP text projection
      text_hidden: (b, f, T, embed_dim) CLIP text last_hidden_state
      image_embed: (b, f, embed_dim)   CLIP embed of known frame (or black)
      mask_embed:  (b, f, embed_dim)   CLIP embed of the white/black mask img
      text_mask:   (b, f, T) bool      caption padding mask

    Returns (b, f, embed_dim) predicted clean CLIP embeddings."""

    cfg: PriorConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_t: Array, timesteps: Array, text_embed: Array,
                 text_hidden: Array, image_embed: Array, mask_embed: Array,
                 text_mask: Optional[Array] = None) -> Array:
        cfg = self.cfg
        b, f, _ = x_t.shape
        inner = cfg.inner_dim
        n_text = cfg.num_text_tokens
        seq = cfg.seq_len

        # --- time embedding (per frame) -----------------------------------
        t_flat = timesteps.reshape(b * f)
        t_emb = sinusoidal_time_embedding(t_flat, inner, flip_sin_to_cos=True,
                                          freq_shift=0.0).astype(self.dtype)
        t_emb = TimestepEmbedding(inner, name="time_embedding")(t_emb)
        t_emb = t_emb.reshape(b, f, 1, inner)

        # --- token projections ---------------------------------------------
        text_tokens = nn.Dense(inner, dtype=self.dtype,
                               name="encoder_hidden_states_proj")(text_hidden)
        text_tok = nn.Dense(inner, dtype=self.dtype,
                            name="embedding_proj")(text_embed)[:, :, None, :]
        img_tok = nn.Dense(inner, dtype=self.dtype,
                           name="embedding_proj1")(image_embed)[:, :, None, :]
        mask_tok = nn.Dense(inner, dtype=self.dtype,
                            name="embedding_proj2")(mask_embed)[:, :, None, :]
        x_tok = nn.Dense(inner, dtype=self.dtype,
                         name="proj_in")(x_t)[:, :, None, :]
        prd = self.param("prd_embedding", nn.initializers.zeros,
                         (1, 1, 1, inner), jnp.float32)
        prd_tok = jnp.broadcast_to(prd.astype(self.dtype), (b, f, 1, inner))

        h = jnp.concatenate(
            [text_tokens, text_tok, img_tok, mask_tok, t_emb, x_tok, prd_tok],
            axis=2)  # (b, f, 97, inner)

        pos = self.param("positional_embedding", nn.initializers.zeros,
                         (1, 1, seq, inner), jnp.float32)
        h = h + pos.astype(self.dtype)

        # --- attention mask: causal + caption padding ----------------------
        causal = jnp.triu(jnp.full((seq, seq), NEG_INF, jnp.float32), k=1)
        if text_mask is not None:
            pad = (1.0 - text_mask.astype(jnp.float32)) * NEG_INF  # (b,f,T)
            pad = jnp.pad(pad, ((0, 0), (0, 0), (0, seq - n_text)))
            mask = pad[:, :, None, None, :] + causal  # (b,f,1,seq,seq)
        else:
            mask = causal[None, None, None]

        # --- 20 x (spatial transformer block + temporal module) ------------
        for i in range(cfg.num_layers):
            h = BasicTransformerBlock(
                cfg.num_heads, cfg.head_dim, use_cross=False,
                activation="gelu", attention_bias=True, dtype=self.dtype,
                name=f"block_{i}")(h, mask=mask)
            if cfg.use_temporal:
                h = TemporalModule(inner, cfg.temporal, dtype=self.dtype,
                                   name=f"temporal_{i}")(h)

        h = LayerNorm(name="norm_out")(h)
        h = h[:, :, -1]  # prd token
        return nn.Dense(cfg.embedding_dim, dtype=self.dtype,
                        name="proj_to_clip_embeddings")(h)

    # --- CLIP-embedding normalization (train/inference inverse) -----------

    def normalize(self, emb: Array) -> Array:
        """train-time: (emb - clip_mean) / clip_std (`train_stage1.py:350`)."""
        return (emb - self.cfg.clip_mean) / self.cfg.clip_std

    def denormalize(self, latents: Array) -> Array:
        """`post_process_latents` (`myprior_transformer.py:413-415`)."""
        return latents * self.cfg.clip_std + self.cfg.clip_mean
