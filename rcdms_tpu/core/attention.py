"""Attention stack: multi-head attention, BasicTransformerBlock, and the
spatial transformer (reference `src/models/attention.py:31-365`), re-designed
for TPU: einsum/Pallas attention over NHWC token layouts, fp32 softmax, no
sliced-attention fallbacks (XLA/Pallas handle memory tiling)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rcdms_tpu.core.layers import (
    DenseNT,
    DenseTN,
    FeedForward,
    GroupNorm,
    LayerNorm,
    PaddedDense,
)
from rcdms_tpu.ops.attention import (
    dot_product_attention,
    get_default_attention_impl,
)
from rcdms_tpu.ops.flash import _round_up  # single rounding helper

Array = jax.Array

LANE = 128

# The round-2 "packed" long-sequence kernel (head-interleave 128-lane
# pads) was deleted in round 3: the channel-major "nt" formulation beat it
# 2.556 s vs 2.702 s stage-2 p50 on-chip (BASELINE.md round 3) and the
# contraction-granularity study showed its 128-lane pad burned ~2.9x the
# necessary MXU time on the score matmul. One formulation per use case.


def _use_frame_kernel() -> bool:
    impl = get_default_attention_impl()
    if impl == "xla":
        return False
    return impl == "pallas" or jax.default_backend() == "tpu"


def _use_nt_flash(seq_q: int, seq_k: int, heads: int, head_dim: int) -> bool:
    """Long-sequence attention goes to the channel-major Pallas kernel
    when the shapes divide cleanly (no runtime q-row pads; head_dim on the
    8-row sublane granularity). Short contexts (cross attention, 91
    caption tokens) are row-padded to a lane multiple before the k/v
    projections — loop-invariant, so the pad hoists out of the sampling
    scan — and masked inside the kernel via kv_len."""
    if not _use_frame_kernel():
        return False
    from rcdms_tpu.ops.flash import nt_ok

    return (seq_q >= 256 and head_dim <= 256
            and nt_ok(seq_q, _round_up(seq_k, LANE), heads, head_dim))


class Attention(nn.Module):
    """Multi-head (self/cross) attention over (..., seq, dim) inputs.

    Equivalent of the reference `CrossAttention` (`attention.py:31-199`):
    to_q/to_k/to_v (optional bias), additive mask, out projection (always
    biased). Leading batch dims are arbitrary."""

    heads: int
    head_dim: int
    out_dim: Optional[int] = None      # defaults to query dim
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    # frame_axis: input is (b, f, n, c) and attention runs across f at every
    # token n (the temporal module's native layout — no transposes anywhere;
    # the Pallas kernel tiles (f, block_n, c_pad) contiguously)
    frame_axis: bool = False

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 mask: Optional[Array] = None) -> Array:
        """mask: additive, broadcastable to (..., heads, seq_q, seq_k)."""
        inner = self.heads * self.head_dim
        out_dim = self.out_dim or x.shape[-1]
        ctx = x if context is None else context

        if self.frame_axis:
            assert context is None and mask is None and x.ndim == 4
            if _use_frame_kernel():
                from rcdms_tpu.ops.frame_attention import frame_attention_bfnc

                c_pad = _round_up(inner, LANE)
                spec = ("tail", inner, c_pad)
                q = PaddedDense(inner, self.qkv_bias, self.dtype,
                                out_pad=spec, name="to_q")(x)
                k = PaddedDense(inner, self.qkv_bias, self.dtype,
                                out_pad=spec, name="to_k")(x)
                v = PaddedDense(inner, self.qkv_bias, self.dtype,
                                out_pad=spec, name="to_v")(x)
                o = frame_attention_bfnc(q, k, v, self.heads, inner,
                                         self.head_dim ** -0.5)
                return PaddedDense(out_dim, True, self.dtype, in_pad=spec,
                                   name="to_out")(o)
            # XLA fallback (CPU): frame axis to -2, standard path, back
            q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="to_q")(x)
            k = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="to_k")(x)
            v = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="to_v")(x)

            def split_f(t):
                t = jnp.swapaxes(t, 1, 2)  # (b, n, f, inner)
                t = t.reshape(t.shape[:-1] + (self.heads, self.head_dim))
                return jnp.swapaxes(t, -3, -2)

            o = dot_product_attention(split_f(q), split_f(k), split_f(v))
            o = jnp.swapaxes(o, -3, -2)
            o = o.reshape(o.shape[:-2] + (inner,))
            o = jnp.swapaxes(o, 1, 2)  # back to (b, f, n, inner)
            return nn.Dense(out_dim, dtype=self.dtype, name="to_out")(o)

        # long-sequence (spatial self/cross) attention, channel-major
        # Pallas kernel: DenseNT projections emit (..., C, tokens) with
        # head_dim on SUBLANES (no 128-lane pad), the kernel contracts the
        # real dh (~2.9x cheaper score matmul at dh=40 — BASELINE.md round
        # 3), and DenseTN consumes the transposed output. No transpose or
        # pad op anywhere in the chain.
        if mask is None and _use_nt_flash(x.shape[-2], ctx.shape[-2],
                                          self.heads, self.head_dim):
            from rcdms_tpu.ops.flash import (
                DEFAULT_Q_BLOCK,
                flash_attention_nt,
            )

            skv = ctx.shape[-2]
            skv_pad = _round_up(skv, LANE)
            if skv_pad != skv:
                pad = ([(0, 0)] * (ctx.ndim - 2)
                       + [(0, skv_pad - skv), (0, 0)])
                ctx = jnp.pad(ctx, pad)
            qt = DenseNT(inner, self.qkv_bias, self.dtype, name="to_q")(x)
            kt = DenseNT(inner, self.qkv_bias, self.dtype, name="to_k")(ctx)
            vt = DenseNT(inner, self.qkv_bias, self.dtype, name="to_v")(ctx)
            ot = flash_attention_nt(qt, kt, vt, self.heads,
                                    self.head_dim ** -0.5, DEFAULT_Q_BLOCK,
                                    skv)
            return DenseTN(out_dim, True, self.dtype, name="to_out")(ot)

        # NOTE on a non-change: fusing the self-attention q/k/v projections
        # into one (c, 3*inner) matmul was built and REJECTED in round 5 —
        # at the prior's exact shapes (M=970, K=2048) the three separate
        # dots already run at 175.9 TF/s while the 6144-wide fused dot
        # measures 145.1 TF/s (tools/qkv_fusion_study.py, long fold-proof
        # chains; BASELINE.md round 5). Three skinny dots it is.
        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_q")(x)
        k = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_v")(ctx)

        def split_heads(t):
            t = t.reshape(t.shape[:-1] + (self.heads, self.head_dim))
            return jnp.swapaxes(t, -3, -2)  # (..., heads, seq, head_dim)

        o = dot_product_attention(split_heads(q), split_heads(k),
                                  split_heads(v), mask=mask)
        o = jnp.swapaxes(o, -3, -2)
        o = o.reshape(o.shape[:-2] + (inner,))
        return nn.Dense(out_dim, dtype=self.dtype, name="to_out")(o)


class BasicTransformerBlock(nn.Module):
    """LN -> self-attn -> [LN -> cross-attn] -> LN -> FF, all residual
    (reference `attention.py:368-526`; the disabled sparse-causal/temporal
    variants are intentionally not replicated — they are off in every live
    config, `configs/training.yaml:4-5`)."""

    heads: int
    head_dim: int
    use_cross: bool = False
    activation: str = "geglu"
    attention_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 mask: Optional[Array] = None) -> Array:
        h = LayerNorm(name="norm1")(x)
        x = x + Attention(self.heads, self.head_dim,
                          qkv_bias=self.attention_bias, dtype=self.dtype,
                          name="attn1")(h, mask=mask)
        if self.use_cross:
            h = LayerNorm(name="norm2")(x)
            x = x + Attention(self.heads, self.head_dim,
                              qkv_bias=self.attention_bias, dtype=self.dtype,
                              name="attn2")(h, context=context)
        h = LayerNorm(name="norm3")(x)
        return x + FeedForward(self.activation, dtype=self.dtype,
                               name="ff")(h)


class SpatialTransformer(nn.Module):
    """Spatial self+cross attention over each frame's h*w tokens — the
    reference `Transformer3DModel` (`attention.py:254-365`) without the
    (b f) einops churn: input (b, f, h, w, c), tokens (b, f, h*w, c).

    GroupNorm -> 1x1 proj_in -> blocks -> 1x1 proj_out -> +residual.
    SD1.5 uses conv 1x1 projections (use_linear_projection=False), which on
    NHWC tokens are exactly Dense layers."""

    heads: int
    head_dim: int
    num_layers: int = 1
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        """x: (b, f, h, w, c); context: (b, f, n_ctx, d_ctx)."""
        b, f, hh, ww, c = x.shape
        residual = x
        h = GroupNorm(self.norm_groups, eps=1e-6, name="norm")(x)
        h = h.reshape(b, f, hh * ww, c)
        h = nn.Dense(self.heads * self.head_dim, dtype=self.dtype,
                     name="proj_in")(h)
        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                self.heads, self.head_dim, use_cross=True,
                activation="geglu", dtype=self.dtype,
                name=f"block_{i}")(h, context=context)
        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(b, f, hh, ww, c) + residual
