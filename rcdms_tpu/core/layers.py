"""Core NN primitives (flax.linen), TPU-native NHWC / token layouts.

Replaces the reference's L1 layer (`src/models/resnet.py`,
`attention.py`, diffusers embeddings). The reference's "inflated" 2D-per-
frame ops (`InflatedConv3d`/`InflatedGroupNorm`, `resnet.py:10-29`) become
plain NHWC ops applied over a folded ``(b*f, h, w, c)`` view — no einops
churn in model code.
"""

from __future__ import annotations

import math
import os
from typing import Optional

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


class _DenseParams(nn.Module):
    """Declares {kernel, bias} exactly as nn.Dense would (same names,
    shapes, inits) WITHOUT computing the matmul — lets a fused op consume
    the params of two Dense layers while the checkpoint tree stays
    byte-identical to the unfused path."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


def _fused_ff_route(shape: tuple, c: int, inner: int,
                    itemsize: int = 2) -> str | None:
    """Route an FF (geglu or gelu) through the fused Pallas kernel
    (ops/geglu.py): the (tokens, inner) intermediate stays in VMEM instead
    of round-tripping HBM between the two Dense matmuls. Same dispatch
    state as attention (impl 'xla' disables; 'pallas' forces; 'auto' =
    TPU). The kernel carries an SPMD partitioning rule, so it stays on
    under a mesh.

    Returns 'direct' (token dim tiles as-is), 'flat' (token dim too short
    — e.g. the prior's 97-token sequences — but all leading dims flatten
    into a tileable row axis; single-chip only, the flatten would mix
    sharded axes under a mesh), or None (XLA pair)."""
    from rcdms_tpu.ops.attention import (
        get_default_attention_impl,
        spmd_mesh_mode,
    )

    import os
    if os.environ.get("RCDMS_DISABLE_FUSED_GEGLU"):
        return None
    impl = get_default_attention_impl()
    if impl == "xla":
        return None
    if impl != "pallas" and jax.default_backend() != "tpu":
        return None
    from rcdms_tpu.ops.geglu import fits_kernel

    if fits_kernel(shape[-2], c, inner, itemsize):
        return "direct"
    rows = math.prod(shape[:-1])
    rows_pad = rows + (-rows % 128)
    if not spmd_mesh_mode() and fits_kernel(rows_pad, c, inner, itemsize):
        return "flat"
    return None


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
        route = (_fused_ff_route(x.shape, dim, inner,
                                 jnp.dtype(self.dtype).itemsize)
                 if self.activation in ("geglu", "gelu") else None)
        if route is not None:
            from rcdms_tpu.ops.geglu import ff_flat, gelu_ff, geglu_ff

            up = inner * 2 if self.activation == "geglu" else inner
            fn = geglu_ff if self.activation == "geglu" else gelu_ff
            w1, b1 = _DenseParams(dim, up, name="proj_in")()
            w2, b2 = _DenseParams(inner, dim, name="proj_out")()
            if route == "flat":
                return ff_flat(fn, x.astype(self.dtype), w1, b1, w2, b2)
            return fn(x.astype(self.dtype), w1, b1, w2, b2)
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


def _pad_axis(t, axis: int, spec) -> jnp.ndarray:
    """Zero-expand one axis of a kernel/bias per a pad spec:
    ("tail", real, padded) appends zeros. (The round-2 "interleave" spec
    died with the packed flash kernel — the nt kernel's channel-major
    layout needs no lane pads at all.)"""
    kind = spec[0]
    assert kind == "tail", spec
    _, real, padded = spec
    pad = [(0, 0)] * t.ndim
    pad[axis] = (0, padded - real)
    return jnp.pad(t, pad)


def pad_spec_width(spec) -> int:
    """Padded width produced/consumed by a pad spec."""
    assert spec[0] == "tail", spec
    return spec[2]


class PaddedDense(nn.Module):
    """Dense whose params keep the standard nn.Dense tree ({kernel, bias},
    shapes over the REAL features) but whose compute zero-pads columns/rows
    so Pallas kernels consume lane-aligned layouts with NO runtime HBM pad:

      * out_pad: emit padded outputs — ("tail", real, padded) puts zeros
        after the real features. (The "interleave" spec died with the
        round-2 packed kernel; only "tail" remains.)
      * in_pad: accept padded inputs by zero-expanding kernel ROWS at the
        same positions (zero rows annihilate the pad lanes).

    The padded kernel is loop-invariant, so XLA hoists the pad out of the
    samplers' scan loops — pad cost is paid once per program, not per
    step (the round-1 profile showed ~10% of stage-2 time in per-step
    pad/copy ops feeding the kernels)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    out_pad: Optional[tuple] = None
    in_pad: Optional[tuple] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.in_pad is not None:
            in_features = (self.in_pad[1] if self.in_pad[0] == "tail"
                           else self.in_pad[1] * self.in_pad[2])
            assert x.shape[-1] == pad_spec_width(self.in_pad), (
                x.shape, self.in_pad)
        else:
            in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        if self.out_pad is not None:
            kernel = _pad_axis(kernel, 1, self.out_pad)
            if bias is not None:
                bias = _pad_axis(bias, 0, self.out_pad)
        if self.in_pad is not None:
            kernel = _pad_axis(kernel, 0, self.in_pad)
        y = jax.lax.dot_general(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class DenseNT(nn.Module):
    """Dense that emits the TRANSPOSED output layout (..., features, tokens)
    from a standard (..., tokens, c_in) input — same matmul cost (the
    output ordering is just dot_general dimension ordering, no transpose
    op), standard nn.Dense param tree {kernel (c_in, features), bias}.

    The channel-major layout puts head_dim on SUBLANES, which is what lets
    the small-head flash kernel contract dh without padding it to 128
    lanes (tools/mxu_pad_study.py: matmul time scales with the REAL
    contraction size at ~8-row granularity — a dh=40 contraction is ~2.9x
    cheaper than the 128-lane-padded one)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        nb = x.ndim - 2  # leading batch dims
        # (features, tokens) = kernel^T-contraction with x's channel dim
        y = jax.lax.dot_general(
            kernel.astype(self.dtype), x.astype(self.dtype),
            (((0,), (x.ndim - 1,)), ((), ())))
        # y: (features, *batch, tokens) -> (*batch, features, tokens)
        if nb:
            y = jnp.moveaxis(y, 0, nb)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)[:, None]
        return y


class DenseTN(nn.Module):
    """Dense that CONSUMES a transposed input layout (..., c_in, tokens)
    and emits the standard (..., tokens, features) — contraction over the
    channel (sublane) axis, no transpose op, standard param tree."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xt: Array) -> Array:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (xt.shape[-2], self.features), jnp.float32)
        nb = xt.ndim - 2
        # contract c_in (dim -2 of xt) with kernel rows
        y = jax.lax.dot_general(
            xt.astype(self.dtype), kernel.astype(self.dtype),
            (((xt.ndim - 2,), (0,)), ((), ())))
        # y: (*batch, tokens, features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


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


class _ConvParams(nn.Module):
    """Declares {kernel, bias} exactly as nn.Conv would (same names,
    shapes, inits) without computing — the taps9 formulation consumes them
    while the checkpoint tree stays identical to the nn.Conv path."""

    kernel_size: int
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, self.in_features,
             self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class _GNParams(nn.Module):
    """Declares {scale, bias} exactly as GroupNorm would (same names,
    shapes, inits) without computing — the channel-major resnet path
    consumes them while the checkpoint tree stays identical."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


class _ConvParamsTree(nn.Module):
    """FrameConv-shaped param subtree ({name}/conv/{kernel, bias}) without
    the conv compute — the channel-major resnet path's stand-in for
    `FrameConv(name=...)` (ksize=1 for the 1x1 shortcut)."""

    in_features: int
    features: int
    ksize: int = 3

    @nn.compact
    def __call__(self):
        return _ConvParams(self.ksize, self.in_features, self.features,
                           name="conv")()


# ---------------------------------------------------------------------------
# Channel-major level-0 conv segment (RCDMS_L0_CONV=cm, A/B'd end to end)
#
# tools/cm_conv_study.py (2026-08-19, v5e): XLA's native conv emitter runs
# the level-0 3x3 convs (Cin=Cout=320) at ~105-120 TF/s — the 320 -> 384
# channel-lane pad. Reformulated channel-major, out (Cout, T) =
# sum_taps W^T . x^T(shifted), the dot has M=Cout on sublanes (no pad),
# N=tokens on lanes (no pad), K=C contracted at real granularity:
# measured 136-182 TF/s (run-to-run spread), consistently ~25% above
# native. A Mosaic kernel variant was also built and REJECTED: Mosaic has
# no bf16 lane rotate, and rotating the fp32 partial sums instead costs
# more than the dots save (118 TF/s vs 176 for its dots alone).
#
# The layout must persist across a whole resnet block (transposes around a
# single conv eat the win), so ResnetBlock carries the segment: pack ->
# GN -> SiLU -> conv -> (+temb) -> GN -> SiLU -> conv -> +residual ->
# unpack. The frame sits in a zero ring ((h+2) x (w+2) tokens) so every
# tap is a lane-offset slice; ring entries re-zero after each non-conv op
# so conv inputs stay correctly padded.
# ---------------------------------------------------------------------------


def _use_cm_l0(c_in: int, c_out: int) -> bool:
    """Opt-in (RCDMS_L0_CONV=cm) channel-major path for the level-0
    resnet blocks (Cout=320): the square 3x3 convs the taps9 gate rejects
    (native emitter otherwise) AND the channel-changing up-block blocks,
    where taps9's N=Cout=320 lanes pad to 384 (20% waste) while cm puts
    Cout on sublanes (exact) and tokens on lanes (~3% ring pad). Same
    dispatch tri-state and single-chip gating as taps9 (each tap slice
    would pay its own halo exchange under 'space' sharding)."""
    if os.environ.get("RCDMS_L0_CONV") != "cm":
        return False
    if not (c_in % 64 == 0 and c_out % 64 == 0 and c_out < 640):
        return False
    from rcdms_tpu.ops.quant import int8_enabled

    if int8_enabled():
        # the stronger opt-in wins: w8a8 taps beat the native conv ~2.4x
        # at level 0 (tools/int8_study.py) vs cm's ~1.25x over native
        return False
    return _use_taps9()


def _cm_mask(h: int, w: int) -> Array:
    """(1, 1, (h+2)*(w+2)) fp32 interior mask (constant-folded)."""
    m = jnp.zeros((h + 2, w + 2), jnp.float32)
    m = m.at[1:-1, 1:-1].set(1.0)
    return m.reshape(1, 1, -1)


def cm_pack(x: Array) -> Array:
    """(b, f, h, w, c) -> (b*f, c, (h+2)*(w+2)) channel-major with a zero
    ring around each frame."""
    b, f, h, w, c = x.shape
    xt = jnp.transpose(x.reshape(b * f, h, w, c), (0, 3, 1, 2))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (1, 1), (1, 1)))
    return xt.reshape(b * f, c, (h + 2) * (w + 2))


def cm_unpack(xcm: Array, shape: tuple) -> Array:
    """Inverse of cm_pack (interior only)."""
    b, f, h, w, c = shape
    xt = xcm.reshape(b * f, c, h + 2, w + 2)[:, :, 1:-1, 1:-1]
    return jnp.transpose(xt, (0, 2, 3, 1)).reshape(b, f, h, w, c)


def cm_conv3(xcm: Array, hw: tuple, kernel: Array, bias: Array,
             dtype: jnp.dtype) -> Array:
    """3x3 SAME conv on a packed channel-major frame. xcm: (n, c, TP)
    with a ZERO ring (the correctness precondition); returns (n, cout,
    TP) with the ring re-zeroed."""
    h, w = hw
    wp = w + 2
    tp = (h + 2) * wp
    guard = wp + 2
    n, c, _ = xcm.shape
    cout = kernel.shape[-1]
    k9 = kernel.reshape(9, c, cout).astype(dtype)
    xbuf = jnp.pad(xcm.astype(dtype), ((0, 0), (0, 0), (guard, guard)))
    acc = None
    i = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            xs = jax.lax.dynamic_slice(
                xbuf, (0, 0, guard + dy * wp + dx), (n, c, tp))
            t = jnp.einsum("cd,bct->bdt", k9[i], xs,
                           preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
            i += 1
    out = acc + bias.astype(jnp.float32)[None, :, None]
    return (out * _cm_mask(h, w)).astype(dtype)


def cm_conv1(xcm: Array, hw: tuple, kernel: Array, bias: Array,
             dtype: jnp.dtype) -> Array:
    """1x1 conv (the channel-change shortcut) on a packed channel-major
    frame: one (Cout, C) @ (C, TP) dot; the bias re-populates the ring, so
    the mask re-zeroes it."""
    h, w = hw
    c, cout = kernel.shape[-2:]
    wmat = kernel.reshape(c, cout).astype(dtype)
    out = jnp.einsum("cd,bct->bdt", wmat, xcm.astype(dtype),
                     preferred_element_type=jnp.float32)
    out = out + bias.astype(jnp.float32)[None, :, None]
    return (out * _cm_mask(h, w)).astype(dtype)


def cm_groupnorm(xcm: Array, hw: tuple, groups: int, eps: float,
                 scale: Array, bias: Array) -> Array:
    """GroupNorm on a packed channel-major frame — same math as
    `GroupNorm` (fp32 stats, per (sample, group) over spatial x c/g). The
    ring's zeros drop out of the sums, so dividing by the TRUE token
    count gives exact moments; the affine add re-populates the ring, so
    the mask re-zeroes it."""
    h, w = hw
    n, c, _ = xcm.shape
    g = groups
    nvalid = h * w
    xf = xcm.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=-1) / nvalid            # (n, c)
    s2 = jnp.sum(xf * xf, axis=-1) / nvalid
    mean_g = s1.reshape(n, g, c // g).mean(-1)
    ex2_g = s2.reshape(n, g, c // g).mean(-1)
    var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
    mean_c = jnp.repeat(mean_g, c // g, axis=-1)
    inv_c = jnp.repeat(jax.lax.rsqrt(var_g + eps), c // g, axis=-1)
    mul = inv_c * scale                            # (n, c)
    add = bias - mean_c * mul
    y = xf * mul[:, :, None] + add[:, :, None]
    return (y * _cm_mask(h, w)).astype(xcm.dtype)


def _use_taps9() -> bool:
    """Same dispatch state as the Pallas kernels: impl 'xla' disables,
    'pallas' forces (the formulation is plain XLA, so it also runs on CPU
    for tests), 'auto' = TPU only.

    SINGLE-CHIP ONLY: under a >1-device 'space'-sharded mesh each of the 9
    shifted slices pays its own halo exchange — the comm audit measured
    8.7 GB/story of collective-permutes vs 0.9 GB for the native conv's
    single halo, which outweighs the ~1.5x per-chip matmul win. Sharded
    programs keep XLA's conv emitter."""
    from rcdms_tpu.ops.attention import (
        get_default_attention_impl,
        spmd_mesh_mode,
    )

    import os
    if os.environ.get("RCDMS_DISABLE_TAPS9") or spmd_mesh_mode():
        return False
    impl = get_default_attention_impl()
    if impl == "xla":
        return False
    return impl == "pallas" or jax.default_backend() == "tpu"


def _use_taps9_int8() -> bool:
    """Opt-in w8a8 path (ops/quant.py): same dispatch tri-state as
    `_use_taps9`, additionally requiring the int8 quant mode. Single-chip
    only for the same halo-exchange reason (and the quantize's per-tensor
    amax would be a cross-shard all-reduce)."""
    from rcdms_tpu.ops.attention import (
        get_default_attention_impl,
        spmd_mesh_mode,
    )
    from rcdms_tpu.ops.quant import int8_enabled

    if not int8_enabled() or spmd_mesh_mode():
        return False
    if os.environ.get("RCDMS_DISABLE_TAPS9"):
        return False
    impl = get_default_attention_impl()
    if impl == "xla":
        return False
    return impl == "pallas" or jax.default_backend() == "tpu"


def _taps9_conv_int8(x: Array, kernel: Array, bias: Array,
                     dtype: jnp.dtype) -> Array:
    """w8a8 variant of `_taps9_conv`: the activation is quantized ONCE
    (per-tensor dynamic scale) and all 9 shifted dots reuse the int8
    tensor; weights get per-output-channel scales (quantized from the same
    fp32 params — loop-invariant, hoisted out of the sampler scan); the 9
    taps accumulate in int32 (worst case 9*1280*127^2 ~ 1.9e8 < 2^31) and
    dequantize in one fused fp32 epilogue. Measured 1.5-2.4x over the bf16
    dots at SD1.5 shapes — including level 0's Cin=320, where int8 beats
    even the NATIVE conv by ~2.4x (tools/int8_study.py), so the int8 gate
    admits every lane-aligned 3x3."""
    from rcdms_tpu.ops.quant import quantize_act, quantize_weight

    b, f, h, w, c = x.shape
    q, s_x = quantize_act(x)
    qk, s_w = quantize_weight(kernel, out_axis=-1)  # (3,3,c,cout), (cout,)
    qp = jnp.pad(q, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(
                qp, (0, 0, dy, dx, 0), (b, f, h, w, c))
            t = jnp.einsum("bfhwc,cd->bfhwd", xs, qk[dy, dx],
                           preferred_element_type=jnp.int32)
            acc = t if acc is None else acc + t
    out = acc.astype(jnp.float32) * (s_x * s_w) + bias.astype(jnp.float32)
    return out.astype(dtype)


def _taps9_conv(x: Array, kernel: Array, bias: Array,
                dtype: jnp.dtype) -> Array:
    """3x3 SAME conv as the sum of 9 shifted (tokens, Cin) @ (Cin, Cout)
    matmuls, fp32 accumulation. On a v5e this runs at ~180 TF/s vs
    ~117 TF/s for XLA's native conv lowering at SD1.5 level-1/2 shapes
    (tools/conv_variants_study.py, 2026-08-17) — XLA's conv emitter loses
    ~35% that its own dot emitter does not, provided Cin is lane-aligned
    (Cin % 64 == 0 and Cin >= 640 — measured end to end: the 960-channel
    up-block concat convs win 2x despite the 6.7% K pad, while level 0's
    Cin=320 20% pad makes the dots LOSE and keeps the native conv)."""
    b, f, h, w, c = x.shape
    kernel = kernel.astype(dtype)
    xp = jnp.pad(x.astype(dtype),
                 ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(
                xp, (0, 0, dy, dx, 0), (b, f, h, w, c))
            t = jnp.einsum("bfhwc,cd->bfhwd", xs, kernel[dy, dx],
                           preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return (acc + bias.astype(jnp.float32)).astype(dtype)


class FrameConv(nn.Module):
    """2D conv applied per frame on (b, f, h, w, c) — the TPU-native
    equivalent of `InflatedConv3d` (`resnet.py:10-18`). 3x3 stride-1 convs
    with Cin >= 640 (Cin % 64 == 0) route through the taps9 dot
    formulation (see `_taps9_conv`); everything else uses the native conv."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f = x.shape[1]
        if (self.kernel_size == 3 and self.stride == 1 and self.padding == 1
                and x.shape[-1] % 64 == 0 and _use_taps9_int8()):
            kernel, bias = _ConvParams(3, x.shape[-1], self.features,
                                       name="conv")()
            return _taps9_conv_int8(x, kernel, bias, self.dtype)
        if (self.kernel_size == 3 and self.stride == 1 and self.padding == 1
                and x.shape[-1] % 64 == 0 and x.shape[-1] >= 640
                and _use_taps9()):
            kernel, bias = _ConvParams(3, x.shape[-1], self.features,
                                       name="conv")()
            return _taps9_conv(x, kernel, bias, self.dtype)
        # (the rows3 level-0 formulation — 3 K=3*Cin dots — was A/B'd
        # NEUTRAL end to end (BASELINE.md round 3: 2.170 vs 2.172 s) and
        # deleted in round 5: one formulation per use case)
        y = nn.Conv(self.features,
                    kernel_size=(self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=[(self.padding, self.padding)] * 2,
                    dtype=self.dtype, name="conv")(fold_frames(x))
        return unfold_frames(y, f)
