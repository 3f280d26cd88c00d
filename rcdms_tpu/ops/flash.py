"""Pallas TPU fused-attention kernel (SURVEY.md §7 step 8).

One grid cell = one (batch*head, q-block): the q block, the FULL K/V for
that head, and the fp32 score tile all live in VMEM, so the softmax never
round-trips HBM (at RCDMs scales — spatial seq <= 4096, head_dim <= 160 —
K/V per head is <= ~2 MB, far under the ~16 MB VMEM budget; no online-
softmax streaming needed). Inputs may be bf16; scores and the
softmax run in fp32 on the MXU/VPU.

Non-128-aligned head dims (SD1.5 uses 40/80/160) are zero-padded — padding
K/V feature columns does not change q.k^T, and padded V columns are sliced
off the output. Padded KV *rows* are masked with -inf before the softmax.

The XLA path in rcdms_tpu.ops.attention is the correctness oracle; tests
run this kernel in interpret mode on CPU against it."""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANE = 128
DEFAULT_Q_BLOCK = 512

# flip via set_kernel_interpret so module-level kernel paths run on CPU in
# interpret mode (tests); real runs leave this False
_INTERPRET = False


def set_kernel_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def kernel_interpret() -> bool:
    return _INTERPRET


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    q = q_ref[0]            # (blk_q, d)
    k = k_ref[0]            # (S_kv_pad, d)
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale
    if kv_len != k.shape[0]:  # mask padded kv rows
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _xla_reference(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Unfused oracle (same math, differentiable) — used for the backward
    pass so the kernel is trainable without a handwritten bwd kernel
    (recompute-style, like remat'ing the attention)."""
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q: Array, k: Array, v: Array, scale: float,
                    q_block: int = DEFAULT_Q_BLOCK,
                    interpret: bool = False) -> Array:
    """q: (..., Sq, d); k/v: (..., Skv, d) with identical leading dims.
    Returns (..., Sq, d) in q.dtype. Differentiable: forward runs the Pallas
    kernel, backward recomputes through the XLA reference."""
    return _flash_forward(q, k, v, scale, q_block, interpret)


def _flash_fwd(q, k, v, scale, q_block, interpret):
    return _flash_forward(q, k, v, scale, q_block, interpret), (q, k, v)


def _flash_bwd(scale, q_block, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def _fit_q_block(q_block: int, skv_pad: int, d_pad: int,
                 itemsize: int) -> int:
    """Shrink the q block until q/k/v/o tiles (double-buffered) + the fp32
    score tile fit a ~12 MB VMEM budget (fp32 inputs need half the block of
    bf16)."""
    budget = 12 * 1024 * 1024  # (14 MB admits 512-row q blocks at
    # skv=4096 but measured neutral-to-slightly-worse end to end)
    while q_block > 128:
        tiles = (q_block + 2 * skv_pad + q_block) * d_pad * itemsize * 2
        scores = q_block * skv_pad * 4
        if tiles + scores <= budget:
            break
        q_block //= 2
    return q_block


# ---------------------------------------------------------------------------
# Packed layout: q/k/v arrive (B, S, heads * LANE) with each head's real
# head_dim zero-padded to a full 128-lane group BY THE PRODUCING PROJECTION
# (core/layers.py::PaddedDense with an interleaved pad). No transpose to
# head-major and no HBM pad op ever runs: the kernel lane-slices one head's
# 128-lane group straight out of the projection's output layout.
# ---------------------------------------------------------------------------


def packed_ok(sq: int, skv: int, q_block: int = DEFAULT_Q_BLOCK) -> bool:
    """Shapes the packed kernel handles without runtime row pads."""
    return sq % min(q_block, _round_up(sq, 128)) == 0 and skv % LANE == 0


def _packed_xla_reference(q: Array, k: Array, v: Array, heads: int,
                          scale: float, group: int) -> Array:
    """Oracle on the packed layout: zero pad lanes add nothing to q.k^T and
    produce zero output lanes, so attention over dh_pad == real attention."""
    *lead, s, hd = q.shape
    q4 = q.reshape(tuple(lead) + (s, heads, group))
    k4 = k.reshape(tuple(lead) + (k.shape[-2], heads, group))
    v4 = v.reshape(tuple(lead) + (v.shape[-2], heads, group))
    logits = jnp.einsum("...qhd,...khd->...hqk", q4, k4,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    o = jnp.einsum("...hqk,...khd->...qhd", probs, v4)
    return o.reshape(q.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention_packed(q: Array, k: Array, v: Array, heads: int,
                           scale: float, group: int = LANE,
                           q_block: int = DEFAULT_Q_BLOCK,
                           kv_len: int | None = None) -> Array:
    """Fused attention on head-interleave-padded inputs.

    q: (..., Sq, heads*group); k/v: (..., Skv, heads*group); lanes
    [h*group + head_dim, (h+1)*group) must be zero (the padded-projection
    contract; group is a multiple of 128). `kv_len`: real KV rows when the
    caller padded the context sequence to a 128 multiple (cross attention;
    padded rows are masked before the softmax). Returns
    (..., Sq, heads*group) with the same zero-lane structure. Requires
    packed_ok(Sq, Skv)."""
    return _flash_packed_forward(q, k, v, heads, scale, group, q_block,
                                 kv_len)


def _flash_packed_fwd(q, k, v, heads, scale, group, q_block, kv_len):
    return (_flash_packed_forward(q, k, v, heads, scale, group, q_block,
                                  kv_len),
            (q, k, v))


def _flash_packed_bwd(heads, scale, group, q_block, kv_len, residuals, g):
    q, k, v = residuals
    real = kv_len if kv_len is not None else k.shape[-2]

    def ref(a, b, c):
        if real != b.shape[-2]:
            b = b[..., :real, :]
            c = c[..., :real, :]
            o = _packed_xla_reference(a, b, c, heads, scale, group)
            return o
        return _packed_xla_reference(a, b, c, heads, scale, group)

    if real != k.shape[-2]:
        _, vjp = jax.vjp(ref, q, k[..., :real, :], v[..., :real, :])
        dq, dk, dv = vjp(g)
        pad = [(0, 0)] * (k.ndim - 2) + [(0, k.shape[-2] - real), (0, 0)]
        return dq, jnp.pad(dk, pad), jnp.pad(dv, pad)
    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "group",
                                             "q_block", "kv_len"))
def _flash_packed_forward(q: Array, k: Array, v: Array, heads: int,
                          scale: float, group: int = LANE,
                          q_block: int = DEFAULT_Q_BLOCK,
                          kv_len: int | None = None) -> Array:
    orig_shape = q.shape
    *lead, sq, hd = q.shape
    assert hd == heads * group and group % LANE == 0, (hd, heads, group)
    skv = k.shape[-2]
    assert packed_ok(sq, skv, q_block), (sq, skv)
    if kv_len is None:
        kv_len = skv
    B = math.prod(lead) if lead else 1

    q_block = min(q_block, sq)
    q_block = _fit_q_block(q_block, skv, group, q.dtype.itemsize)

    q3 = q.reshape(B, sq, hd)
    k3 = k.reshape(B, skv, hd)
    v3 = v.reshape(B, skv, hd)

    grid = (B, heads, sq // q_block)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_len=kv_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, group), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, group), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, group), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, group),
                               lambda b, h, i: (b, i, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, sq, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * heads * sq * skv * group,
            bytes_accessed=(B * (sq + 2 * skv) * hd * q.dtype.itemsize),
            transcendentals=B * heads * sq * skv,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=_INTERPRET,
    )(q3, k3, v3)
    return out.reshape(orig_shape)


@functools.partial(jax.jit, static_argnames=("scale", "q_block", "interpret"))
def _flash_forward(q: Array, k: Array, v: Array, scale: float,
                   q_block: int = DEFAULT_Q_BLOCK,
                   interpret: bool = False) -> Array:
    orig_shape = q.shape
    *lead, sq, d = q.shape
    skv = k.shape[-2]
    B = math.prod(lead) if lead else 1

    # Mosaic requires lane-aligned block shapes on hardware (unaligned lane
    # dims fail with 'unsupported shape cast'), so head_dim/kv pads are
    # explicit HBM pads. TODO(perf): fold the pad into the projection that
    # produces q/k/v.
    d_pad = _round_up(max(d, LANE), LANE)
    skv_pad = _round_up(skv, LANE)
    q_block = _fit_q_block(q_block, skv_pad, d_pad, q.dtype.itemsize)
    sq_pad = _round_up(sq, q_block)

    def prep(t, s_pad):
        t = t.reshape(B, t.shape[-2], d)
        return jnp.pad(t, ((0, 0), (0, s_pad - t.shape[1]), (0, d_pad - d)))

    qp, kp, vp = prep(q, sq_pad), prep(k, skv_pad), prep(v, skv_pad)

    grid = (B, sq_pad // q_block)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_len=skv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, d_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, sq_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * sq_pad * skv_pad * d_pad,
            bytes_accessed=(B * (sq_pad + 2 * skv_pad) * d_pad
                            * q.dtype.itemsize),
            transcendentals=B * sq_pad * skv_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq, :d].reshape(orig_shape)
