"""Pallas TPU kernel for temporal (frame-axis) attention.

The story's temporal attention is seq_len = f = 5 at every pixel: computed
as batched matmuls (the reference's rearrange + baddbmm, or a naive einsum)
it degenerates to ~10^5 tiny (5 x head_dim) MXU ops, each wasting >95% of
the 128x128 tile — measured at ~34% of the whole stage-2 sampling time.

This kernel never forms tiny matmuls. For a block of B pixel rows it keeps
q/k/v tiles (B, f, c) resident in VMEM with the full channel axis c = h*dh
in the lane dimension and computes, per (i, j) frame pair:

    s_ij (B, h) = (q_i * k_j) @ SEG          # SEG (c, h): head segment sums
    out_i      += (p_ij @ SEG^T) * v_j       # broadcast p back over channels

i.e. the head-wise dot products become one big elementwise multiply plus a
skinny (c x h) matmul, and the softmax runs on (B, h) tiles — everything in
fp32, everything lane-aligned, one HBM pass in and out.

f is a static small int (<= 8); B is padded to the block size (padded rows
compute garbage that is sliced off — softmax stays finite since all f
entries are real)."""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANE = 128
DEFAULT_BLOCK = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, seg_ref, segt_ref, o_ref, *,
            f: int, scale: float):
    seg = seg_ref[...].astype(q_ref.dtype)   # (c_pad, h)
    segt = segt_ref[...]                     # (h, c_pad) fp32

    for i in range(f):
        # re-read slices per use: VMEM refs are cheap, and short live
        # ranges keep Mosaic's scoped-vmem footprint small. Products stay in
        # the input dtype (bf16 ok — logits accumulate in fp32 via the seg
        # matmul's preferred_element_type, like flash attention's QK^T).
        q_i = q_ref[:, i, :] * jnp.asarray(scale, q_ref.dtype)
        # logits over heads: s[j] (B, h)
        s = [jax.lax.dot_general(
                q_i * k_ref[:, j, :], seg,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
             for j in range(f)]
        m = s[0]
        for j in range(1, f):
            m = jnp.maximum(m, s[j])
        denom = None
        for j in range(f):
            s[j] = jnp.exp(s[j] - m)
            denom = s[j] if denom is None else denom + s[j]
        inv = 1.0 / denom
        acc = None
        for j in range(f):
            p_c = jax.lax.dot_general(s[j] * inv, segt,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            term = p_c * v_ref[:, j, :].astype(jnp.float32)
            acc = term if acc is None else acc + term
        o_ref[:, i, :] = acc.astype(o_ref.dtype)


def _pick_block(f: int, c_pad: int, itemsize: int) -> int:
    """Largest power-of-two block keeping q/k/v/o tiles (double-buffered) +
    fp32 scratch under ~10 MB of VMEM."""
    budget = 8 * 1024 * 1024
    per_row = f * c_pad * itemsize * 8 + c_pad * 4 * 8
    block = budget // per_row
    p = 64
    while p * 2 <= min(block, DEFAULT_BLOCK):
        p *= 2
    return p


def _xla_reference(q: Array, k: Array, v: Array, heads: int,
                   scale: float) -> Array:
    """Differentiable oracle (same math) for the backward pass."""
    *lead, f, c = q.shape
    dh = c // heads

    def split(t):
        t = t.reshape(tuple(lead) + (f, heads, dh))
        return jnp.swapaxes(t, -3, -2)

    logits = jnp.einsum("...qd,...kd->...qk", split(q), split(k),
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    o = jnp.einsum("...qk,...kd->...qd", probs, split(v))
    return jnp.swapaxes(o, -3, -2).reshape(q.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def frame_attention(q: Array, k: Array, v: Array, heads: int,
                    scale: float | None = None, block: int | None = None,
                    interpret: bool = False) -> Array:
    """Temporal self-attention over the second-to-last (frame) axis.

    q, k, v: (..., f, c) with c = heads * head_dim; f <= 8 static.
    Returns (..., f, c) in q.dtype — equal to multi-head softmax attention
    with the frame axis as the sequence. Differentiable: Pallas forward,
    XLA-reference (recompute) backward."""
    return _fa_forward(q, k, v, heads, scale, block, interpret)


def _fa_fwd(q, k, v, heads, scale, block, interpret):
    return _fa_forward(q, k, v, heads, scale, block, interpret), (q, k, v)


def _fa_bwd(heads, scale, block, interpret, residuals, g):
    q, k, v = residuals
    if scale is None:
        scale = (q.shape[-1] // heads) ** -0.5
    _, vjp = jax.vjp(
        lambda a, b, c: _xla_reference(a, b, c, heads, scale), q, k, v)
    return vjp(g)


frame_attention.defvjp(_fa_fwd, _fa_bwd)


# ---------------------------------------------------------------------------
# (b, f, n, c) native layout — the fast path.
#
# The original kernel took (rows, f, c) tiles and sliced q_ref[:, i, :]:
# with f second-to-last, every per-frame slice reads ONE sublane out of each
# 8-sublane tile, forcing Mosaic relayouts — measured 13x slower than this
# formulation on v5e (7.8 ms vs 0.6 ms at stage-2 level-0 shapes). Here the
# story axis stays OUTER (exactly the model's natural (b, f, h, w, c)
# layout, so the temporal module needs no transposes at all) and tiles are
# (1, f, block_n, c_pad): q_ref[0, i] is a contiguous (block_n, c_pad)
# sublane x lane tile.
# ---------------------------------------------------------------------------


def _kernel_bfnc(q_ref, k_ref, v_ref, seg_ref, segt_ref, o_ref, *,
                 f: int, scale: float):
    seg = seg_ref[...].astype(q_ref.dtype)   # (c_pad, h)
    segt = segt_ref[...]                     # (h, c_pad) fp32
    for i in range(f):
        q_i = q_ref[0, i] * jnp.asarray(scale, q_ref.dtype)
        s = [jax.lax.dot_general(
                q_i * k_ref[0, j], seg,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
             for j in range(f)]
        m = s[0]
        for j in range(1, f):
            m = jnp.maximum(m, s[j])
        denom = None
        for j in range(f):
            s[j] = jnp.exp(s[j] - m)
            denom = s[j] if denom is None else denom + s[j]
        inv = 1.0 / denom
        acc = None
        for j in range(f):
            p_c = jax.lax.dot_general(s[j] * inv, segt,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            term = p_c * v_ref[0, j].astype(jnp.float32)
            acc = term if acc is None else acc + term
        o_ref[0, i] = acc.astype(o_ref.dtype)


def _bfnc_xla_reference(q, k, v, heads, scale, c_real):
    o = _xla_reference(jnp.swapaxes(q[..., :c_real], -3, -2),
                       jnp.swapaxes(k[..., :c_real], -3, -2),
                       jnp.swapaxes(v[..., :c_real], -3, -2), heads, scale)
    o = jnp.swapaxes(o, -3, -2)
    pad = [(0, 0)] * (q.ndim - 1) + [(0, q.shape[-1] - c_real)]
    return jnp.pad(o, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def frame_attention_bfnc(q: Array, k: Array, v: Array, heads: int,
                         c_real: int, scale: float | None = None,
                         block: int | None = None) -> Array:
    """Temporal attention on the model-native layout: q/k/v (b, f, n, c_pad)
    with lanes >= c_real zero (padded-projection contract; c_pad % 128 == 0,
    f <= 8 static). Attention runs across f at every token n. Returns
    (b, f, n, c_pad), zero in the pad lanes. Differentiable (XLA-recompute
    backward)."""
    return _bfnc_forward(q, k, v, heads, c_real, scale, block)


def _bfnc_fwd(q, k, v, heads, c_real, scale, block):
    return _bfnc_forward(q, k, v, heads, c_real, scale, block), (q, k, v)


def _bfnc_bwd(heads, c_real, scale, block, residuals, g):
    q, k, v = residuals
    if scale is None:
        scale = (c_real // heads) ** -0.5
    _, vjp = jax.vjp(
        lambda a, b, c: _bfnc_xla_reference(a, b, c, heads, scale, c_real),
        q, k, v)
    return vjp(g)


frame_attention_bfnc.defvjp(_bfnc_fwd, _bfnc_bwd)


def _pick_block_bfnc(f: int, c_pad: int, itemsize: int) -> int:
    """Largest power-of-two n-block keeping 4 double-buffered (f, block,
    c_pad) tiles + fp32 accumulators under ~8 MB of VMEM."""
    budget = 8 * 1024 * 1024
    per_row = f * c_pad * (itemsize * 8 + 8)
    block = max(budget // per_row, 8)
    p = 8
    while p * 2 <= min(block, 512):
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("heads", "c_real", "scale",
                                             "block"))
def _bfnc_forward(q, k, v, heads, c_real, scale=None, block=None):
    from rcdms_tpu.ops.flash import kernel_interpret

    b, f, n, c_pad = q.shape
    assert f <= 8 and c_pad % LANE == 0 and c_real % heads == 0, (
        f, c_pad, c_real, heads)
    dh = c_real // heads
    if scale is None:
        scale = dh ** -0.5
    if block is None:
        block = _pick_block_bfnc(f, c_pad, q.dtype.itemsize)
    block = min(block, _round_up(n, 8))
    n_pad = _round_up(n, block)
    if n_pad != n:
        # rare (the prior's 97 tokens): pad token rows; padded rows compute
        # garbage that is sliced off (softmax over f stays finite)
        padw = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        q, k, v = (jnp.pad(t, padw) for t in (q, k, v))

    seg = np.zeros((c_pad, heads), np.float32)
    for h in range(heads):
        seg[h * dh:(h + 1) * dh, h] = 1.0
    seg = jnp.asarray(seg)

    out = pl.pallas_call(
        functools.partial(_kernel_bfnc, f=f, scale=scale),
        grid=(b, n_pad // block),
        in_specs=[
            pl.BlockSpec((1, f, block, c_pad), lambda bi, ni: (bi, 0, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, block, c_pad), lambda bi, ni: (bi, 0, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, block, c_pad), lambda bi, ni: (bi, 0, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, heads), lambda bi, ni: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, c_pad), lambda bi, ni: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f, block, c_pad),
                               lambda bi, ni: (bi, 0, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f, n_pad, c_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * f * f * c_pad * 2,
            bytes_accessed=4 * b * n_pad * f * c_pad * q.dtype.itemsize,
            transcendentals=b * n_pad * f * f * heads,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=kernel_interpret(),
    )(q, k, v, seg, seg.T)
    if n_pad != n:
        out = out[:, :, :n]
    return out


# ---------------------------------------------------------------------------
# Packed layout: q/k/v arrive (..., f, c_pad) with the real c channels in
# the leading lanes and zeros beyond (written directly by the producing
# projection, core/layers.py::PaddedDense) — no runtime HBM pad, and the
# output keeps the padded layout for a row-padded out-projection.
# ---------------------------------------------------------------------------


def _packed_xla_reference(q, k, v, heads, scale, c_real):
    c_pad = q.shape[-1]
    o = _xla_reference(q[..., :c_real], k[..., :c_real], v[..., :c_real],
                       heads, scale)
    pad = [(0, 0)] * (q.ndim - 1) + [(0, c_pad - c_real)]
    return jnp.pad(o, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def frame_attention_packed(q: Array, k: Array, v: Array, heads: int,
                           c_real: int, scale: float | None = None,
                           block: int | None = None) -> Array:
    """frame_attention on pre-padded channels: q/k/v (..., f, c_pad) with
    lanes >= c_real zero. Returns (..., f, c_pad), zero in the pad lanes."""
    return _fa_forward_padded(q, k, v, heads, c_real, scale, block)


def _fa_packed_fwd(q, k, v, heads, c_real, scale, block):
    return (_fa_forward_padded(q, k, v, heads, c_real, scale, block),
            (q, k, v))


def _fa_packed_bwd(heads, c_real, scale, block, residuals, g):
    q, k, v = residuals
    if scale is None:
        scale = (c_real // heads) ** -0.5
    _, vjp = jax.vjp(
        lambda a, b, c: _packed_xla_reference(a, b, c, heads, scale, c_real),
        q, k, v)
    return vjp(g)


frame_attention_packed.defvjp(_fa_packed_fwd, _fa_packed_bwd)


@functools.partial(jax.jit, static_argnames=("heads", "c_real", "scale",
                                             "block"))
def _fa_forward_padded(q, k, v, heads, c_real, scale=None, block=None):
    from rcdms_tpu.ops.flash import kernel_interpret

    *lead, f, c_pad = q.shape
    assert c_pad % LANE == 0 and c_real % heads == 0
    if scale is None:
        scale = (c_real // heads) ** -0.5
    return _fa_call(q, k, v, heads, c_real, scale, block,
                    kernel_interpret(), out_c=c_pad)


@functools.partial(jax.jit,
                   static_argnames=("heads", "scale", "block", "interpret"))
def _fa_forward(q: Array, k: Array, v: Array, heads: int,
                scale: float | None = None, block: int | None = None,
                interpret: bool = False) -> Array:
    c = q.shape[-1]
    if scale is None:
        scale = (c // heads) ** -0.5
    return _fa_call(q, k, v, heads, c, scale, block, interpret, out_c=c)


def _fa_call(q: Array, k: Array, v: Array, heads: int, c_real: int,
             scale: float, block: int | None, interpret: bool,
             out_c: int) -> Array:
    *lead, f, c = q.shape
    assert f <= 8, f"frame_attention is for tiny frame axes, got f={f}"
    assert c_real % heads == 0
    B = math.prod(lead) if lead else 1

    c_pad = _round_up(c, LANE)
    if block is None:
        block = _pick_block(f, c_pad, q.dtype.itemsize)
    b_pad = _round_up(B, block)

    def prep(t):
        t = t.reshape(B, f, c)
        if b_pad == B and c_pad == c:
            return t
        return jnp.pad(t, ((0, b_pad - B), (0, 0), (0, c_pad - c)))

    qp, kp, vp = prep(q), prep(k), prep(v)

    # head-segment matrix: SEG[d, h] = 1 iff channel d belongs to head h
    # (zero rows for channels >= c_real, so pad lanes never reach a head)
    dh = c_real // heads
    seg = np.zeros((c_pad, heads), np.float32)
    for h in range(heads):
        seg[h * dh:(h + 1) * dh, h] = 1.0
    seg = jnp.asarray(seg)

    out = pl.pallas_call(
        functools.partial(_kernel, f=f, scale=scale),
        grid=(b_pad // block,),
        in_specs=[
            pl.BlockSpec((block, f, c_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, f, c_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, f, c_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, heads), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, c_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, f, c_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, f, c_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * f * f * c_pad * 2,
            bytes_accessed=4 * b_pad * f * c_pad * q.dtype.itemsize,
            transcendentals=b_pad * f * f * heads,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp, seg, seg.T)
    if b_pad == B and out_c == c_pad:
        return out.reshape(tuple(lead) + (f, out_c))
    return out[:B, :, :out_c].reshape(tuple(lead) + (f, out_c))
