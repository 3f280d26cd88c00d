"""Pallas TPU fused-attention kernels (SURVEY.md §7 step 8).

One grid cell = one (batch*head, q-block): the q block, the FULL K/V for
that head, and the fp32 score tile all live in VMEM, so the softmax never
round-trips HBM (at RCDMs scales — spatial seq <= 4096, head_dim <= 160 —
K/V per head is <= ~2 MB, far under the ~16 MB VMEM budget; no online-
softmax streaming needed). Inputs may be bf16; scores and the
softmax run in fp32 on the MXU/VPU.

Two entry points:

  * flash_attention_nt — the hot path. Channel-major (..., C, S) operands
    with head_dim on SUBLANES, produced natively by DenseNT projections
    (core/layers.py): the score matmul contracts the REAL dh (no 128-lane
    pad; matmul time scales with the true contraction size at ~8-row
    granularity — BASELINE.md round-3 study, ~2.9x cheaper at SD1.5
    level-0's dh=40) and softmax normalization is deferred until after the
    PV matmul. Replaced the round-2 "packed" head-interleave kernel
    (measured 2.556 s vs 2.702 s stage-2 story p50 on a v5e chip).
  * flash_attention — token-major fallback with runtime pads for shapes
    the nt kernel rejects (used via ops/attention.dot_product_attention).

The XLA path in rcdms_tpu.ops.attention is the correctness oracle; tests
run these kernels in interpret mode on CPU against it."""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

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
        # lane multiples only — Mosaic rejects unaligned block shapes
        q_block = max(128, (q_block // 2) // 128 * 128)
    return q_block


# ---------------------------------------------------------------------------
# Channel-major ("nt") layout: q/k/v arrive (..., C, S) with C = heads*dh
# UNPADDED (dh on sublanes; 40/80/160 are all multiples of the 8-row
# sublane granularity). The score matmul contracts the SUBLANE dims, so a
# dh=40 head costs dh/128 of the padded formulation's MXU time
# (tools/mxu_pad_study.py: matmul time scales with REAL contraction size —
# k=40 runs at 172 TF/s real-FLOP rate vs 128-padded at 1/2.9 of that).
# The producing projections emit this layout natively via dot_general
# dimension ordering (core/layers.py::DenseNT — no transpose op anywhere),
# and the out-projection consumes it the same way (DenseTN).
# ---------------------------------------------------------------------------


def _nt_kernel(qt_ref, kt_ref, vt_ref, o_ref, *, scale: float, kv_len: int):
    qt = qt_ref[0]           # (dh, blk_q)
    kt = kt_ref[0]           # (dh, skv)
    vt = vt_ref[0]           # (dh, skv)
    s = jax.lax.dot_general(qt, kt, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale            # (blk_q, skv)
    if kv_len != kt.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m).astype(vt.dtype)   # unnormalized
    # o^T (dh, blk_q): contract the LANE (skv) dims
    ot = jax.lax.dot_general(vt, p, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # normalize AFTER the PV matmul: the row sums land transposed (1, blk)
    # via a skinny ones-matmul, and the division touches (dh, blk) instead
    # of the (blk, skv) probability tile — one fewer big VPU pass
    ones = jnp.ones((1, p.shape[1]), p.dtype)
    l_t = jax.lax.dot_general(ones, p, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (1, blk)
    o_ref[0] = (ot * (1.0 / l_t)).astype(o_ref.dtype)


def nt_ok(sq: int, skv: int, heads: int, dh: int) -> bool:
    """Shapes the channel-major kernel handles: token counts lane-aligned
    at some block size, head_dim sublane-aligned."""
    return (dh % 8 == 0 and skv % LANE == 0
            and sq % min(_round_up(sq, LANE), DEFAULT_Q_BLOCK) == 0)


def _nt_xla_reference(qt: Array, kt: Array, vt: Array, heads: int,
                      scale: float, kv_len: int | None = None) -> Array:
    """Oracle on the channel-major layout (differentiable)."""
    *lead, c, sq = qt.shape
    dh = c // heads
    skv = kt.shape[-1]
    real = kv_len if kv_len is not None else skv

    def split(t):  # (..., c, s) -> (..., h, s, dh)
        t = t.reshape(tuple(lead) + (heads, dh, t.shape[-1]))
        return jnp.swapaxes(t, -1, -2)

    q, k, v = split(qt), split(kt), split(vt)
    if real != skv:
        k = k[..., :real, :]
        v = v[..., :real, :]
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(qt.dtype)
    o = jnp.einsum("...qk,...kd->...qd", probs, v)  # (..., h, sq, dh)
    o = jnp.swapaxes(o, -1, -2).reshape(tuple(lead) + (c, sq))
    return o


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_nt(qt: Array, kt: Array, vt: Array, heads: int,
                       scale: float, q_block: int = DEFAULT_Q_BLOCK,
                       kv_len: int | None = None) -> Array:
    """Fused attention on channel-major (..., C, S) inputs, C = heads*dh
    unpadded. `kv_len`: real KV tokens when the caller lane-padded the
    context sequence (cross attention). Returns (..., C, Sq) in qt.dtype.
    Differentiable (XLA-recompute backward)."""
    return _flash_nt_forward(qt, kt, vt, heads, scale, q_block, kv_len)


def _flash_nt_fwd(qt, kt, vt, heads, scale, q_block, kv_len):
    return (_flash_nt_forward(qt, kt, vt, heads, scale, q_block, kv_len),
            (qt, kt, vt))


def _flash_nt_bwd(heads, scale, q_block, kv_len, residuals, g):
    qt, kt, vt = residuals
    skv = kt.shape[-1]
    real = kv_len if kv_len is not None else skv

    def ref(a, b, c):
        return _nt_xla_reference(a, b, c, heads, scale, real)

    _, vjp = jax.vjp(ref, qt, kt, vt)
    return vjp(g)


flash_attention_nt.defvjp(_flash_nt_fwd, _flash_nt_bwd)


def _nt_compute(qt: Array, kt: Array, vt: Array, heads: int,
                scale: float, q_block: int, kv_len: int) -> Array:
    """Shape-polymorphic core: runs the Pallas kernel when the (possibly
    per-shard) shapes satisfy nt_ok, the XLA oracle otherwise. Under SPMD
    partitioning this is the per-device lowering — q may arrive with only
    its local token rows (e.g. 'space'-sharded latent rows), K/V always
    arrive with the full context (the partitioner all-gathers them, exactly
    the communication the einsum path pays)."""
    *_, c, sq = qt.shape
    skv = kt.shape[-1]
    if nt_ok(sq, skv, heads, c // heads):
        return _nt_pallas(qt, kt, vt, heads, scale, q_block, kv_len)
    return _nt_xla_reference(qt, kt, vt, heads, scale, kv_len)


def _nt_specs(mesh, arg_shapes):
    """Sanitized (q, kv) NamedShardings for the SPMD lowering: q keeps its
    batch/token sharding but the channel axis must be whole per shard; K/V
    additionally keep all context tokens per shard (kv_len masking indexes
    the global sequence)."""
    nd = len(arg_shapes[0].shape)
    spec = list(arg_shapes[0].sharding.spec)
    spec += [None] * (nd - len(spec))
    spec[-2] = None
    q_s = NamedSharding(mesh, P(*spec))
    kv = list(spec)
    kv[-1] = None
    return q_s, NamedSharding(mesh, P(*kv))


def _nt_partition(heads, scale, q_block, kv_len, mesh, arg_shapes,
                  result_shape):
    q_s, kv_s = _nt_specs(mesh, arg_shapes)

    def lower_fn(qt, kt, vt):
        return _nt_compute(qt, kt, vt, heads, scale, q_block, kv_len)

    return mesh, lower_fn, q_s, (q_s, kv_s, kv_s)


def _nt_infer(heads, scale, q_block, kv_len, mesh, arg_shapes, result_shape):
    return _nt_specs(mesh, arg_shapes)[0]


def _nt_rule(heads, scale, q_block, kv_len, mesh, value_types, result_types):
    """Shardy propagation rule: batch dims and q tokens propagate; the
    channel axis and the context tokens are replicated per shard (factor
    names ordered by first appearance — Shardy requires sorted indices)."""
    lead = " ".join(f"l{i}" for i in range(len(value_types[0].shape) - 2))
    q = f"{lead} c sq".strip()
    kv = f"{lead} c skv".strip()
    return (f"{q}, {kv}, {kv} -> {q}",
            dict(need_replication_factors=("c", "skv")))


_nt_spmd = custom_partitioning(_nt_compute, static_argnums=(3, 4, 5, 6))
_nt_spmd.def_partition(partition=_nt_partition,
                       infer_sharding_from_operands=_nt_infer,
                       sharding_rule=_nt_rule)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "q_block",
                                             "kv_len"))
def _flash_nt_forward(qt: Array, kt: Array, vt: Array, heads: int,
                      scale: float, q_block: int = DEFAULT_Q_BLOCK,
                      kv_len: int | None = None) -> Array:
    *_, c, sq = qt.shape
    skv = kt.shape[-1]
    assert c % heads == 0, (c, heads)
    assert nt_ok(sq, skv, heads, c // heads), (sq, skv, heads, c // heads)
    if kv_len is None:
        kv_len = skv
    return _nt_spmd(qt, kt, vt, heads, scale, q_block, kv_len)


def _nt_pallas(qt: Array, kt: Array, vt: Array, heads: int,
               scale: float, q_block: int, kv_len: int) -> Array:
    orig_shape = qt.shape
    *lead, c, sq = qt.shape
    skv = kt.shape[-1]
    dh = c // heads
    B = math.prod(lead) if lead else 1

    q_block = min(q_block, _round_up(sq, LANE))
    # fp32 score tile (q_block, skv) + operands under ~12 MB; shrink ONLY
    # through lane multiples (e.g. 384 -> 256, never 192 — Mosaic rejects
    # lane-unaligned block shapes) while q rows still tile sq
    while q_block > LANE and q_block * skv * 4 > 12 * 1024 * 1024:
        q_block = max(LANE, (q_block // 2) // LANE * LANE)
        while q_block > LANE and sq % q_block:
            q_block -= LANE

    qt3 = qt.reshape(B, c, sq)
    kt3 = kt.reshape(B, c, skv)
    vt3 = vt.reshape(B, c, skv)

    grid = (B, heads, sq // q_block)
    out = pl.pallas_call(
        functools.partial(_nt_kernel, scale=scale, kv_len=kv_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dh, q_block), lambda b, h, i: (b, h, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, skv), lambda b, h, i: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, skv), lambda b, h, i: (b, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, dh, q_block), lambda b, h, i: (b, h, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, c, sq), qt.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * sq * skv * c,
            bytes_accessed=(B * (2 * sq + 2 * skv) * c * qt.dtype.itemsize),
            transcendentals=B * heads * sq * skv,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_INTERPRET,
    )(qt3, kt3, vt3)
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
    # explicit HBM pads here. This fallback kernel is off the TPU hot path
    # — the nt kernel needs no pads at all (channel-major, real-dh
    # contraction) and PaddedDense folds pads into projections where the
    # frame kernel needs them.
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
