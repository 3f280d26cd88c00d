"""Fused GEGLU feed-forward Pallas kernel.

The transformer FF (reference diffusers `FeedForward`, used by
`src/models/attention.py:368-526` and `motion_module.py:185-246`) is two
chained matmuls with a GEGLU between:

    y = (gelu(x @ W1g + b1g) * (x @ W1h + b1h)) @ W2 + b2

XLA cannot fuse two dots, so the (tokens, 4c) intermediate round-trips HBM
twice per FF — at SD1.5 level 0 that is a (20480, 2560) bf16 tensor
(~105 MB) written and re-read at memory speed ~20x per UNet call
(BASELINE.md round 3: residual/FF traffic ~247 ms of the 2 491 ms story
step). This kernel tiles tokens x inner: each grid cell computes a
(blk_n, blk_i) slice of the intermediate IN VMEM, applies the exact-erf
GEGLU, and accumulates its W2 contribution into an fp32 scratch — the
intermediate never touches HBM.

Differentiable: forward runs the kernel, backward recomputes through the
XLA reference (remat-style, like ops/flash.py). Under SPMD the op carries a
custom-partitioning rule: token rows stay sharded (the FF is elementwise
across tokens), weights are replicated, zero communication.

The XLA reference is the correctness oracle; tests run the kernel in
interpret mode on CPU against it."""

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

VMEM_BUDGET = 12 * 1024 * 1024


def _gelu_exact(x: Array) -> Array:
    """Exact (erf) gelu in fp32 — parity with torch's default, same as
    core/layers.FeedForward."""
    return jax.nn.gelu(x, approximate=False)


def _gelu_kernel(x: Array) -> Array:
    """Erf-gelu inside the kernel. Mosaic has no erf/erfc lowering, so erf
    is computed with the Abramowitz & Stegun 7.1.26 rational approximation
    (|err| <= 1.5e-7 — far below bf16 resolution and below the fp32 test
    tolerance) built from exp, which the VPU supports."""
    z = x * (2.0 ** -0.5)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf = jnp.sign(z) * erf_abs
    return 0.5 * x * (1.0 + erf)


def _xla_reference(x: Array, w1: Array, b1: Array, w2: Array,
                   b2: Array) -> Array:
    """Unfused oracle (same math as core/layers.FeedForward's geglu branch,
    differentiable) — backward pass + CPU/odd-shape fallback."""
    dtype = x.dtype
    h = (jnp.dot(x, w1.astype(dtype)) + b1.astype(dtype))
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * _gelu_exact(gate.astype(jnp.float32)).astype(dtype)
    return jnp.dot(h, w2.astype(dtype)) + b2.astype(dtype)


def _xla_gelu_reference(x: Array, w1: Array, b1: Array, w2: Array,
                        b2: Array) -> Array:
    """Unfused oracle for the plain-gelu FF (the prior's spatial blocks,
    core/layers.FeedForward activation='gelu'), differentiable."""
    dtype = x.dtype
    h = jnp.dot(x, w1.astype(dtype)) + b1.astype(dtype)
    h = _gelu_exact(h.astype(jnp.float32)).astype(dtype)
    return jnp.dot(h, w2.astype(dtype)) + b2.astype(dtype)


# measured-best (blk_n, blk_i) per (c, inner) — tools/geglu_study.py sweep
# on a v5e chip, 2026-08-18: L0 116 TF/s (c=320 lane pad caps it), L1
# 161 TF/s, L2 170 TF/s vs the ~175-187 TF/s bare-dot ceiling.
# (2048, 8192) is the prior's FF at flattened rows (970 -> 1024) —
# tools/prior_ff_study.py sweep, round 5.
_BEST_BLOCKS = {
    # L0/L1 were re-swept round 5 with the widened blk_i grid
    # (tools/geglu_study.py): (512,1280)/(256,512) beat these picks by
    # 6%/9% in-chain but measured NEUTRAL end-to-end (stage-2 p50 2.178 s
    # vs the 2.17-2.18 floor) — REJECTED, constants kept (BASELINE.md r5).
    (320, 1280): (1024, 1280),
    (640, 2560): (512, 512),
    (1280, 5120): (256, 512),
    # full-row blk_n: the x tile loads ONCE and stays VMEM-resident across
    # the whole inner sweep (21.5 MB estimated, fits the 24 MB kernel
    # limit). 223 TF/s geglu / 240 TF/s gelu vs 149/139 at the scan's
    # (512, 128) pick — tools/prior_ff_study.py sweep.
    (2048, 8192): (1024, 128),
}

# study/test hook: when set, both pallas paths use these (blk_n, blk_i)
# verbatim (tools/prior_ff_study.py block sweep). Not a production knob.
_BLOCK_OVERRIDE: tuple | None = None


def set_block_override(blocks: tuple | None) -> None:
    global _BLOCK_OVERRIDE
    _BLOCK_OVERRIDE = blocks


def _vmem_estimate(blk_n: int, blk_i: int, c: int, itemsize: int) -> int:
    """Double-buffered x/w1h/w1g/w2 tiles + fp32 h/g/a temporaries + the
    fp32 scratch accumulator."""
    tiles = (blk_n * c + 3 * c * blk_i) * itemsize * 2
    temps = 3 * blk_n * blk_i * 4 + blk_n * c * 4
    return tiles + temps


def _pick_block(n: int, c: int, inner: int, itemsize: int):
    """(blk_n, blk_i) fitting the VMEM budget, or None if the shapes do not
    tile cleanly."""
    best = _BEST_BLOCKS.get((c, inner))
    if (best is not None and n % best[0] == 0 and inner % best[1] == 0
            # the measured-best table was swept at bf16 near the 24 MB
            # kernel limit; fp32 inputs double the tile bytes and must
            # re-qualify or fall through to the conservative scan
            and _vmem_estimate(best[0], best[1], c,
                               itemsize) <= 2 * VMEM_BUDGET):
        return best
    for blk_n in (512, 256, 128, 64):
        if n % blk_n:
            continue
        for blk_i in (1280, 1024, 640, 512, 320, 256, 128):
            if inner % blk_i:
                continue
            if _vmem_estimate(blk_n, blk_i, c, itemsize) <= VMEM_BUDGET:
                return blk_n, blk_i
    return None


def fits_kernel(n: int, c: int, inner: int, itemsize: int = 2) -> bool:
    return n >= 128 and _pick_block(n, c, inner, itemsize) is not None


def _ff_kernel(x_ref, w1h_ref, w1g_ref, b1h_ref, b1g_ref, w2_ref, b2_ref,
               o_ref, acc_ref, *, n_ib: int):
    ib = pl.program_id(2)
    x = x_ref[0]                                    # (blk_n, c)
    h = jax.lax.dot_general(x, w1h_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(x, w1g_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1h_ref[...].astype(jnp.float32)
    g = g + b1g_ref[...].astype(jnp.float32)
    a = (h * _gelu_kernel(g)).astype(x.dtype)       # (blk_n, blk_i)

    @pl.when(ib == 0)
    def _init():
        acc_ref[...] = jnp.broadcast_to(b2_ref[...].astype(jnp.float32),
                                        acc_ref.shape)

    acc_ref[...] += jax.lax.dot_general(
        a, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ib == n_ib - 1)
    def _flush():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _ff_pallas(x: Array, w1: Array, b1: Array, w2: Array,
               b2: Array) -> Array:
    from rcdms_tpu.ops.flash import kernel_interpret

    *lead, n, c = x.shape
    inner = w2.shape[0]
    blocks = _BLOCK_OVERRIDE or _pick_block(n, c, inner, x.dtype.itemsize)
    if blocks is None:
        return _xla_reference(x, w1, b1, w2, b2)
    blk_n, blk_i = blocks
    n_ib = inner // blk_i
    B = math.prod(lead) if lead else 1
    xf = x.reshape(B, n, c)
    dtype = x.dtype
    w1 = w1.astype(dtype)
    w2 = w2.astype(dtype)
    b1 = b1.astype(dtype).reshape(1, 2 * inner)
    b2 = b2.astype(dtype).reshape(1, c)

    out = pl.pallas_call(
        functools.partial(_ff_kernel, n_ib=n_ib),
        grid=(B, n // blk_n, n_ib),
        in_specs=[
            pl.BlockSpec((1, blk_n, c), lambda b, ni, ib: (b, ni, 0),
                         memory_space=pltpu.VMEM),
            # W1's h columns [0, inner) and gate columns [inner, 2*inner)
            # — the same array passed twice with offset index maps
            pl.BlockSpec((c, blk_i), lambda b, ni, ib: (0, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, blk_i),
                         lambda b, ni, ib, n_ib=n_ib: (0, n_ib + ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_i), lambda b, ni, ib: (0, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_i),
                         lambda b, ni, ib, n_ib=n_ib: (0, n_ib + ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_i, c), lambda b, ni, ib: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, ni, ib: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_n, c), lambda b, ni, ib: (b, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, c), dtype),
        scratch_shapes=[pltpu.VMEM((blk_n, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=2 * VMEM_BUDGET),
        interpret=kernel_interpret(),
    )(xf, w1, w1, b1, b1, w2, b2)
    return out.reshape(x.shape)


def _ff_specs(mesh, arg_shapes):
    """x keeps its leading/token sharding (the FF is elementwise across
    tokens) but the channel axis must be whole; weights are replicated."""
    nd = len(arg_shapes[0].shape)
    spec = list(arg_shapes[0].sharding.spec)
    spec += [None] * (nd - len(spec))
    spec[-1] = None
    x_s = NamedSharding(mesh, P(*spec))
    r = NamedSharding(mesh, P())
    return x_s, r


def _ff_partition(mesh, arg_shapes, result_shape):
    x_s, r = _ff_specs(mesh, arg_shapes)

    def lower_fn(x, w1, b1, w2, b2):
        return _ff_pallas(x, w1, b1, w2, b2)

    return mesh, lower_fn, x_s, (x_s, r, r, r, r)


def _ff_infer(mesh, arg_shapes, result_shape):
    return _ff_specs(mesh, arg_shapes)[0]


def _ff_rule(mesh, value_types, result_types):
    """Shardy propagation: leading/token dims propagate; channel and all
    weight dims are replicated per shard."""
    lead = " ".join(f"l{i}" for i in range(len(value_types[0].shape) - 2))
    x = f"{lead} n c".strip()
    return (f"{x}, c k, k, i c, c -> {x}",
            dict(need_replication_factors=("c", "k", "i")))


_ff_spmd = custom_partitioning(_ff_pallas)
_ff_spmd.def_partition(partition=_ff_partition,
                       infer_sharding_from_operands=_ff_infer,
                       sharding_rule=_ff_rule)


@jax.custom_vjp
def geglu_ff(x: Array, w1: Array, b1: Array, w2: Array, b2: Array) -> Array:
    """Fused y = (gelu(x@W1[:, i:]) * (x@W1[:, :i])) @ W2 + biases.

    x: (..., n, c); w1: (c, 2i); b1: (2i,); w2: (i, c); b2: (c,).
    Forward runs the Pallas kernel (intermediate stays in VMEM); backward
    recomputes through the XLA reference."""
    return _ff_spmd(x, w1, b1, w2, b2)


def _ff_fwd(x, w1, b1, w2, b2):
    return _ff_spmd(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _ff_bwd(residuals, g):
    x, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(_xla_reference, x, w1, b1, w2, b2)
    return vjp(g.astype(x.dtype))


geglu_ff.defvjp(_ff_fwd, _ff_bwd)


# ---------------------------------------------------------------------------
# plain-gelu fused FF (the prior's spatial blocks — reference FeedForward
# with `geglu=False`, i.e. Dense -> exact gelu -> Dense). Same tiling as the
# geglu kernel with the gate half removed: one up-proj tile per grid cell.
# ---------------------------------------------------------------------------


def _ff_gelu_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref,
                    *, n_ib: int):
    ib = pl.program_id(2)
    x = x_ref[0]                                    # (blk_n, c)
    h = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    a = _gelu_kernel(h).astype(x.dtype)             # (blk_n, blk_i)

    @pl.when(ib == 0)
    def _init():
        acc_ref[...] = jnp.broadcast_to(b2_ref[...].astype(jnp.float32),
                                        acc_ref.shape)

    acc_ref[...] += jax.lax.dot_general(
        a, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ib == n_ib - 1)
    def _flush():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _ff_gelu_pallas(x: Array, w1: Array, b1: Array, w2: Array,
                    b2: Array) -> Array:
    from rcdms_tpu.ops.flash import kernel_interpret

    *lead, n, c = x.shape
    inner = w2.shape[0]
    blocks = _BLOCK_OVERRIDE or _pick_block(n, c, inner, x.dtype.itemsize)
    if blocks is None:
        return _xla_gelu_reference(x, w1, b1, w2, b2)
    blk_n, blk_i = blocks
    n_ib = inner // blk_i
    B = math.prod(lead) if lead else 1
    xf = x.reshape(B, n, c)
    dtype = x.dtype
    w1 = w1.astype(dtype)
    w2 = w2.astype(dtype)
    b1 = b1.astype(dtype).reshape(1, inner)
    b2 = b2.astype(dtype).reshape(1, c)

    out = pl.pallas_call(
        functools.partial(_ff_gelu_kernel, n_ib=n_ib),
        grid=(B, n // blk_n, n_ib),
        in_specs=[
            pl.BlockSpec((1, blk_n, c), lambda b, ni, ib: (b, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, blk_i), lambda b, ni, ib: (0, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_i), lambda b, ni, ib: (0, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_i, c), lambda b, ni, ib: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, ni, ib: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_n, c), lambda b, ni, ib: (b, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, c), dtype),
        scratch_shapes=[pltpu.VMEM((blk_n, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=2 * VMEM_BUDGET),
        interpret=kernel_interpret(),
    )(xf, w1, b1, w2, b2)
    return out.reshape(x.shape)


def _ff_gelu_partition(mesh, arg_shapes, result_shape):
    x_s, r = _ff_specs(mesh, arg_shapes)

    def lower_fn(x, w1, b1, w2, b2):
        return _ff_gelu_pallas(x, w1, b1, w2, b2)

    return mesh, lower_fn, x_s, (x_s, r, r, r, r)


_ff_gelu_spmd = custom_partitioning(_ff_gelu_pallas)
_ff_gelu_spmd.def_partition(partition=_ff_gelu_partition,
                            infer_sharding_from_operands=_ff_infer,
                            sharding_rule=_ff_rule)


@jax.custom_vjp
def gelu_ff(x: Array, w1: Array, b1: Array, w2: Array, b2: Array) -> Array:
    """Fused y = gelu(x @ W1 + b1) @ W2 + b2 (exact-erf gelu).

    x: (..., n, c); w1: (c, i); b1: (i,); w2: (i, c); b2: (c,).
    Forward runs the Pallas kernel (the (n, i) intermediate stays in VMEM);
    backward recomputes through the XLA reference."""
    return _ff_gelu_spmd(x, w1, b1, w2, b2)


def _ff_gelu_fwd(x, w1, b1, w2, b2):
    return _ff_gelu_spmd(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _ff_gelu_bwd(residuals, g):
    x, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(_xla_gelu_reference, x, w1, b1, w2, b2)
    return vjp(g.astype(x.dtype))


gelu_ff.defvjp(_ff_gelu_fwd, _ff_gelu_bwd)


def ff_flat(fn, x: Array, w1: Array, b1: Array, w2: Array,
            b2: Array) -> Array:
    """Run a fused FF on inputs whose token dim is too short to tile
    (the prior's 97-token sequences): the FF is pointwise over tokens, so
    all leading dims flatten into one row axis, zero-padded to a 128
    multiple (padded rows compute bias-only garbage and are sliced away).
    Single-chip only — flattening would mix sharded axes under a mesh
    (core/layers.FeedForward gates on spmd_mesh_mode())."""
    lead, c = x.shape[:-1], x.shape[-1]
    rows = math.prod(lead)
    pad = -rows % 128
    xf = x.reshape(rows, c)
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    return fn(xf, w1, b1, w2, b2)[:rows].reshape(*lead, c)
