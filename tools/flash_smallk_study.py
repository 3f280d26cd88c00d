"""Pallas small-head-dim attention kernel study (round 3).

tools/mxu_pad_study.py showed XLA matmuls execute contraction at ~8-row
(sublane) granularity: a k=40 contraction costs ~40/128 of a k=128 one at
the same m, n (172 TF/s real-FLOP rate at k=40). The packed flash kernel
pads dh=40 -> 128 lanes, so its two big matmuls burn ~3.2x the necessary
MXU time at SD1.5 level 0 (535 ms of the 2.62 s stage-2 story).

This script times in-kernel dot formulations at level-0 shapes
(B = b*heads = 80, Sq = Skv = 4096, dh = 40, bf16) to find one Mosaic
accepts AND executes at the small-k rate:

  base128   current kernel shape: dot over the full 128-lane group
  slice40   dot over a 40-lane slice of the group (lane-unaligned operands)
  nt40      transposed operands (dh on sublanes, contract dim 0) — the
            layout the projections can emit natively via dot_general
            dimension ordering (no runtime transpose)

Each variant runs the score matmul + softmax + PV matmul (a full attention
block), so the measured time is comparable end to end.

Usage: python tools/flash_smallk_study.py
"""

from __future__ import annotations

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  __import__("os").path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, SQ, SKV, DH, GROUP = 80, 4096, 4096, 40, 128
BLK_Q = 512
SCALE = DH ** -0.5


def slope_time(run, x, n1=4, n2=24):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(t, n):
        return jax.lax.fori_loop(0, n, lambda i, a: run(a), t)

    def timed(n):
        chain(x, n)[(0,) * x.ndim].block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = chain(x, n)
            _ = np.asarray(r[(0,) * r.ndim])
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1)


# --- variant kernels -------------------------------------------------------


def _kernel_base128(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * SCALE
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _kernel_slice40(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0][:, :DH]
    k = k_ref[0][:, :DH]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * SCALE
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _kernel_nt40(qt_ref, kt_ref, vt_ref, ot_ref):
    """Transposed layout: q^T (dh, Sq-blk), k^T (dh, Skv), v^T (dh, Skv);
    score contracts the SUBLANE (dh) dims; PV contracts lanes; output is
    o^T (dh, Sq-blk)."""
    qt = qt_ref[0]            # (DH, BLK_Q)
    kt = kt_ref[0]            # (DH, SKV)
    vt = vt_ref[0]            # (DH, SKV)
    s = jax.lax.dot_general(qt, kt, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * SCALE
    # s: (BLK_Q, SKV) — softmax over lanes as usual
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(vt.dtype)
    # o^T (DH, BLK_Q) = v^T (DH, SKV) @ p^T — contract the lane dims
    ot = jax.lax.dot_general(vt, p, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ot_ref[0] = ot.astype(ot_ref.dtype)


def _kernel_nt_t40(qt_ref, kt_ref, vt_ref, ot_ref):
    """s^T formulation: score (skv, blk) via the same sublane contraction
    with operands swapped; softmax over SUBLANES; PV becomes a STANDARD
    (dh, skv) x (skv, blk) matmul at real-dh rate; l lands as (1, blk) so
    post-PV normalization needs no transpose."""
    qt = qt_ref[0]            # (DH, BLK_Q)
    kt = kt_ref[0]            # (DH, SKV)
    vt = vt_ref[0]            # (DH, SKV)
    st = jax.lax.dot_general(kt, qt, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    st = st * SCALE           # (SKV, BLK_Q)
    m = jnp.max(st, axis=0, keepdims=True)
    p = jnp.exp(st - m).astype(vt.dtype)
    l = jnp.sum(p.astype(jnp.float32), axis=0, keepdims=True)  # (1, blk)
    ot = jax.lax.dot_general(vt, p, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ot_ref[0] = (ot * (1.0 / l)).astype(ot_ref.dtype)


def run_variant(name, kernel, q, k, v, transposed=False):
    if transposed:
        grid = (B, SQ // BLK_Q)
        in_specs = [
            pl.BlockSpec((1, DH, BLK_Q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DH, SKV), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DH, SKV), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec((1, DH, BLK_Q), lambda b, i: (b, 0, i),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, DH, SQ), q.dtype)
    else:
        d = q.shape[-1]
        grid = (B, SQ // BLK_Q)
        in_specs = [
            pl.BlockSpec((1, BLK_Q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SKV, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SKV, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec((1, BLK_Q, d), lambda b, i: (b, i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, SQ, d), q.dtype)

    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))

    def step(t):
        y = call(t, k, v)
        s = (jnp.sum(y.astype(jnp.float32)) * 1e-20 + 1.0).astype(t.dtype)
        return t * s

    try:
        sec = slope_time(step, q)
    except Exception as e:
        print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    useful = 4 * B * SQ * SKV * DH
    print(f"{name:10s} {sec * 1e3:8.3f} ms  {useful / sec / 1e12:6.1f} "
          f"TF/s (real-FLOP rate)")
    return sec


# --- isolated single-matmul kernels (which dot is slow?) -------------------
# One (BLK_Q, SKV)-cell matmul per grid step; the product is reduced to a
# (BLK_Q, 128) sum tile in-kernel so nothing is DCE'd and the output write
# is negligible. Real flops per cell printed for comparison.


def _iso_call(kernel, a_tile, a_index, b_tile, a_full, b_full, cells):
    return pl.pallas_call(
        kernel,
        grid=(B, cells),
        in_specs=[
            pl.BlockSpec((1,) + a_tile, a_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + b_tile, lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK_Q, 128), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, SQ, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024))(a_full, b_full)


def _time_iso(name, fn, a, flops):
    def step(t):
        y = fn(t)
        s = (jnp.sum(y) * 1e-20 + 1.0).astype(t.dtype)
        return t * s

    try:
        sec = slope_time(step, a)
    except Exception as e:
        print(f"{name:11s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return
    print(f"{name:11s} {sec * 1e3:8.3f} ms  {flops / sec / 1e12:6.1f} TF/s "
          f"(real-FLOP rate)")


def run_isolated():
    key = jax.random.PRNGKey(3)
    cells = SQ // BLK_Q

    def redsum(s):
        return jnp.sum(s.reshape(BLK_Q, -1, 128), axis=1)

    # score_base: (BLK,128) x (SKV,128), contract lanes
    q = jax.random.normal(key, (B, SQ, GROUP), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, SKV, GROUP),
                          jnp.bfloat16)

    def k_score_base(a_ref, b_ref, o_ref):
        s = jax.lax.dot_general(a_ref[0], b_ref[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = redsum(s)

    _time_iso("score_base",
              lambda t: _iso_call(k_score_base, (BLK_Q, GROUP),
                                  lambda b_, i: (b_, i, 0), (SKV, GROUP),
                                  t, k, cells),
              q, 2 * B * SQ * SKV * DH)

    # score_nt: (40, BLK) x (40, SKV), contract sublanes
    qt = jax.random.normal(key, (B, DH, SQ), jnp.bfloat16)
    kt = jax.random.normal(jax.random.fold_in(key, 2), (B, DH, SKV),
                           jnp.bfloat16)

    def k_score_nt(a_ref, b_ref, o_ref):
        s = jax.lax.dot_general(a_ref[0], b_ref[0], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = redsum(s)

    _time_iso("score_nt",
              lambda t: _iso_call(k_score_nt, (DH, BLK_Q),
                                  lambda b_, i: (b_, 0, i), (DH, SKV),
                                  t, kt, cells),
              qt, 2 * B * SQ * SKV * DH)

    # PV + softmax variants generate P IN-KERNEL from iota (streaming a
    # (B, SQ, SKV) P from HBM is ~3.4 ms of pure bandwidth and would mask
    # the MXU question); the per-variant generation cost is identical.
    def gen_p(seed_scalar):
        r = jax.lax.broadcasted_iota(jnp.int32, (BLK_Q, SKV), 0) * 7
        c = jax.lax.broadcasted_iota(jnp.int32, (BLK_Q, SKV), 1)
        return ((r + c) % 117).astype(jnp.bfloat16) * seed_scalar

    dummy = jax.random.normal(key, (B, 8, 128), jnp.bfloat16)

    def _iso_gen(kernel, b_tile, b_full):
        return pl.pallas_call(
            kernel,
            grid=(B, cells),
            in_specs=[
                pl.BlockSpec((1, 8, 128), lambda b_, i: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + b_tile, lambda b_, i: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLK_Q, 128),
                                   lambda b_, i: (b_, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, SQ, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024))(dummy, b_full)

    v = jax.random.normal(jax.random.fold_in(key, 3), (B, SKV, GROUP),
                          jnp.bfloat16)
    v40 = v[..., :DH]
    flops = 2 * B * SQ * SKV * DH

    def k_pv_base(a_ref, b_ref, o_ref):
        p_ = gen_p(a_ref[0, 0, 0])
        s = jax.lax.dot_general(p_, b_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = s

    _time_iso("pv_base",
              lambda t: _iso_gen(k_pv_base, (SKV, GROUP), v),
              dummy, flops)

    def k_pv_narrow(a_ref, b_ref, o_ref):
        p_ = gen_p(a_ref[0, 0, 0])
        s = jax.lax.dot_general(p_, b_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = jnp.pad(s, ((0, 0), (0, 128 - DH)))

    _time_iso("pv_narrow",
              lambda t: _iso_gen(k_pv_narrow, (SKV, DH), v40),
              dummy, flops)

    def k_pv_nt(a_ref, b_ref, o_ref):
        p_ = gen_p(a_ref[0, 0, 0])
        s = jax.lax.dot_general(b_ref[0], p_, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # s: (40, BLK) — store transposed
        o_ref[0] = jnp.pad(s.T, ((0, 0), (0, 128 - DH)))

    _time_iso("pv_nt",
              lambda t: _iso_gen(k_pv_nt, (DH, SKV),
                                 jnp.swapaxes(v40, 1, 2)),
              dummy, flops)

    # softmax-only: the non-matmul share of the attention kernel
    def k_softmax(a_ref, b_ref, o_ref):
        s = gen_p(a_ref[0, 0, 0]).astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        o_ref[0] = redsum(e * (1.0 / l))

    _time_iso("softmax",
              lambda t: _iso_gen(k_softmax, (SKV, DH), v40),
              dummy, flops)  # printed rate = hypothetical matmul rate


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    q128 = jax.random.normal(key, (B, SQ, GROUP), dtype)
    q128 = q128.at[..., DH:].set(0)
    k128 = jax.random.normal(jax.random.fold_in(key, 1), (B, SKV, GROUP),
                             dtype).at[..., DH:].set(0)
    v128 = jax.random.normal(jax.random.fold_in(key, 2), (B, SKV, GROUP),
                             dtype).at[..., DH:].set(0)

    run_variant("base128", _kernel_base128, q128, k128, v128)
    run_variant("slice40", _kernel_slice40, q128, k128, v128)

    qt = jnp.swapaxes(q128[..., :DH], 1, 2)  # (B, DH, SQ)
    kt = jnp.swapaxes(k128[..., :DH], 1, 2)
    vt = jnp.swapaxes(v128[..., :DH], 1, 2)
    run_variant("nt40", _kernel_nt40, qt, kt, vt, transposed=True)
    run_variant("nt_t40", _kernel_nt_t40, qt, kt, vt, transposed=True)

    run_isolated()


if __name__ == "__main__":
    main()
