"""Flash-kernel PV/softmax structure study (VERDICT r4 #4a, round 5).

The round-3 per-call budget of the production nt kernel (level-0 shapes,
B=80, 4096x4096 tokens, dh=40: 4.30 ms/call) is score 0.62 ms (real-dh
rate) + softmax ~1.9 ms (VPU exp-bound) + PV ~1.8 ms (lane-lane
contraction at padded rate) — the three stages sum to the total, i.e.
ZERO MXU/VPU overlap. Two attack angles, measured here at the exact
production shapes:

  split2/split4  split the q block into sub-blocks INSIDE the kernel and
                 interleave score/exp/PV chains so exp(block i+1) (VPU) is
                 independent of PV(block i) (MXU) — tests whether Mosaic's
                 scheduler overlaps the two units across independent chains.
  dscore         compute the score matmul TWICE (s and s^T, both at the
                 real-dh sublane-contraction rate, 0.62 ms each): s gives
                 the row max via cheap LANE reductions, s^T gives p^T so
                 the PV becomes a STANDARD (dh,skv)@(skv,blk) matmul
                 (contracts lanes-x-sublanes, full rate) instead of the
                 padded-rate lane-lane contraction; l via ones-matmul.

Each variant is numerics-checked against the XLA oracle before timing.
Usage: python tools/pv_overlap_study.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, SQ, SKV, DH = 80, 4096, 4096, 40
BLK_Q = 512
SCALE = DH ** -0.5


def slope_time(run, x, n1=4, n2=24):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(t, n):
        return jax.lax.fori_loop(0, n, lambda i, a: run(a), t)

    def timed(n):
        r = chain(x, n)
        _ = np.asarray(r[(0,) * r.ndim])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = chain(x, n)
            _ = np.asarray(r[(0,) * r.ndim])
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1)


# --- kernels (channel-major nt layout: (1, DH, S) blocks) -------------------


def _attend(qt, kt, vt):
    """One score->softmax->PV chain, production structure (deferred
    normalization: ops/flash.py::_nt_kernel)."""
    s = jax.lax.dot_general(qt, kt, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * SCALE
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m).astype(vt.dtype)
    ot = jax.lax.dot_general(vt, p, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ones = jnp.ones((1, p.shape[1]), p.dtype)
    l_t = jax.lax.dot_general(ones, p, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return ot * (1.0 / l_t)


def _kernel_base(qt_ref, kt_ref, vt_ref, o_ref):
    o_ref[0] = _attend(qt_ref[0], kt_ref[0], vt_ref[0]).astype(o_ref.dtype)


def _make_split_kernel(n_split: int):
    blk = BLK_Q // n_split

    def kernel(qt_ref, kt_ref, vt_ref, o_ref):
        kt = kt_ref[0]
        vt = vt_ref[0]
        # stage 1: ALL score matmuls first (MXU), each independent
        ss = []
        for j in range(n_split):
            qj = qt_ref[0][:, j * blk:(j + 1) * blk]
            s = jax.lax.dot_general(qj, kt, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            ss.append(s * SCALE)
        # stage 2: interleave exp (VPU) with PV (MXU) of the previous block
        ps, ots = [], []
        for j in range(n_split):
            s = ss[j]
            m = jnp.max(s, axis=-1, keepdims=True)
            ps.append(jnp.exp(s - m).astype(vt.dtype))
            if j > 0:
                ots.append(jax.lax.dot_general(
                    vt, ps[j - 1], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
        ots.append(jax.lax.dot_general(
            vt, ps[-1], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
        ones = jnp.ones((1, ps[0].shape[1]), ps[0].dtype)
        for j in range(n_split):
            l_t = jax.lax.dot_general(ones, ps[j], (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            o_ref[0, :, j * blk:(j + 1) * blk] = (
                ots[j] * (1.0 / l_t)).astype(o_ref.dtype)

    return kernel


def _kernel_dscore(qt_ref, kt_ref, vt_ref, o_ref):
    qt = qt_ref[0]            # (DH, BLK_Q)
    kt = kt_ref[0]            # (DH, SKV)
    vt = vt_ref[0]
    # s (blk, skv): row max over LANES (cheap)
    s = jax.lax.dot_general(qt, kt, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * SCALE
    m = jnp.max(s, axis=-1, keepdims=True)           # (blk, 1)
    # s^T (skv, blk): same sublane-contraction rate, operands swapped
    st = jax.lax.dot_general(kt, qt, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * SCALE
    pt = jnp.exp(st - m.reshape(1, -1)).astype(vt.dtype)   # (skv, blk)
    # PV as a STANDARD matmul: (dh, skv) @ (skv, blk) — full rate
    ot = jax.lax.dot_general(vt, pt, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ones = jnp.ones((1, SKV), pt.dtype)
    l_t = jax.lax.dot_general(ones, pt, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (1, blk)
    o_ref[0] = (ot * (1.0 / l_t)).astype(o_ref.dtype)


def run_variant(name, kernel, qt, kt, vt, oracle):
    call = pl.pallas_call(
        kernel,
        grid=(B, SQ // BLK_Q),
        in_specs=[
            pl.BlockSpec((1, DH, BLK_Q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DH, SKV), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DH, SKV), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, DH, BLK_Q), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, DH, SQ), qt.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024))

    try:
        got = np.asarray(call(qt, kt, vt), np.float32)
    except Exception as e:
        print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    err = np.abs(got - oracle).max()
    if err > 0.02:
        print(f"{name:10s} WRONG NUMERICS: max|delta| = {err:.4f}")
        return None

    def step(t):
        y = call(t, kt, vt)
        s = (jnp.sum(y.astype(jnp.float32)) * 1e-20 + 1.0).astype(t.dtype)
        return t * s

    sec = slope_time(step, qt)
    useful = 4 * B * SQ * SKV * DH
    print(f"{name:10s} {sec * 1e3:8.3f} ms  {useful / sec / 1e12:6.1f} TF/s "
          f"(real-FLOP rate)  max|delta|={err:.1e}")
    return sec


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    qt = (jax.random.normal(k1, (B, DH, SQ), jnp.bfloat16))
    kt = (jax.random.normal(k2, (B, DH, SKV), jnp.bfloat16))
    vt = (jax.random.normal(k3, (B, DH, SKV), jnp.bfloat16))

    # XLA oracle in the same layout
    def oracle_fn(qt, kt, vt):
        s = jnp.einsum("bdq,bdk->bqk", qt.astype(jnp.float32),
                       kt.astype(jnp.float32)) * SCALE
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bqk,bdk->bdq", p, vt.astype(jnp.float32))

    oracle = np.asarray(jax.jit(oracle_fn)(qt, kt, vt))

    base = run_variant("base", _kernel_base, qt, kt, vt, oracle)
    for n in (2, 4):
        run_variant(f"split{n}", _make_split_kernel(n), qt, kt, vt, oracle)
    run_variant("dscore", _kernel_dscore, qt, kt, vt, oracle)
    if base:
        print(f"\nbaseline/story context: nt kernel is ~497 ms of the "
              f"2.18 s story; a variant at X ms/call scales that slice "
              f"by X/{base*1e3:.2f}")


if __name__ == "__main__":
    main()
