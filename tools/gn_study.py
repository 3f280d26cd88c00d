"""GroupNorm-stats formulation study (VERDICT r2 next-step #6).

The round-3 profile shows ~97 ms/story of `convert_reduce_fusion` — the
GroupNorm moment reductions — running at ~62 GB/s effective (vs ~800 GB/s
HBM): XLA's spatial-axis reduction over NHWC (keeping the lane-major
channel axis) is bandwidth-inefficient. Candidates at stage-2 level-0
shapes (B = b*f = 50 at sequential-CFG batch 5, N = 64*64 tokens, C = 320,
bf16):

  xla_mean2   current GroupNorm: jnp.mean(x) + jnp.mean(x*x) (one fusion)
  matmul_red  moments via ones-matmul: s1 = 1^T x, s2 = 1^T (x.x) — MXU
              reads x at full bandwidth (risk: XLA canonicalizes
              dot-with-ones back to reduce)
  pallas      fused moments kernel: x tile resident in VMEM, both moments
              in one HBM pass

Each returns per-(lead, C) sums; the tiny group-fold afterwards is common.
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

B, N, C = 50, 4096, 320


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


def bench(name, stats_fn, x):
    # ELEMENTWISE feedback (CLAUDE.md): the old `t * scalar(stats)` is
    # hoistable through linear stats formulations (the ones-matmul
    # variant) and understates nothing for the bare reduction but keeps
    # the methodology uniform
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from chainbench import feedback

    def step(t):
        s1, s2 = stats_fn(t)
        cat = jnp.concatenate([s1.reshape(-1), s2.reshape(-1)])
        return feedback(t, cat)

    try:
        sec = slope_time(step, x)
    except Exception as e:
        print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:140]}")
        return
    gbs = x.size * x.dtype.itemsize / sec / 1e9
    print(f"{name:10s} {sec * 1e3:8.3f} ms  {gbs:7.1f} GB/s effective",
          flush=True)


def xla_mean2(x):
    xf = x.astype(jnp.float32)
    return jnp.mean(xf, axis=1), jnp.mean(xf * xf, axis=1)


def matmul_red(x):
    ones = jnp.ones((x.shape[0], 1, N), x.dtype)
    dims = (((2,), (1,)), ((0,), (0,)))
    s1 = jax.lax.dot_general(ones, x, dims,
                             preferred_element_type=jnp.float32)
    s2 = jax.lax.dot_general(ones, x * x, dims,
                             preferred_element_type=jnp.float32)
    return s1[:, 0] / N, s2[:, 0] / N


def _moments_kernel(x_ref, o_ref):
    i = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)         # (blk, C)
    s1 = jnp.sum(x, axis=0, keepdims=True)   # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    part = jnp.concatenate(
        [s1, s2, jnp.zeros((6, x.shape[1]), jnp.float32)], axis=0)

    @pl.when(i == 0)
    def _init():
        o_ref[0] = part

    @pl.when(i > 0)
    def _acc():
        o_ref[0] += part


def pallas_moments(x, blk=2048):
    nblk = N // blk
    out = pl.pallas_call(
        _moments_kernel,
        grid=(B, nblk),
        in_specs=[pl.BlockSpec((1, blk, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, C), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))(x)
    return out[:, 0] / N, out[:, 1] / N


def main():
    print("backend:", jax.default_backend())
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, C), jnp.bfloat16)

    bench("xla_mean2", xla_mean2, x)
    bench("matmul_red", lambda t: matmul_red(t), x)
    bench("pallas", pallas_moments, x)


if __name__ == "__main__":
    main()
