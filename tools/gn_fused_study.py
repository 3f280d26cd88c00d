"""Fused GroupNorm+SiLU kernel microbench (VERDICT r4 #4b, round 5).

Compares the production two-fusion XLA site (dual-moment stats reduce +
normalize/SiLU map — core/layers.GroupNorm + nn.silu) against the
one-pass Pallas kernel (ops/gn_act.py: slice resident in VMEM, moments by
ones-matmul, one HBM read + one write) at every UNet GN+SiLU shape, with
long in-jit chains and elementwise feedback (CLAUDE.md timing rule; short
chains are swamped by the axon tunnel's dispatch jitter).

The chain alternates the site with a trivially cheap elementwise update,
matching the in-program structure (each GN is sequentially dependent on
the previous conv — there is nothing to overlap with).

Usage: python tools/gn_fused_study.py
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

import math
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

GROUPS, EPS = 32, 1e-6


def sync(x):
    x.block_until_ready()
    return float(np.asarray(x[(0,) * x.ndim]))


def slope_time(run, x, n1=16, n2=192):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(t, n):
        return jax.lax.fori_loop(0, n, lambda i, a: run(a), t)

    def timed(n):
        sync(chain(x, n))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            sync(chain(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(n2) - timed(n1)) / (n2 - n1)


# --- kernel under study (REJECTED round 5 — kept here for the
# record, like the cm Mosaic kernel in cm_conv_study.py) ---------
_SLICE_BYTES_MAX = 8 * 1024 * 1024

def _silu_f32(y: Array) -> Array:
    # hand-rolled logistic: Mosaic lowers exp; keep the fp32 math explicit
    return y * (1.0 / (1.0 + jnp.exp(-y)))


def _xla_reference(x: Array, scale: Array, bias: Array, *, groups: int,
                   eps: float, act: str) -> Array:
    """Oracle: core/layers.GroupNorm math + activation, stats per leading
    index over the trailing (spatial..., c) dims of a (..., n, c) input."""
    c = x.shape[-1]
    g = groups
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    s1 = jnp.mean(xf, axis=-2)
    s2 = jnp.mean(xf * xf, axis=-2)
    lead = s1.shape[:-1]
    mean_g = s1.reshape(lead + (g, c // g)).mean(-1)
    ex2_g = s2.reshape(lead + (g, c // g)).mean(-1)
    var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
    mean_c = jnp.repeat(mean_g, c // g, axis=-1)
    inv_c = jnp.repeat(jax.lax.rsqrt(var_g + eps), c // g, axis=-1)
    mul = inv_c * scale
    add = bias - mean_c * mul
    y = xf * mul[..., None, :] + add[..., None, :]
    if act == "silu":
        y = _silu_f32(y)
    return y.astype(orig_dtype)


def _chunk_rows(n: int, c: int) -> int:
    """Largest divisor of n (multiple of 8) whose fp32 chunk stays small."""
    ch = n
    while ch > 8 and (ch * c * 4 > 2 * 1024 * 1024 or n % ch):
        ch //= 2
    return max(ch, 8)


def fits_kernel(n: int, c: int, itemsize: int = 2) -> bool:
    """Slice resident in VMEM, row chunks tile n, c lane-representable."""
    return (n % 8 == 0 and c % 8 == 0 and n >= 8
            and n % _chunk_rows(n, c) == 0
            and 2 * n * c * itemsize + _chunk_rows(n, c) * c * 4
            <= _SLICE_BYTES_MAX)


def _gn_kernel(x_ref, pg_ref, bg_ref, sc_ref, bi_ref, o_ref, *,
               n_chunks: int, eps: float, act: str):
    x = x_ref[0]                       # (n, c) compute dtype
    n, c = x.shape
    ch = n // n_chunks
    ones = jnp.ones((1, ch), jnp.float32)
    s1 = jnp.zeros((1, c), jnp.float32)
    s2 = jnp.zeros((1, c), jnp.float32)
    for i in range(n_chunks):
        xf = x[i * ch:(i + 1) * ch].astype(jnp.float32)
        s1 = s1 + jax.lax.dot_general(
            ones, xf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s2 = s2 + jax.lax.dot_general(
            ones, xf * xf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    # group fold (C,g) and broadcast-back (g,C) as constant matmuls; the
    # 1/(n * c/g) mean normalization is folded into pg
    mean_g = jax.lax.dot_general(s1, pg_ref[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    ex2_g = jax.lax.dot_general(s2, pg_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    bg = bg_ref[...]
    mean_c = jax.lax.dot_general(mean_g, bg, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(inv_g, bg, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    mul = inv_c * sc_ref[...]          # (1, c) fp32
    add = bi_ref[...] - mean_c * mul
    for i in range(n_chunks):
        xf = x[i * ch:(i + 1) * ch].astype(jnp.float32)
        y = xf * mul + add
        if act == "silu":
            y = _silu_f32(y)
        o_ref[0, i * ch:(i + 1) * ch] = y.astype(o_ref.dtype)


def _gn_pallas(x: Array, scale: Array, bias: Array, groups: int, eps: float,
               act: str) -> Array:
    from rcdms_tpu.ops.flash import kernel_interpret

    *lead, n, c = x.shape
    g = groups
    B = math.prod(lead) if lead else 1
    xf = x.reshape(B, n, c)
    n_chunks = n // _chunk_rows(n, c)

    # fold matrices: pg (c, g) sums a group's channels (with the mean
    # normalization baked in), bg (g, c) broadcasts group stats back
    gid = jnp.arange(c) // (c // g)
    onehot = (gid[:, None] == jnp.arange(g)[None, :]).astype(jnp.float32)
    pg = onehot / (n * (c // g))
    bg = onehot.T

    out = pl.pallas_call(
        functools.partial(_gn_kernel, n_chunks=n_chunks, eps=eps, act=act),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, g), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, c), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * n * c,
            bytes_accessed=2 * B * n * c * x.dtype.itemsize,
            transcendentals=B * n * c,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=16 * 1024 * 1024),
        interpret=kernel_interpret(),
    )(xf, pg, bg, scale.astype(jnp.float32).reshape(1, c),
      bias.astype(jnp.float32).reshape(1, c))
    return out.reshape(x.shape)


def main():
    # (B=b*f, N=h*w, C): every stage-2 UNet GN+SiLU shape (sequential CFG
    # batch 5); the 2560/1920/960-channel rows are the up-block concat
    # norm1 sites
    shapes = [(5, 4096, 320), (5, 1024, 640), (5, 256, 1280),
              (5, 1024, 960)]
    key = jax.random.PRNGKey(0)
    total_xla = total_pal = 0.0
    print(f"{'shape':24s} {'xla 2-pass':>12s} {'pallas 1-pass':>14s} "
          f"{'speedup':>8s} {'GB/s(pal)':>10s}")
    for B, N, C in shapes:
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, N * C), 3)
        x = jax.random.normal(k1, (B, N, C), jnp.bfloat16)
        scale = jax.random.normal(k2, (C,), jnp.float32) * 0.5 + 1.0
        bias = jax.random.normal(k3, (C,), jnp.float32) * 0.2

        def xla_site(a):
            y = _xla_reference(a, scale, bias, groups=GROUPS, eps=EPS,
                                 act="silu")
            return (y * 0.5 + a * 0.25).astype(a.dtype)

        def pal_site(a):
            y = _gn_pallas(a, scale, bias, GROUPS, EPS, "silu")
            return (y * 0.5 + a * 0.25).astype(a.dtype)

        t_x = slope_time(xla_site, x)
        t_p = slope_time(pal_site, x)
        total_xla += t_x
        total_pal += t_p
        gbs = 2 * B * N * C * 2 / t_p / 1e9
        print(f"B={B} N={N:5d} C={C:4d}     {t_x*1e6:9.1f} us "
              f"{t_p*1e6:11.1f} us {t_x/t_p:7.2f}x {gbs:9.1f}")
    print(f"\nsum over shapes: xla {total_xla*1e6:.0f} us, pallas "
          f"{total_pal*1e6:.0f} us ({total_xla/total_pal:.2f}x)")
    # story scaling: ~44 resnet GN+SiLU sites/step x 2 CFG calls? the
    # in-program profile pins GN stats at ~5.5 ms/step; report the
    # per-site mean delta instead of guessing the site mix
    n = len(shapes)
    print(f"mean per-site delta: {(total_xla-total_pal)/n*1e6:+.1f} us")


if __name__ == "__main__":
    main()
