"""GEGLU FF kernel block-size sweep at the stage-2 UNet's FF shapes.

The round-3 profile shows the fused FF kernel at 441 ms/story (~145 TF/s
against the ~180 TF/s dot rate) — this sweeps (blk_n, blk_i) per shape to
see whether the default picker leaves time on the table, with the two bare
chained matmuls (no fusion, no gelu) as the speed-of-light anchor.

Timing: in-jit chain slope, elementwise feedback, long chains (see
tools/conv_variants_study.py for why). Run on the real chip:
    python tools/geglu_study.py
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

from rcdms_tpu.ops import geglu

# (label, B, n, c) — B = b*f at sequential CFG; inner = 4c
SHAPES = [
    ("L0", 5, 4096, 320),
    ("L1", 5, 1024, 640),
    ("L2", 5, 256, 1280),
]


def timed(fn, x, *ws, n1=24, n2=104):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(t, ws, n):
        def body(i, a):
            y = fn(a, *ws).astype(a.dtype) * jnp.asarray(1e-20, a.dtype)
            return a + y

        return jax.lax.fori_loop(0, n, body, t)

    def run(n):
        chain(x, ws, n)[(0,) * x.ndim].block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = chain(x, ws, n)
            _ = np.asarray(r[(0,) * r.ndim])
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n2) - run(n1)) / (n2 - n1)


def main():
    for label, B, n, c in SHAPES:
        inner = 4 * c
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, n, c)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((c, 2 * inner)) * 0.02,
                         jnp.bfloat16)
        b1 = jnp.zeros((2 * inner,), jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((inner, c)) * 0.02,
                         jnp.bfloat16)
        b2 = jnp.zeros((c,), jnp.bfloat16)
        fl = 2 * B * n * c * 2 * inner + 2 * B * n * inner * c
        print(f"{label}: x {x.shape}, inner {inner}, {fl/1e9:.1f} GFLOP")

        # anchor: the two bare matmuls (intermediate round-trips HBM)
        def unfused(a, w1, b1, w2, b2):
            return geglu._xla_reference(a, w1, b1, w2, b2)

        t = timed(unfused, x, w1, b1, w2, b2)
        print(f"  unfused(XLA)      {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s")

        orig = geglu._pick_block
        try:
            for blk_n in (128, 256, 512, 1024):
                if n % blk_n:
                    continue
                # 128/256 added round 5: the prior sweep found full-row
                # blk_n + SMALL blk_i wins big (x resident, W streams)
                for blk_i in (128, 256, 512, 640, 1024, 1280, 2560):
                    if inner % blk_i:
                        continue
                    tiles = (blk_n * c + 3 * c * blk_i) * 2 * 2
                    temps = 3 * blk_n * blk_i * 4 + blk_n * c * 4
                    if tiles + temps > 2 * geglu.VMEM_BUDGET:
                        continue
                    geglu._pick_block = (
                        lambda *_a, _b=(blk_n, blk_i), **_k: _b)
                    try:
                        t = timed(geglu.geglu_ff, x, w1, b1, w2, b2)
                    except Exception as e:
                        print(f"  blk=({blk_n:4d},{blk_i:4d})  FAIL "
                              f"{type(e).__name__}")
                        continue
                    mark = " <- default" if (blk_n, blk_i) == orig(
                        n, c, inner, 2) else ""
                    print(f"  blk=({blk_n:4d},{blk_i:4d})  {t*1e3:7.3f} ms"
                          f"  {fl/t/1e12:6.1f} TF/s{mark}", flush=True)
        finally:
            geglu._pick_block = orig


if __name__ == "__main__":
    main()
