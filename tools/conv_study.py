"""Bare-conv efficiency study: is there headroom for a hand-written conv
kernel, or is XLA's conv near the chip ceiling at stage-2 shapes?

Times the stage-2 UNet's dominant 3x3 NHWC convs (bf16, batch = b*f = 25
at sequential-CFG batch 5) against the 175 TF/s practical MXU ceiling
(BASELINE.md). If bare convs hit ~the in-program rate, the conv time in
the story profile is already hardware-bound and a Mosaic conv kernel has
no headroom.
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

CEILING = 175e12


def slope_time(fn, x, w, n1=24, n2=104):
    """ELEMENTWISE feedback + long chains (see conv_variants_study.py:
    scalar feedback lets XLA hoist linear ops out of the loop, and short
    slopes sit inside the ~35 ms dispatch constant's noise)."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(t, w, n):
        def body(i, a):
            y = fn(a, w).astype(a.dtype) * jnp.asarray(1e-20, a.dtype)
            flat_a, flat_y = a.reshape(-1), y.reshape(-1)
            m = min(flat_a.shape[0], flat_y.shape[0])
            return flat_a.at[:m].add(flat_y[:m]).reshape(a.shape)

        return jax.lax.fori_loop(0, n, body, t)

    def timed(n):
        chain(x, w, n)[(0,) * x.ndim].block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = chain(x, w, n)
            _ = np.asarray(r[(0,) * r.ndim])
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1)


def bench_conv(name, b, h, w_, cin, cout, k=3):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w_, cin), jnp.bfloat16)
    wt = jax.random.normal(jax.random.fold_in(key, 1), (k, k, cin, cout),
                           jnp.bfloat16)

    def conv(t, wt):
        return jax.lax.conv_general_dilated(
            t, wt, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    sec = slope_time(conv, x, wt)
    flops = 2 * b * h * w_ * k * k * cin * cout
    print(f"{name:22s} {sec * 1e3:8.3f} ms  {flops / sec / 1e12:6.1f} TF/s"
          f"  ({flops / sec / CEILING * 100:4.0f}% of ceiling)",
          flush=True)


def main():
    print("backend:", jax.default_backend())
    bench_conv("L0 (25,64,64,320->320)", 25, 64, 64, 320, 320)
    bench_conv("L1 (25,32,32,640->640)", 25, 32, 32, 640, 640)
    bench_conv("L2 (25,16,16,1280)", 25, 16, 16, 1280, 1280)
    bench_conv("L3 (25,8,8,1280)", 25, 8, 8, 1280, 1280)
    bench_conv("up0 cat (25,64,64,640->320)", 25, 64, 64, 640, 320)
    # CFG-batched variant (one b=10-story call -> conv batch 50)
    bench_conv("L0 batched-cfg (50,...)", 50, 64, 64, 320, 320)


if __name__ == "__main__":
    main()
