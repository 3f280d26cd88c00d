"""Row-sharding compute-efficiency check (round 3, supports the comm
audit's v5e-8 latency model).

Under the ('cfg','space') inference mesh each device computes a
height-strip of every conv/attention: at 'space'=4 the L0 latent strip is
16 rows (L3: 2 rows). The audit models per-device compute as
single-chip-time / n_devices — this script measures how much worse the
strip shapes actually are by timing ONE full StoryUNet forward (bf16,
zero weights, 5 frames) at strip heights on the real chip:

    H=64 (full)    baseline
    H=32 (space 2) ideal = 1/2 of full
    H=16 (space 4) ideal = 1/4
    H=8  (space 8) ideal = 1/8

strip_factor(H) = t(H) / (t(64) * H/64)  — 1.0 = perfect scaling; the
audit's projected p50 multiplies by this factor.

Usage: python tools/strip_efficiency.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  __import__("os").path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def slope_time(fn, x, params, n1=2, n2=8):
    """params travel as a jit ARGUMENT — closing over 5 GB of zeros bakes
    them into the lowering as constants (measured: a warning + glacial
    compiles)."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(t, params, n):
        def body(i, a):
            y = fn(a, params)
            s = (jnp.sum(y.astype(jnp.float32)) * 1e-20 + 1.0).astype(
                a.dtype)
            return a * s

        return jax.lax.fori_loop(0, n, body, t)

    def timed(n):
        chain(x, params, n)[(0,) * x.ndim].block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = chain(x, params, n)
            _ = np.asarray(r[(0,) * r.ndim])
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    from rcdms_tpu.configs import StoryUNetConfig, TemporalConfig
    from rcdms_tpu.models.unet3d import StoryUNet

    print("backend:", jax.default_backend())
    cfg = StoryUNetConfig(temporal=TemporalConfig())
    unet = StoryUNet(cfg, dtype=jnp.bfloat16)
    b, f, w, t = 1, 5, 64, 91

    results = {}
    for h in (64, 32, 16, 8):
        x = jnp.zeros((b, f, h, w, cfg.in_channels), jnp.bfloat16)
        tb = jnp.zeros((b,), jnp.int32)
        ctx = jnp.zeros((b, f, t, cfg.cross_attention_dim), jnp.bfloat16)
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda k: unet.init(k, x, tb, ctx),
                           jax.random.PRNGKey(0)))

        def fwd(xx, params, tb=tb, ctx=ctx):
            return unet.apply(params, xx, tb, ctx)

        sec = slope_time(fwd, x, params)
        results[h] = sec
        ideal = results[64] * h / 64
        print(f"H={h:2d}: {sec * 1e3:8.2f} ms  strip_factor "
              f"{sec / ideal:5.2f}", flush=True)

    print("\naudit correction: projected v5e-8 compute term = "
          f"(single-chip / 8) * {results[16] / (results[64] / 4):.2f} "
          "(space=4 per-device strips; 'cfg' halving is exact)")


if __name__ == "__main__":
    main()
