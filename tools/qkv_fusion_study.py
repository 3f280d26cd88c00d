"""Wide-N matmul microbench for the prior's projections (round 5).

The prior floor study measured the 970x2048x2048 square projection shape
at ~70 TF/s vs ~200 TF/s for the 8192-wide FF shape (same M, same K),
suggesting q/k/v fusion (one 2048->6144 matmul) as prior headroom. A first
version of this study produced impossible rates (622 TF/s > hardware peak)
because XLA ALGEBRAICALLY FOLDS both naive chain formulations:

  x@wq + x@wk + x@wv          -> x @ (wq+wk+wv)      (distributivity)
  (x@w_qkv).reshape(M,3,K).sum(1) -> x @ w_folded    (reduce-through-dot)

Every variant here therefore applies tanh to EACH projection output BEFORE
any combine — the nonlinearity blocks both rewrites, and all variants pay
the identical 3x tanh + 2x add VPU epilogue, so the slope difference is
the matmul formulation alone. Verified fold-proof by FLOP-impossible-rate
check at the bottom.

Usage: python tools/qkv_fusion_study.py   (runs on the default backend)
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


def sync(x):
    x.block_until_ready()
    return float(np.asarray(x[(0,) * x.ndim]))


def slope_time(run, x, n1=16, n2=256):
    """Long chains (n2-n1 = 240 body evals) so the slope dwarfs the axon
    tunnel's multi-hundred-us dispatch jitter — at n2=24 a ~100 us/op body
    produced physically impossible rates (>4x hardware peak)."""

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


def main():
    M, K = 970, 2048
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    wq = jax.random.normal(k1, (K, K), dtype)
    wk = jax.random.normal(k2, (K, K), dtype)
    wv = jax.random.normal(k3, (K, K), dtype)
    w_qkv = jnp.concatenate([wq, wk, wv], axis=1)  # (K, 3K)
    x0 = jax.random.normal(k4, (M, K), dtype)

    flops3 = 3 * 2 * M * K * K
    flops1 = 2 * M * K * K

    # single square matmul (reproduces/refutes the floor study's 70.5 TF/s)
    t_sq = slope_time(lambda a: jnp.tanh(a @ wq), x0)

    # separate q/k/v, fold-proof: tanh BEFORE the combine
    t_sep = slope_time(
        lambda a: jnp.tanh(a @ wq) + jnp.tanh(a @ wk) + jnp.tanh(a @ wv), x0)

    # fused qkv, fold-proof: tanh on the (M, 3K) output before reshape-sum
    t_fus = slope_time(
        lambda a: jnp.tanh(a @ w_qkv).reshape(M, 3, K).sum(1), x0)

    rows = [
        ("square 1x(M,K)@(K,K)", t_sq, flops1),
        ("separate tanh(q)+tanh(k)+tanh(v)", t_sep, flops3),
        ("fused tanh(x@w_qkv) reshape-sum", t_fus, flops3),
    ]
    print(f"backend: {jax.default_backend()}   M={M} K={K}")
    impossible = False
    for name, t, fl in rows:
        r = fl / t / 1e12
        flag = "  <-- FOLDED (over hw peak)" if r > 230 else ""
        impossible |= r > 230
        print(f"{name:36s}: {t*1e6:8.1f} us  {r:6.1f} TF/s{flag}")
    print(f"fused vs separate speedup : {t_sep / t_fus:.2f}x")
    save_story = (t_sep - t_fus) * 40 * 20
    print(f"naive story-level saving  : {save_story*1e3:+.1f} ms "
          f"(40 qkv sites/step x 20 steps)")
    if impossible:
        print("WARNING: a variant exceeded hardware peak — folding "
              "suspected, numbers invalid")


if __name__ == "__main__":
    main()
