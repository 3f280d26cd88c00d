"""MXU head-dim padding study (VERDICT r2 next-step #2).

Question: SD1.5 level-0 attention has head_dim 40; the packed flash kernel
pads each head to a 128-lane group, so its roofline counts 128/40 = 3.2x
the real FLOPs. Is that pad *recoverable* by packing 3 dh=40 heads per
128-lane group (3x40 = 120 lanes), or is it a hardware tiling constraint?

Method: time the attention-shaped matmuls at level-0 scale (b*h = 80,
sq = skv = 4096, bf16) in every candidate formulation with chained-dispatch
slope timing (single-call timing on this box is dominated by the ~60 ms
axon tunnel RTT — see BASELINE.md):

  score matmuls (contraction = head_dim):
    pad128   (80, 4096, 128) @ (80, 128, 4096)   current kernel's shape
    raw40    (80, 4096, 40)  @ (80, 40, 4096)    no explicit pad (XLA pads?)
    packed3  (27, 4096, 128) @ (27, 128, 12288)  3 heads block-diag in K
  pv matmuls (output = head_dim):
    pv128    (80, 4096, 4096) @ (80, 4096, 128)
    pv40     (80, 4096, 4096) @ (80, 4096, 40)
    pv_packed3 (27, 4096, 12288) @ (27, 12288, 128)
  calibration:
    k256 / k512 score variants - establishes how time scales in k when
    k is a lane multiple (true FLOP scaling).

If raw40 == pad128 in time, the 128-lane contraction granularity is a
hardware floor and NO repacking can beat it (block-diag zeros still occupy
MXU tiles); if raw40 is ~3x faster, the win is real and the kernel should
adopt the packed layout.

Usage: python tools/mxu_pad_study.py [--device cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  __import__("os").path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def bench_matmul(name, m, k, n, b, dtype=jnp.bfloat16, results=None):
    """Times y = x @ w for (b, m, k) @ (b, k, n). ELEMENTWISE chain
    feedback via tools/chainbench (the original `t * scalar(y)` feedback
    is hoistable through the dot — dot(t*s, w) == s*dot(t, w) — see
    CLAUDE.md; re-validated 2026-08-18: the headline ratios held)."""
    from chainbench import slope_time

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, m, k), dtype)
    w = jax.random.normal(jax.random.fold_in(key, 1), (b, k, n), dtype)

    def dot(t, w):
        return jax.lax.dot_general(t, w, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    sec = slope_time(dot, x, w)
    flops = 2 * b * m * k * n
    tfs = flops / sec / 1e12
    print(f"{name:12s} b={b:3d} ({m:5d},{k:5d})@({k:5d},{n:6d}) "
          f"{sec * 1e3:8.3f} ms  {tfs:7.1f} TF/s")
    if results is not None:
        results[name] = sec
    return sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None)
    args = ap.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend())

    R = {}
    # --- score matmul family: contraction = head_dim -----------------
    bench_matmul("score_pad128", 4096, 128, 4096, 80, results=R)
    bench_matmul("score_raw40", 4096, 40, 4096, 80, results=R)
    bench_matmul("score_raw120", 4096, 120, 4096, 27, results=R)
    bench_matmul("score_pack3", 4096, 128, 3 * 4096, 27, results=R)
    # calibration: lane-multiple k scaling
    bench_matmul("score_k256", 4096, 256, 4096, 80, results=R)
    bench_matmul("score_k512", 4096, 512, 4096, 40, results=R)

    # --- pv matmul family: output = head_dim -------------------------
    bench_matmul("pv_128", 4096, 4096, 128, 80, results=R)
    bench_matmul("pv_40", 4096, 4096, 40, 80, results=R)
    bench_matmul("pv_pack3", 4096, 3 * 4096, 128, 27, results=R)
    bench_matmul("pv_n256", 4096, 4096, 256, 80, results=R)

    print()
    base = R["score_pad128"]
    print(f"raw40 / pad128 score time ratio:  {R['score_raw40'] / base:.2f} "
          f"(1.0 => contraction pad is free/structural, "
          f"0.31 => 3.2x win available)")
    print(f"pack3 / pad128 score time ratio: "
          f"{R['score_pack3'] / (base * 27 / 80 * 3):.2f} per-equal-work")
    print(f"pv_40 / pv_128 time ratio:        {R['pv_40'] / R['pv_128']:.2f}")
    print(f"k256/k128 scaling: {R['score_k256'] / base:.2f} (2.0 = linear)")


if __name__ == "__main__":
    main()
