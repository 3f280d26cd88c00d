"""Stage-1 prior-loop floor study (VERDICT r4 #1).

Settles whether the 20-step prior loop (~0.73 s/story, round-3 profile) is
at its compute floor or has harvestable headroom:

  1. measures the full-scale PriorSampler alone on the chip (p50),
  2. counts the REAL dense-matmul FLOPs per story from the param tree
     (every Dense/FF/attention projection at its true M/K/N; attention
     score/PV FLOPs added analytically),
  3. chain-slope-times the two dominant matmul shapes (970x2048x2048
     square and 970x2048x8192 FF) with ELEMENTWISE feedback (see
     tools/conv_variants_study.py::timed for why scalar feedback is
     invalid) to get the shape-matched MXU ceiling,
  4. prints achieved TF/s vs the FLOP-weighted ceiling.

Reference hot loop: `/root/reference/src/models/myprior_transformer.py:
275-411` (the reference never profiled it; its eval runs the prior on one
GPU inside a python step loop).

Usage: python tools/prior_floor_study.py [--steps 20] [--repeats 5]
"""

from __future__ import annotations

import argparse
import functools
import os
import statistics
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
    """In-jit chain slope with elementwise feedback (CLAUDE.md timing
    rule): time(n2 calls) - time(n1 calls) over (n2 - n1). Long chains —
    at n2=24 the axon tunnel's dispatch jitter swamped ~100 us bodies and
    this study reported 70.5 TF/s for a square matmul that long chains
    measure at 193 TF/s (tools/qkv_fusion_study.py, round 5)."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(t, n):
        return jax.lax.fori_loop(0, n, lambda i, a: run(a), t)

    def timed(n):
        sync(chain(x, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(chain(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1)


def count_dense_flops(params, tokens_by_prefix):
    """2*M*K*N for every (K, N) dense kernel in the tree; M = the token
    count of the module the kernel lives under."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    rows = []
    for path, leaf in flat:
        names = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        if names[-1] != "kernel" or leaf.ndim != 2:
            continue
        joined = "/".join(str(n) for n in names)
        m = None
        for prefix, tok in tokens_by_prefix:
            if prefix(joined):
                m = tok
                break
        if m is None:
            raise ValueError(f"no token rule for {joined}")
        k, n = leaf.shape
        total += 2 * m * k * n
        rows.append((joined, m, k, n))
    return total, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    from rcdms_tpu.configs import PriorConfig
    from rcdms_tpu.models.prior import FramePrior
    from rcdms_tpu.sample.prior_sampler import (
        PriorConditioning,
        PriorSampler,
    )

    cfg = PriorConfig()
    dtype = jnp.bfloat16
    model = FramePrior(cfg, dtype=dtype)
    sampler = PriorSampler(model, num_steps=args.steps, guidance_scale=2.0)

    b, f, t, d = 1, cfg.num_frames, cfg.num_text_tokens, cfg.embedding_dim
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    cond = PriorConditioning(
        text_embed=jax.random.normal(ks[0], (b, f, d), dtype),
        text_hidden=jax.random.normal(ks[1], (b, f, t, d), dtype),
        text_mask=jnp.ones((b, f, t), bool),
        text_embed_u=jax.random.normal(ks[2], (b, f, d), dtype),
        text_hidden_u=jax.random.normal(ks[3], (b, f, t, d), dtype),
        text_mask_u=jnp.ones((b, f, t), bool),
        image_embed=jax.random.normal(ks[4], (b, f, d), dtype),
        mask_embed=jax.random.normal(ks[5], (b, f, d), dtype),
    )

    def zeros_like_tree(tree):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16
                                if s.dtype == jnp.float32 else s.dtype),
            tree)

    params = zeros_like_tree(jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((b, f, d)), jnp.zeros((b, f), jnp.int32),
            jnp.zeros((b, f, d)), jnp.zeros((b, f, t, d)),
            jnp.zeros((b, f, d)), jnp.zeros((b, f, d)),
            jnp.ones((b, f, t), bool)),
        ks[6]))

    run = jax.jit(sampler.__call__)
    t0 = time.perf_counter()
    out = run(params, cond, ks[7])
    sync(out)
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        sync(run(params, cond, jax.random.fold_in(key, i)))
        times.append(time.perf_counter() - t0)
    p50 = statistics.median(times)

    # ---- real FLOPs ------------------------------------------------------
    seq, inner = cfg.seq_len, cfg.inner_dim
    rows_cfg = 2 * b * f * seq          # CFG-doubled token rows per step
    rows_frame = 2 * b * f              # per-frame projections
    per_step, rows = count_dense_flops(params, [
        # per-frame conditioning projections (+x_t, prd, time): f rows each
        (lambda s: any(k in s for k in (
            "embedding_proj", "proj_in", "proj_to_clip_embeddings",
            "time_embedding")) and "block" not in s and "temporal" not in s,
         rows_frame),
        # the 91-token text projection
        (lambda s: "encoder_hidden_states_proj" in s,
         2 * b * f * cfg.num_text_tokens),
        # everything inside the 20 blocks + temporal modules: seq tokens
        (lambda s: True, rows_cfg),
    ])
    # attention score+PV: spatial (seq x seq per head) + temporal (f x f)
    heads, dh = cfg.num_heads, cfg.head_dim
    per_step += cfg.num_layers * 2 * (2 * b * f) * heads * seq * seq * dh * 2
    tcfg = cfg.temporal
    per_step += (cfg.num_layers * tcfg.num_blocks * tcfg.attn_layers_per_block
                 * 2 * (2 * b * seq) * tcfg.num_heads * f * f
                 * (inner // tcfg.num_heads) * 2)
    story_tf = per_step * args.steps / 1e12

    # ---- shape-matched ceiling -------------------------------------------
    M = rows_cfg
    w_sq = jax.random.normal(key, (inner, inner), dtype)
    w_ff = jax.random.normal(key, (inner, 4 * inner), dtype)
    w_ff_T = jax.random.normal(key, (4 * inner, inner), dtype)
    x0 = jax.random.normal(key, (M, inner), dtype)

    # the FF pair MUST carry an elementwise nonlinearity BETWEEN the two
    # dots: `tanh((a@W1)@W2)` lets XLA hoist the loop-invariant W1@W2
    # product out of the chain and report an impossible 204 TF/s "pair rate"
    # (the same algebraic fold tools/qkv_fusion_study.py documented for
    # summed projections). gelu between the dots measures the real pair.
    t_sq = slope_time(lambda a: jnp.tanh(a @ w_sq), x0)
    t_ff = slope_time(
        lambda a: jnp.tanh(jax.nn.gelu((a @ w_ff).astype(jnp.float32),
                                       approximate=False).astype(a.dtype)
                           @ w_ff_T), x0)
    r_sq = 2 * M * inner * inner / t_sq / 1e12
    r_ff = 2 * 2 * M * inner * 4 * inner / t_ff / 1e12
    # FLOP weights: ~45% square projections, ~55% FF-shaped (from `rows`).
    # The floor is a TIME sum, so the composite rate is the flop-weighted
    # HARMONIC mean of the per-shape rates (an arithmetic mean would let
    # the fast FF shape mask the slow square shape).
    ceiling = 1.0 / (0.45 / r_sq + 0.55 / r_ff)

    achieved = story_tf / p50
    floor_s = story_tf / ceiling
    print(f"prior-only p50            : {p50:.4f} s  (compile {compile_s:.1f}s)")
    print(f"real matmul FLOPs/story   : {story_tf:.2f} TF "
          f"({per_step/1e9:.1f} GF/step x {args.steps})")
    print(f"achieved rate             : {achieved:.1f} TF/s")
    print(f"shape-matched MXU ceiling : {ceiling:.1f} TF/s "
          f"(square {r_sq:.1f}, FF {r_ff:.1f})")
    print(f"compute floor at ceiling  : {floor_s:.3f} s "
          f"-> headroom {p50 - floor_s:+.3f} s "
          f"({100 * (p50 - floor_s) / p50:.0f}% of p50)")
    if achieved > ceiling:
        print("NOTE: achieved > shape-matched composite — the compiled "
              "prior already beats its own shapes' chain-slope rates; "
              "remaining headroom is shape CHANGE (wider fused matmuls), "
              "not scheduling.")


if __name__ == "__main__":
    main()
