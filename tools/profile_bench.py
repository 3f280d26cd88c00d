"""Profile the stage-2 story sampler on the real chip and print a per-op
aggregate table (top HLO ops by self time, grouped by category).

    python tools/profile_bench.py [--tiny] [--attn auto|xla|pallas]
                                  [--steps N] [--top K]

Captures a jax.profiler trace of one steady-state sampler call and parses
the xplane protobuf via tensorboard_plugin_profile. Used to maintain the
profile table in BASELINE.md."""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def capture_trace(fn, outdir):
    fn()  # compile + warm
    fn()
    with jax.profiler.trace(outdir):
        fn()


def parse_xplane(outdir, top=30, full_names=False):
    """Aggregate the device 'XLA Ops' lane of the chrome trace the profiler
    writes next to the xplane (no protobuf/plugin dependency). `while` loop
    container events are excluded (they span their children)."""
    import re

    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace.json.gz under {outdir}"
    trace = json.loads(gzip.open(paths[0]).read())
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tid_names = {(e["pid"], e.get("tid")): e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
    device_pids = {p for p, n in pid_names.items()
                   if re.search(r"TPU|Chip|device", n, re.I)}
    bucket = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if "XLA Ops" not in tid_names.get((e["pid"], e.get("tid")), ""):
            continue
        name = e.get("name", "?")
        if name.startswith("while"):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        bucket[name if full_names else name.split(".")[0]] += dur
        total += dur
    return bucket, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--attn", default="auto")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--full-pipeline", action="store_true")
    ap.add_argument("--prior", action="store_true",
                    help="profile the stage-1 PriorSampler alone (same "
                         "build as tools/prior_floor_study.py)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rcdms_tpu.ops.attention import set_default_attention_impl
    set_default_attention_impl(args.attn)

    import bench
    import numpy as np

    if args.prior:
        import jax.numpy as jnp

        from rcdms_tpu.configs import PriorConfig
        from rcdms_tpu.models.prior import FramePrior
        from rcdms_tpu.sample.prior_sampler import (
            PriorConditioning,
            PriorSampler,
        )

        cfg = PriorConfig()
        model = FramePrior(cfg, dtype=jnp.bfloat16)
        sampler = PriorSampler(model, num_steps=args.steps,
                               guidance_scale=2.0)
        b, f, t, d = 1, cfg.num_frames, cfg.num_text_tokens, cfg.embedding_dim
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        cond = PriorConditioning(
            text_embed=jax.random.normal(ks[0], (b, f, d), jnp.bfloat16),
            text_hidden=jax.random.normal(ks[1], (b, f, t, d), jnp.bfloat16),
            text_mask=jnp.ones((b, f, t), bool),
            text_embed_u=jax.random.normal(ks[2], (b, f, d), jnp.bfloat16),
            text_hidden_u=jax.random.normal(ks[3], (b, f, t, d),
                                            jnp.bfloat16),
            text_mask_u=jnp.ones((b, f, t), bool),
            image_embed=jax.random.normal(ks[4], (b, f, d), jnp.bfloat16),
            mask_embed=jax.random.normal(ks[5], (b, f, d), jnp.bfloat16),
        )
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16
                                if s.dtype == jnp.float32 else s.dtype),
            jax.eval_shape(
                lambda k: model.init(
                    k, jnp.zeros((b, f, d)), jnp.zeros((b, f), jnp.int32),
                    jnp.zeros((b, f, d)), jnp.zeros((b, f, t, d)),
                    jnp.zeros((b, f, d)), jnp.zeros((b, f, d)),
                    jnp.ones((b, f, t), bool)),
                ks[6]))
        run_j = jax.jit(sampler.__call__)

        def fn():
            out = run_j(params, cond, ks[7])
            out.block_until_ready()
            float(np.asarray(out[(0,) * out.ndim]))
    elif args.full_pipeline:
        pipeline, params, inputs, _ = bench.build_full_pipeline(
            args.tiny, steps=args.steps)
        run_j = jax.jit(pipeline.generate)
        key = jax.random.PRNGKey(0)

        def fn():
            out, _ = run_j(params, inputs, key)
            out.block_until_ready()
            float(np.asarray(out[(0,) * out.ndim]))
    else:
        sampler, unet_p, fusion_p, cond, _, _ = bench.build(
            args.tiny, "float32")
        import dataclasses

        sampler = dataclasses.replace(sampler, num_steps=args.steps)
        run_j = jax.jit(sampler.__call__)
        key = jax.random.PRNGKey(0)

        def fn():
            out = run_j(unet_p, fusion_p, cond, key)
            out.block_until_ready()
            float(np.asarray(out[(0,) * out.ndim]))

    outdir = tempfile.mkdtemp(prefix="jaxprof_")
    t0 = time.perf_counter()
    capture_trace(fn, outdir)
    print(f"# traced in {time.perf_counter() - t0:.1f}s -> {outdir}",
          file=sys.stderr)

    bucket, total = parse_xplane(outdir, args.top)
    print(f"{'op':40s} {'ms':>10s} {'%':>6s}")
    for name, ms in bucket.most_common(args.top):
        print(f"{name:40s} {ms:10.2f} {100 * ms / max(total, 1e-9):6.1f}")
    print(f"{'TOTAL(device)':40s} {total:10.2f}")


if __name__ == "__main__":
    main()
