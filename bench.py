"""Benchmark: stage-2 story generation throughput on one chip.

Prints ONE JSON line:
  {"metric": "stage2_frames_per_sec_per_chip", "value": N, "unit":
   "frames/s/chip", "vs_baseline": R, ...}

North-star (BASELINE.json): 5-frame 512px story in <=2 s p50 on v5e-8, i.e.
5 / (2 s * 8 chips) = 0.3125 frames/s/chip for the full two-stage pipeline;
stage 2 dominates the FLOPs. `vs_baseline` = measured frames/s/chip divided
by that 0.3125 target (>1.0 beats the target).

Measures the full compiled stage-2 sampling loop (20 DDIM steps, CFG 2.0,
512px latents = 64x64, 5 frames, bf16, SD1.5-scale UNet + fusion) with
random weights — identical compute to trained weights. p50 over repeats.

  python bench.py           # full-size (TPU)
  python bench.py --tiny    # CPU smoke
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

# The target prices a 5-frame story in <= 2 s of FULL two-stage inference
# on a v5e-8 (BASELINE.md targets): amortized over 8 chips that is
# 0.3125 frames/s/chip. vs_baseline therefore compares a SINGLE-chip
# throughput against an 8-chip-amortized floor — an honest "x the minimum
# viable rate", NOT "x faster than the 2 s story target" (the single-chip
# story p50 is reported alongside; the sharded full-story p50 is modeled
# at 0.66 s on a v5e-8 — BASELINE.md round-5 audit — and is emitted below
# as modeled_v5e8_full_story_p50_s for the full-pipeline metric).
BASELINE_FRAMES_PER_SEC_PER_CHIP = 5.0 / (2.0 * 8)
MODELED_V5E8_FULL_STORY_P50_S = 0.66  # tools/comm_audit.py --full, space4


def timed_compile(jitted, *args):
    """AOT-split timing (VERDICT r4 #3): returns (compile_s, first_run_s,
    compiled). compile_s covers trace + lowering + XLA optimization (or the
    persistent-cache hit); first_run_s is the first execution of the already
    compiled program, including the axon tunnel's first-dispatch overhead
    and the device->host fetch that drains it."""
    import numpy as np

    t0 = time.perf_counter()
    compiled = jitted.lower(*args).compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(*args)
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        leaf.block_until_ready()
    float(np.asarray(leaves[0][(0,) * leaves[0].ndim]))
    first_run_s = time.perf_counter() - t0
    return compile_s, first_run_s, compiled


def build(tiny: bool, params_dtype: str = "float32",
          use_temporal: bool = True, temporal_attn_layers: int = 2,
          batch: int = 1, mesh=None, image_size: int = 512,
          frames: int = None, guidance: float = 2.0,
          tiny_channels: tuple = None):
    from rcdms_tpu.configs import FusionConfig, StoryUNetConfig
    from rcdms_tpu.models.fusion import FusionModule
    from rcdms_tpu.models.unet3d import StoryUNet
    from rcdms_tpu.sample.story_sampler import StoryConditioning, StorySampler

    dtype = jnp.bfloat16
    if tiny:
        tkw = {"block_channels": tiny_channels} if tiny_channels else {}
        ucfg = StoryUNetConfig.tiny(use_temporal=use_temporal, **tkw)
        fcfg = FusionConfig.tiny(hidden_dim=ucfg.cross_attention_dim,
                                 text_dim=ucfg.cross_attention_dim)
        hw, n_vis, steps = 8, 9, 3
    else:
        from rcdms_tpu.configs import TemporalConfig

        ucfg = StoryUNetConfig(  # SD1.5-scale
            use_temporal=use_temporal,
            num_frames=frames or 5,
            temporal=TemporalConfig(
                attn_layers_per_block=temporal_attn_layers))
        fcfg = FusionConfig()
        hw, n_vis, steps = image_size // 8, 257, 20

    unet = StoryUNet(ucfg, dtype=dtype)
    fusion = FusionModule(fcfg, dtype=dtype)
    sampler = StorySampler(unet, fusion, num_steps=steps,
                           guidance_scale=guidance, mesh=mesh)

    b, f, t = batch, ucfg.num_frames, 91 if not tiny else 7
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    cond = StoryConditioning(
        text_hidden=jax.random.normal(ks[0], (b, f, t, fcfg.text_dim), dtype),
        text_hidden_u=jax.random.normal(ks[1], (b, f, t, fcfg.text_dim),
                                        dtype),
        image_tokens=jax.random.normal(ks[2], (b, f, n_vis,
                                               fcfg.seen_vis_dim), dtype),
        image_proj=jax.random.normal(ks[3], (b, f, fcfg.unseen_vis_dim),
                                     dtype),
        frame_known=jnp.zeros((b, f), bool).at[:, 0].set(True),
        masked_latents=jax.random.normal(ks[4], (b, f, hw, hw, 4), dtype),
        mask_label=jnp.ones((b, f, hw, hw, 1), dtype),
    )

    pdt = jnp.dtype(params_dtype)

    def zeros_like_tree(tree):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, pdt if s.dtype == jnp.float32
                                else s.dtype), tree)

    x9 = jnp.zeros((b, f, hw, hw, ucfg.in_channels), dtype)
    ctx = jnp.zeros((b, f, t, ucfg.cross_attention_dim), dtype)
    unet_p = zeros_like_tree(jax.eval_shape(
        lambda k: unet.init(k, x9, jnp.zeros((b,), jnp.int32), ctx),
        jax.random.PRNGKey(1)))
    fusion_p = zeros_like_tree(jax.eval_shape(
        lambda k: fusion.init(k, cond.image_tokens, cond.image_proj,
                              cond.text_hidden, cond.frame_known),
        jax.random.PRNGKey(2)))
    return sampler, unet_p, fusion_p, cond, f, steps


def build_full_pipeline(tiny: bool, steps: int = 20,
                        encoder_propagation: int = 0, batch: int = 1):
    """Full two-stage pipeline (CLIP towers + prior + unet + fusion + VAE)
    with random weights — the BASELINE north-star config (5-frame 512px
    story, both stages, one compiled program). `batch` stories run through
    ONE jitted generate (the evaluate CLI's --eval-batch path)."""
    import numpy as np

    from rcdms_tpu.cli import evaluate
    from rcdms_tpu.sample.pipeline import StoryInputs

    argv = ["--synthetic"] if tiny else ["--dtype", "bfloat16"]
    args = evaluate.parse_args(argv + ["--num-inference-steps", str(steps),
                                       "--guidance-scale", "2.0",
                                       "--encoder-propagation",
                                       str(encoder_propagation)])
    # no pretrained dirs => zero-init at the configured (full) size, born in
    # bf16 (fp32 params of all five towers are ~18 GB and overflow one
    # chip's HBM; zeros give identical compute cost to trained weights)
    if not tiny:
        from rcdms_tpu.cli.common import set_lazy_zero_init

        set_lazy_zero_init(True)
    pipeline, params, _, ds_cfg = evaluate.build_pipeline(args)
    b, f = batch, ds_cfg.num_frames
    size, csize = ds_cfg.image_size, ds_cfg.clip_size
    t1 = pipeline.text_encoder_s1.cfg.max_positions
    t2 = pipeline.text_encoder_s2.cfg.max_positions
    rng = np.random.RandomState(0)
    inputs = StoryInputs(
        tokens_s1=jnp.asarray(rng.randint(0, 1000, (b, f, t1)), jnp.int32),
        tokens_s1_u=jnp.asarray(rng.randint(0, 1000, (b, f, t1)), jnp.int32),
        tokens_s2=jnp.asarray(rng.randint(0, 1000, (b, f, t2)), jnp.int32),
        tokens_s2_u=jnp.asarray(rng.randint(0, 1000, (b, f, t2)), jnp.int32),
        source_clip=jnp.asarray(rng.randn(b, f, csize, csize, 3),
                                jnp.float32),
        mask_clip=jnp.asarray(rng.randn(b, f, csize, csize, 3), jnp.float32),
        source_pixels=jnp.zeros((b, f, size, size, 3), jnp.float32),
        frame_known=jnp.zeros((b, f), bool).at[:, 0].set(True),
    )
    return pipeline, params, inputs, b * f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--attn", default="auto", choices=["auto", "xla",
                                                       "pallas"])
    ap.add_argument("--params-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="bfloat16 = the production TPU serving config "
                         "(identical compute cost; fp32 kept for A/B)")
    ap.add_argument("--no-temporal", action="store_true",
                    help="diagnostic: drop temporal modules")
    ap.add_argument("--temporal-attn-layers", type=int, default=2,
                    help="diagnostic: temporal attention layers per block")
    ap.add_argument("--batch", type=int, default=1,
                    help="stories per batch (BASELINE config #4 uses 8)")
    ap.add_argument("--image-size", type=int, default=512,
                    help="pixel size; latents are size/8 (BASELINE config "
                         "#2 uses 256)")
    ap.add_argument("--frames", type=int, default=None,
                    help="frames per story (config #2 uses 1)")
    ap.add_argument("--guidance-scale", type=float, default=2.0,
                    help="CFG scale (config #2 uses 7.5; compute cost is "
                         "scale-independent)")
    ap.add_argument("--steps", type=int, default=None,
                    help="DDIM steps (default: 20, the reference eval "
                         "config; BASELINE config #4 uses 50)")
    ap.add_argument("--batched-cfg", action="store_true",
                    help="run the CFG pair as one batch-2b UNet call "
                         "instead of two sequential b calls (A/B for the "
                         "per-op overhead vs activation-memory tradeoff)")
    ap.add_argument("--encoder-propagation", type=int, default=0,
                    help="OPT-IN approximate fast sampling: recompute the "
                         "UNet encoder every k-th step (k>=2; changes "
                         "numerics — excluded from the default metric)")
    ap.add_argument("--int8", action="store_true",
                    help="OPT-IN w8a8 int8 quantized inference "
                         "(ops/quant.py; changes numerics — excluded from "
                         "the default metric)")
    ap.add_argument("--full-pipeline", action="store_true",
                    help="measure the whole two-stage pipeline (CLIP towers "
                         "+ prior + unet + VAE) instead of stage-2 only")
    ap.add_argument("--no-cond-cache", action="store_true",
                    help="(--full-pipeline) re-encode the story-independent "
                         "conditioning per story like the reference instead "
                         "of using the precomputed CondCache (A/B)")
    ap.add_argument("--shard-story", action="store_true",
                    help="shard the single story over ALL devices "
                         "(('cfg','frame','space') inference mesh) — the "
                         "v5e-8 latency config; frames/s/chip divides by "
                         "the device count")
    ap.add_argument("--train-step", action="store_true",
                    help="measure the FULL-SCALE stage-2 train step "
                         "(SD1.5 StoryUNet + fusion, fp32 params + Adam, "
                         "bf16 compute) instead of sampling — BASELINE "
                         "config #5's real-chip half")
    ap.add_argument("--remat", action="store_true",
                    help="(--train-step) gradient checkpointing on the "
                         "UNet sub-blocks")
    args = ap.parse_args()

    from rcdms_tpu.ops.attention import set_default_attention_impl
    set_default_attention_impl(args.attn)
    if args.int8:
        from rcdms_tpu.ops.quant import set_quant_mode
        set_quant_mode("int8")

    import os

    # persistent compile cache BEFORE any dispatch: the train-step and
    # full-pipeline paths are the most expensive compiles in the repo
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.full_pipeline:
        return main_full_pipeline(args)
    if args.train_step:
        return main_train_step(args)

    mesh = None
    n_chips = 1
    if args.shard_story:
        from rcdms_tpu.ops.attention import configure_for_mesh
        from rcdms_tpu.train.sharding import inference_mesh

        mesh = inference_mesh(jax.devices())
        configure_for_mesh(mesh)  # GSPMD-partitionable attention path
        n_chips = len(jax.devices())

    sampler, unet_p, fusion_p, cond, frames, steps = build(
        args.tiny, args.params_dtype, use_temporal=not args.no_temporal,
        temporal_attn_layers=args.temporal_attn_layers, batch=args.batch,
        mesh=mesh, image_size=args.image_size, frames=args.frames,
        guidance=args.guidance_scale)
    if args.steps or args.encoder_propagation or args.batched_cfg:
        import dataclasses

        sampler = dataclasses.replace(
            sampler, num_steps=args.steps or sampler.num_steps,
            encoder_propagation=args.encoder_propagation,
            sequential_cfg=not args.batched_cfg)
        steps = args.steps or steps
    frames = frames * args.batch
    run = jax.jit(sampler.__call__)

    def sync(x):
        # block_until_ready does not reliably block through the axon TPU
        # tunnel — force a (tiny) device->host fetch to drain the pipeline
        import numpy as np

        x.block_until_ready()
        return float(np.asarray(x[(0,) * x.ndim]))

    key = jax.random.PRNGKey(42)
    compile_s, first_run_s, run = timed_compile(run, unet_p, fusion_p, cond,
                                                key)
    sync(run(unet_p, fusion_p, cond, key))  # warm-up, steady-state dispatch

    times = []
    for i in range(args.repeats):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        sync(run(unet_p, fusion_p, cond, k))
        times.append(time.perf_counter() - t0)
    # true median: with an even repeat count the upper-middle element would
    # let one tunnel-hiccup outlier masquerade as the p50
    import statistics

    p50 = statistics.median(times)
    fps = frames / p50 / n_chips

    result = {
        "metric": "stage2_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC_PER_CHIP, 4),
        "vs_baseline_denominator": "0.3125 f/s/chip (2s v5e-8 target, "
                                   "8-chip-amortized)",
        "p50_story_latency_s": round(p50, 4),
        "ddim_steps": steps,
        "compile_s": round(compile_s, 2),
        "first_run_s": round(first_run_s, 2),
        "compile_plus_first_run_s": round(compile_s + first_run_s, 2),
        "backend": jax.default_backend(),
        "tiny": args.tiny,
        "attn": args.attn,
        "params_dtype": args.params_dtype,
        "n_chips": n_chips,
        "encoder_propagation": args.encoder_propagation,
        "int8": args.int8,
    }
    print(json.dumps(result))
    return 0


def main_train_step(args):
    """Full-scale stage-2 train step on the real chip (VERDICT r2 #3 /
    BASELINE config #5): SD1.5-scale StoryUNet + fusion, fp32 params +
    Adam moments, bf16 compute, one device. Reports s/step, achieved
    stories/s/chip against the reference's 8xGPU batch-1 fp16+ZeRO-2
    envelope (`run_stage2_PororoSV.sh:4-21`), and HBM in use."""
    import numpy as np

    from rcdms_tpu.configs import (
        FusionConfig,
        OptimizerConfig,
        StoryUNetConfig,
        TemporalConfig,
    )
    from rcdms_tpu.models.fusion import FusionModule
    from rcdms_tpu.models.unet3d import StoryUNet
    from rcdms_tpu.train.optim import make_optimizer
    from rcdms_tpu.train.stage2 import Stage2Batch, Stage2Trainer
    from rcdms_tpu.train.train_state import TrainState

    dtype = jnp.bfloat16
    if args.tiny:
        ucfg = StoryUNetConfig.tiny(remat=args.remat)
        fcfg = FusionConfig.tiny(hidden_dim=ucfg.cross_attention_dim,
                                 text_dim=ucfg.cross_attention_dim)
        hw, n_vis, t = 8, 9, 7
    else:
        ucfg = StoryUNetConfig(remat=args.remat,
                               temporal=TemporalConfig())
        fcfg = FusionConfig()
        hw, n_vis, t = args.image_size // 8, 257, 91

    trainer = Stage2Trainer(StoryUNet(ucfg, dtype=dtype),
                            FusionModule(fcfg, dtype=dtype))
    b, f = args.batch, args.frames or 5
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    batch = Stage2Batch(
        latents=jax.random.normal(ks[0], (b, f, hw, hw, 4)),
        masked_latents=jax.random.normal(ks[1], (b, f, hw, hw, 4)),
        mask_label=jnp.ones((b, f, hw, hw, 1)),
        image_tokens=jax.random.normal(ks[2], (b, f, n_vis,
                                               fcfg.seen_vis_dim), dtype),
        image_proj=jax.random.normal(ks[3], (b, f, fcfg.unseen_vis_dim),
                                     dtype),
        text_hidden=jax.random.normal(ks[4], (b, f, t, fcfg.text_dim),
                                      dtype),
        frame_known=jnp.zeros((b, f), bool).at[:, 0].set(True),
    )
    # training params: fp32 master weights by default (the reference's
    # ZeRO-2 semantics; 1.285B params -> 14.4 GiB of fp32 Adam state, which
    # does NOT fit one 16 GiB v5e chip — that config needs the sharded
    # v5e-8/16 path). --params-dtype bfloat16 gives the single-chip
    # measurable envelope (params+moments bf16, 7.2 GiB state).
    pdt = jnp.dtype(args.params_dtype)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, pdt if s.dtype == jnp.float32
                            else s.dtype),
        jax.eval_shape(lambda k: trainer.init_params(k, batch), ks[5]))
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-5, warmup_steps=0,
                                        grad_clip_norm=1.0))
    state = TrainState.create(params, tx)
    n_params = sum(int(np.prod(l.shape)) for l in
                   jax.tree_util.tree_leaves(params))

    step = jax.jit(trainer.train_step, donate_argnums=(0,))

    def sync(x):
        x.block_until_ready()
        return float(np.asarray(x))

    t0 = time.perf_counter()
    state, loss = step(state, batch, ks[6])
    sync(loss)
    compile_and_first = time.perf_counter() - t0

    times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        state, loss = step(state, batch, jax.random.fold_in(key, i))
        sync(loss)
        times.append(time.perf_counter() - t0)
    import statistics

    p50 = statistics.median(times)

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in stats:
                mem[k.replace("bytes", "gb")] = round(stats[k] / 2**30, 2)
    except Exception:
        pass

    print(json.dumps({
        "metric": "stage2_train_step_p50_s",
        "value": round(p50, 4),
        "unit": "s/step",
        # reference envelope: 8 GPUs x batch 1 -> this chip's stories/s vs
        # one reference GPU's share is not published; vs_baseline reports
        # stories/s/chip directly
        "vs_baseline": round(b / p50, 4),
        "stories_per_s_per_chip": round(b / p50, 4),
        "batch": b,
        "remat": args.remat,
        "params_m": round(n_params / 1e6, 1),
        "compile_plus_first_run_s": round(compile_and_first, 2),
        "backend": jax.default_backend(),
        "tiny": args.tiny,
        **mem,
    }))
    return 0


def main_full_pipeline(args):
    import numpy as np

    steps = 3 if args.tiny else (args.steps or 20)
    pipeline, params, inputs, frames = build_full_pipeline(
        args.tiny, steps=steps,
        encoder_propagation=args.encoder_propagation, batch=args.batch)
    cache = None
    if not args.no_cond_cache:
        # story-independent conditioning precomputed once (CondCache):
        # synthetic stand-ins for the white/black mask images + uncond rows
        # (identical compute cost to the real constants)
        csize = inputs.source_clip.shape[-2]
        cache = jax.jit(pipeline.precompute_cond_cache)(
            params, inputs.tokens_s1_u[0, 0], inputs.tokens_s2_u[0, 0],
            jnp.ones((csize, csize, 3), jnp.float32),
            jnp.zeros((csize, csize, 3), jnp.float32))
        run = jax.jit(lambda p, i, k: pipeline.generate(p, i, k, cache))
    else:
        run = jax.jit(pipeline.generate)

    def sync(out):
        imgs, _ = out
        imgs.block_until_ready()
        return float(np.asarray(imgs[(0,) * imgs.ndim]))

    key = jax.random.PRNGKey(42)
    compile_s, first_run_s, run = timed_compile(run, params, inputs, key)
    sync(run(params, inputs, key))

    times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        sync(run(params, inputs, jax.random.fold_in(key, i)))
        times.append(time.perf_counter() - t0)
    # true median: with an even repeat count the upper-middle element would
    # let one tunnel-hiccup outlier masquerade as the p50
    import statistics

    p50 = statistics.median(times)
    fps = frames / p50
    print(json.dumps({
        "metric": "two_stage_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC_PER_CHIP, 4),
        "vs_baseline_denominator": "0.3125 f/s/chip (2s v5e-8 target, "
                                   "8-chip-amortized)",
        "p50_story_latency_s": round(p50, 4),
        "modeled_v5e8_full_story_p50_s": MODELED_V5E8_FULL_STORY_P50_S,
        "ddim_steps": steps,
        "compile_s": round(compile_s, 2),
        "first_run_s": round(first_run_s, 2),
        "compile_plus_first_run_s": round(compile_s + first_run_s, 2),
        "backend": jax.default_backend(),
        "tiny": args.tiny,
        "int8": args.int8,
        "cond_cache": cache is not None,
        "full_pipeline": True,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
