"""Stage-2 training CLI — the reference `train_stage2.py` + run_stage2_*.sh
equivalent (UNet + fusion stacks trained jointly; VAE/CLIP frozen).

    python -m rcdms_tpu.cli.train_stage2 --dataset flintstones \
        --h5-path .../flintstones.h5 \
        --sd-pretrained .../stable-diffusion-v1-5 \
        --vision-pretrained .../kandinsky-2-2-prior/image_encoder \
        --output-dir runs/stage2

Smoke mode: --synthetic (tiny models, synthetic data, CPU-runnable)."""

from __future__ import annotations

import argparse
import os

import jax

from rcdms_tpu.configs import (
    CLIPTextConfig,
    CLIPVisionConfig,
    FusionConfig,
    MeshConfig,
    OptimizerConfig,
    Stage2TrainConfig,
    StoryUNetConfig,
    TemporalConfig,
    VAEConfig,
)
from rcdms_tpu.cli import common
from rcdms_tpu.io.checkpoint import restore_checkpoint, save_checkpoint
from rcdms_tpu.train.loop import make_sharded_train_step, place_state
from rcdms_tpu.ops.attention import configure_for_mesh
from rcdms_tpu.train.optim import make_optimizer
from rcdms_tpu.train.sharding import (
    global_batch,
    local_batch_size,
    make_mesh,
)
from rcdms_tpu.train.stage2 import Stage2Trainer, encode_batch
from rcdms_tpu.train.train_state import TrainState
from rcdms_tpu.data.prefetch import PrefetchIterator
from rcdms_tpu.utils.logging import (
    MetricLogger,
    ProfileWindow,
    StepTimer,
    setup_logging,
)
from rcdms_tpu.utils.preemption import PreemptionGuard


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="flintstones",
                   choices=["flintstones", "pororosv"])
    p.add_argument("--h5-path", default="./datasets/ARLDM/flintstones.h5")
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--sr-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--native-feeder", action="store_true",
                   help="pack pixel batches in the C++ thread pool "
                        "(native/story_feeder.cpp, bit-exact vs the numpy "
                        "protocol; build with `make -C native`)")
    p.add_argument("--sd-pretrained", default=None,
                   help="stable-diffusion-v1-5 dir (unet/, vae/, "
                        "text_encoder/ subfolders)")
    p.add_argument("--vision-pretrained", default=None,
                   help="kandinsky image_encoder dir")
    p.add_argument("--tokenizer-path", default=None)
    p.add_argument("--unet-init-ckpt", default=None,
                   help="orbax checkpoint dir to warm-start the unet")
    p.add_argument("--output-dir", default="runs/stage2")
    p.add_argument("--resume-from-checkpoint", default=None)
    p.add_argument("--rcdms-init-ckpt", default=None,
                   help="warm-start unet+fusion from a reference DeepSpeed "
                        "blob (mp_rank_00_model_states.pt)")
    _d = Stage2TrainConfig()  # typed defaults (single source of truth)
    p.add_argument("--learning-rate", type=float,
                   default=_d.optimizer.learning_rate)
    p.add_argument("--warmup-steps", type=int,
                   default=_d.optimizer.warmup_steps)
    p.add_argument("--max-train-steps", type=int, default=1_000_000)
    p.add_argument("--batch-size", type=int, default=_d.batch_size,
                   help="global")
    p.add_argument("--noise-offset", type=float, default=_d.noise_offset)
    p.add_argument("--max-grad-norm", type=float,
                   default=_d.optimizer.grad_clip_norm)
    p.add_argument("--checkpointing-steps", type=int,
                   default=_d.checkpoint_every)
    p.add_argument("--gradient-checkpointing", action="store_true")
    p.add_argument("--no-zero2", action="store_true")
    p.add_argument("--accumulate-steps", type=int, default=1)
    p.add_argument("--seed", type=int, default=_d.seed)
    p.add_argument("--dtype", default=_d.compute_dtype,
                   choices=["bfloat16", "float32"],
                   help="compute dtype for the trained model and frozen "
                        "encoders (the reference trains fp16 — "
                        "zero_stage2_config.json:2; bf16 is the TPU "
                        "equivalent, norm/softmax stats stay fp32)")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--config", default=None,
                   help="reference-format OmegaConf YAML (the repo's "
                        "configs/training.yaml schema: unet_additional_"
                        "kwargs / motion_module_kwargs) applied to the "
                        "UNet config")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of training steps "
                        "[--profile-start, --profile-start + "
                        "--profile-steps) into this directory")
    p.add_argument("--profile-start", type=int, default=10)
    p.add_argument("--profile-steps", type=int, default=3)
    p.add_argument("--no-prefetch", action="store_true",
                   help="disable the background batch-prefetch thread")
    p.add_argument("--report-to", default="tensorboard",
                   help="comma list of trackers: tensorboard, wandb, comet_ml\n"
                        "(reference configs/stage1_config.py:132-141; JSONL is\n"
                        "always written; missing packages are skipped)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    common.enable_persistent_compile_cache()
    setup_logging()
    from rcdms_tpu.train.distributed import maybe_initialize

    maybe_initialize()
    log = MetricLogger(args.output_dir,
                       report_to=tuple(args.report_to.split(",")),
                       run_config=vars(args))

    ds_cfg = common.dataset_from_args(args)
    if args.synthetic:
        from rcdms_tpu.data.datasets import SyntheticStoryDataset

        dataset = SyntheticStoryDataset()
        ds_cfg = dataset.cfg
        unet_cfg = StoryUNetConfig.tiny(remat=args.gradient_checkpointing)
        fusion_cfg = FusionConfig.tiny(
            hidden_dim=unet_cfg.cross_attention_dim,
            text_dim=unet_cfg.cross_attention_dim)
        vae_cfg = VAEConfig.tiny()
        text_cfg = CLIPTextConfig.tiny(max_positions=ds_cfg.max_text_len,
                                       width=unet_cfg.cross_attention_dim,
                                       vocab_size=49500, eos_token_id=49407)
        vision_cfg = CLIPVisionConfig.tiny(
            image_size=ds_cfg.clip_size, width=fusion_cfg.seen_vis_dim,
            projection_dim=fusion_cfg.unseen_vis_dim)
    else:
        from rcdms_tpu.data.datasets import StoryH5Dataset

        from rcdms_tpu.data.prefetch import required_feeder_depth

        dataset = StoryH5Dataset(
            ds_cfg, "train", args.tokenizer_path,
            use_native_feeder=args.native_feeder,
            feeder_buffer_depth=(2 if args.no_prefetch
                                 else required_feeder_depth(1)))
        unet_cfg = StoryUNetConfig(
            remat=args.gradient_checkpointing,
            temporal=TemporalConfig(max_frames=ds_cfg.num_frames))
        fusion_cfg = FusionConfig()
        vae_cfg = VAEConfig()
        text_cfg = CLIPTextConfig.sd15(max_positions=ds_cfg.max_text_len,
                                       vocab_size=ds_cfg.vocab_size)
        vision_cfg = CLIPVisionConfig()

    if args.config:
        from rcdms_tpu.configs.reference_yaml import (
            apply_to_unet_config,
            parse_reference_yaml,
        )

        overrides, _ = parse_reference_yaml(args.config)
        unet_cfg = apply_to_unet_config(unet_cfg, overrides)

    import jax.numpy as _jnp

    dtype = _jnp.bfloat16 if args.dtype == "bfloat16" else _jnp.float32
    sd = args.sd_pretrained
    text_enc, text_p = common.build_text_encoder(
        text_cfg, os.path.join(sd, "text_encoder") if sd else None,
        dtype=dtype)
    vis_enc, vis_p = common.build_vision_encoder(vision_cfg,
                                                 args.vision_pretrained,
                                                 dtype=dtype)
    vae, vae_p = common.build_vae(
        vae_cfg, os.path.join(sd, "vae") if sd else None, dtype=dtype)
    unet, unet_p = common.build_unet(
        unet_cfg, os.path.join(sd, "unet") if sd else None, dtype=dtype)
    fusion, fusion_p = common.build_fusion(fusion_cfg, dtype=dtype)
    if args.rcdms_init_ckpt:
        # warm-start unet+fusion from the reference's trained DeepSpeed
        # blob (stage2_batchtest_rcdms_model.py:225-243 split semantics)
        unet_p, fusion_p = common.load_rcdms_stage2(
            args.rcdms_init_ckpt, unet_cfg, unet_p, fusion_p)

    params = {"params": {"unet": unet_p["params"],
                         "fusion": fusion_p["params"]}}
    if args.unet_init_ckpt:
        restored, _, _ = restore_checkpoint(args.unet_init_ckpt,
                                            {"params": params["params"]})
        params = {"params": restored["params"]}

    trainer = Stage2Trainer(unet, fusion, noise_offset=args.noise_offset)
    tx = make_optimizer(OptimizerConfig(
        learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
        max_steps=args.max_train_steps, grad_clip_norm=args.max_grad_norm,
        accumulate_steps=args.accumulate_steps))
    state = TrainState.create(params, tx)

    mesh = make_mesh(MeshConfig())
    # route rule-less kernels to XLA under a >1-device mesh (the partitioned
    # nt/frame/geglu kernels stay on) — without this the frozen-encoder
    # attention would be all-gathered + replicated on every device
    configure_for_mesh(mesh)
    if args.batch_size % mesh.shape["data"]:
        raise SystemExit(
            f"--batch-size {args.batch_size} must be divisible by the "
            f"data-parallel device count {mesh.shape['data']}")
    zero2 = not args.no_zero2
    state = place_state(state, mesh, zero2=zero2)
    step_fn = make_sharded_train_step(trainer.train_step, state, mesh,
                                      zero2=zero2,
                                      loss_fn=trainer.loss_fn,
                                      grad_sharding="replicated")
    encode = jax.jit(lambda raw, k: encode_batch(
        vae, vae_p, text_enc, text_p, vis_enc, vis_p, raw, k))

    start_step = 0
    if args.resume_from_checkpoint:
        restored, meta, start_step = restore_checkpoint(
            args.resume_from_checkpoint,
            {"params": state.params, "opt_state": state.opt_state,
             "step": state.step})
        state = state.replace(**restored)
        print(f"resumed from step {start_step}")

    # each process decodes ONLY its batch_size/P rows; global arrays are
    # assembled from the local shards (no P-times-redundant host decode)
    batches = dataset.batches(local_batch_size(args.batch_size),
                              seed=args.seed,
                              shard_id=jax.process_index(),
                              num_shards=jax.process_count())
    if not args.no_prefetch:
        # overlap host decode/pack with device compute; the native feeder's
        # ring is sized for this pipeline depth above (data/prefetch.py)
        batches = PrefetchIterator(batches, depth=1)
    guard = PreemptionGuard.install()
    profiler = ProfileWindow(args.profile_dir, args.profile_start,
                             args.profile_steps)

    def cleanup():
        # every loop exit: finalize an in-window trace, stop the prefetch
        # thread (and with it the h5/native-feeder handles it drives)
        profiler.close()
        if isinstance(batches, PrefetchIterator):
            batches.close()

    key = jax.random.PRNGKey(args.seed)
    timer = StepTimer()
    for step_i in range(start_step, args.max_train_steps):
        profiler.tick(step_i)
        raw = global_batch(mesh, next(batches))
        timer.data_loaded()
        # frozen VAE/CLIP encoders run DP-sharded under GSPMD
        batch = encode(raw, jax.random.fold_in(key, 2 * step_i))
        state, loss = step_fn(state, batch,
                              jax.random.fold_in(key, 2 * step_i + 1))
        if step_i % args.log_every == 0 or step_i == start_step:
            step_time, data_time = timer.step_done()
            log.log(step_i, {"loss": float(loss), "step_time": step_time,
                             "data_time": data_time})
            print(f"step {step_i} loss {float(loss):.5f} "
                  f"({step_time:.2f}s step, {data_time:.2f}s data)")
        else:
            timer.step_done()
        if (step_i + 1) % args.checkpointing_steps == 0:
            save_checkpoint(args.output_dir, step_i + 1,
                            {"params": state.params,
                             "opt_state": state.opt_state,
                             "step": state.step},
                            {"last_global_step": step_i + 1})
        if guard.should_stop_global():
            # SIGTERM (preemption): save at the step boundary, exit clean
            save_checkpoint(args.output_dir, step_i + 1,
                            {"params": state.params,
                             "opt_state": state.opt_state,
                             "step": state.step},
                            {"last_global_step": step_i + 1,
                             "preempted": True})
            print(f"preempted: checkpoint saved at step {step_i + 1}")
            cleanup()
            log.close()
            return
    cleanup()
    save_checkpoint(args.output_dir, args.max_train_steps,
                    {"params": state.params, "opt_state": state.opt_state,
                     "step": state.step},
                    {"last_global_step": args.max_train_steps})
    log.close()


if __name__ == "__main__":
    main()
