"""Stage-1 training CLI — the reference `train_stage1.py` + run_stage1_*.sh
collapsed into one entry point with typed flags.

    python -m rcdms_tpu.cli.train_stage1 --dataset flintstones \
        --h5-path .../flintstones.h5 \
        --prior-pretrained .../kandinsky-2-2-prior/prior \
        --text-pretrained .../kandinsky-2-2-prior/text_encoder \
        --vision-pretrained .../kandinsky-2-2-prior/image_encoder \
        --output-dir runs/stage1

Distribution is automatic: all visible devices form a ('data',) mesh with
DP batch sharding + ZeRO-2 optimizer-state sharding (--no-zero2 to disable).
Smoke mode (no pretrained dirs, synthetic data): --synthetic.
"""

from __future__ import annotations

import argparse

import jax

from rcdms_tpu.configs import (
    CLIPTextConfig,
    CLIPVisionConfig,
    MeshConfig,
    OptimizerConfig,
    Stage1TrainConfig,
    PriorConfig,
    TemporalConfig,
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
from rcdms_tpu.train.stage1 import Stage1Trainer, encode_batch
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
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic data + tiny model (smoke test)")
    p.add_argument("--native-feeder", action="store_true",
                   help="pack pixel batches in the C++ thread pool "
                        "(native/story_feeder.cpp, bit-exact vs the numpy "
                        "protocol; build with `make -C native`)")
    p.add_argument("--prior-pretrained", default=None)
    p.add_argument("--text-pretrained", default=None)
    p.add_argument("--vision-pretrained", default=None)
    p.add_argument("--tokenizer-path", default=None)
    p.add_argument("--output-dir", default="runs/stage1")
    p.add_argument("--resume-from-checkpoint", default=None)
    p.add_argument("--rcdms-init-ckpt", default=None,
                   help="warm-start the prior from a reference DeepSpeed "
                        "blob (mp_rank_00_model_states.pt)")
    _d = Stage1TrainConfig()  # typed defaults (single source of truth)
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
                   help="reference-format OmegaConf YAML (training.yaml "
                        "schema) applied to the prior's temporal modules")
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
        prior_cfg = PriorConfig.tiny(num_text_tokens=ds_cfg.max_text_len)
        text_cfg = CLIPTextConfig.tiny(
            max_positions=ds_cfg.max_text_len,
            vocab_size=49500, eos_token_id=49407,
            width=prior_cfg.embedding_dim,
            projection_dim=prior_cfg.embedding_dim)
        vision_cfg = CLIPVisionConfig.tiny(
            image_size=ds_cfg.clip_size,
            projection_dim=prior_cfg.embedding_dim)
    else:
        from rcdms_tpu.data.datasets import StoryH5Dataset

        from rcdms_tpu.data.prefetch import required_feeder_depth

        dataset = StoryH5Dataset(
            ds_cfg, "train", args.tokenizer_path,
            use_native_feeder=args.native_feeder,
            feeder_buffer_depth=(2 if args.no_prefetch
                                 else required_feeder_depth(1)))
        prior_cfg = PriorConfig(
            num_text_tokens=ds_cfg.max_text_len,
            temporal=TemporalConfig(max_frames=ds_cfg.num_frames))
        text_cfg = CLIPTextConfig.bigg(max_positions=ds_cfg.max_text_len,
                                       vocab_size=ds_cfg.vocab_size)
        vision_cfg = CLIPVisionConfig()

    if args.config:
        from rcdms_tpu.configs.reference_yaml import (
            apply_to_unet_config,
            parse_reference_yaml,
        )

        overrides, _ = parse_reference_yaml(args.config)
        prior_cfg = apply_to_unet_config(prior_cfg, overrides)

    import jax.numpy as _jnp

    dtype = _jnp.bfloat16 if args.dtype == "bfloat16" else _jnp.float32
    text_enc, text_p = common.build_text_encoder(text_cfg,
                                                 args.text_pretrained,
                                                 dtype=dtype)
    vis_enc, vis_p = common.build_vision_encoder(vision_cfg,
                                                 args.vision_pretrained,
                                                 dtype=dtype)
    prior, prior_p = common.build_prior(prior_cfg, args.prior_pretrained,
                                        dtype=dtype)
    if args.rcdms_init_ckpt:
        # warm-start from the reference's trained DeepSpeed blob
        # (train_stage1.py:57-74 resume semantics)
        prior_p = common.load_rcdms_stage1(args.rcdms_init_ckpt, prior_cfg,
                                           prior_p)

    trainer = Stage1Trainer(prior, noise_offset=args.noise_offset)
    tx = make_optimizer(OptimizerConfig(
        learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
        max_steps=args.max_train_steps, grad_clip_norm=args.max_grad_norm,
        accumulate_steps=args.accumulate_steps))
    state = TrainState.create(prior_p, tx)

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
    encode = jax.jit(lambda raw: encode_batch(text_enc, text_p, vis_enc,
                                              vis_p, raw))

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
        batch = encode(raw)  # frozen encoders run DP-sharded under GSPMD
        state, loss = step_fn(state, batch,
                              jax.random.fold_in(key, step_i))
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
