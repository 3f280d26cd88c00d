"""Optimizer + LR schedule from OptimizerConfig (reference: AdamW or
DeepSpeed DummyOptim, lr 1e-5, warmup 2000, grad clip 10.0 stage-1 / 1.0
stage-2 — `train_stage1.py:174-184`, `configs/stage1_config.py:178`,
`zero_stage2_config.json:23`)."""

from __future__ import annotations

import optax

from rcdms_tpu.configs import OptimizerConfig


def make_schedule(cfg: OptimizerConfig):
    if cfg.schedule == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
             optax.constant_schedule(cfg.learning_rate)],
            boundaries=[cfg.warmup_steps])
    if cfg.schedule == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps, cfg.max_steps)
    raise ValueError(cfg.schedule)


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    chain = []
    if cfg.grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    chain.append(optax.adamw(
        learning_rate=make_schedule(cfg), b1=cfg.beta1, b2=cfg.beta2,
        eps=cfg.eps, weight_decay=cfg.weight_decay))
    tx = optax.chain(*chain)
    if cfg.accumulate_steps > 1:
        # gradient accumulation (reference `gradient_accumulation_steps`,
        # train_stage2.py:494): microbatch gradients averaged over N steps
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_steps)
    return tx
