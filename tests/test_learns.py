"""End-to-end "training actually learns" tests (VERDICT r3 next-step #8).

Loss-decreases tests (tests/test_training.py) and frozen-weight parity
tests cannot catch conditioning-WIRING bugs — e.g. the fusion context fed
to the wrong UNet input, or the prior reading the wrong conditioning token
— because a mis-wired model still fits *something*. These tests close that
hole: overfit a tiny model on a two-story synthetic batch where each story
has DISTINCT conditioning and a DISTINCT target, then generate with the
trained params and assert

  1. the outputs move toward the targets (every training checkpoint beats
     the untrained model, the final one by a wide margin — checkpoint-to-
     checkpoint monotonicity is NOT asserted: two-sample training at an
     overfitting lr is noisy by construction), and
  2. conditioning discrimination: story A's generation is closer to
     target A than to target B (and vice versa) — the part a wiring bug
     breaks even when the loss goes down.

Protects the reference's full train->infer loop (SURVEY.md §3.1-3.4):
stage 1 `train_stage1.py:300-406` -> `prior_pipeline.py:246-373`, stage 2
`train_stage2.py:413-521` -> `RCDMs_pipeline.py:374-517`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.configs import (
    FusionConfig,
    OptimizerConfig,
    PriorConfig,
    StoryUNetConfig,
)
from rcdms_tpu.models.fusion import FusionModule
from rcdms_tpu.models.prior import FramePrior
from rcdms_tpu.models.unet3d import StoryUNet
from rcdms_tpu.sample.prior_sampler import PriorConditioning, PriorSampler
from rcdms_tpu.sample.story_sampler import StoryConditioning, StorySampler
from rcdms_tpu.train.optim import make_optimizer
from rcdms_tpu.train.stage1 import Stage1Batch, Stage1Trainer
from rcdms_tpu.train.stage2 import Stage2Batch, Stage2Trainer
from rcdms_tpu.train.train_state import TrainState

pytestmark = pytest.mark.slow  # a few hundred CPU train steps per test


def _mse(a, b):
    return float(jnp.mean((jnp.asarray(a, jnp.float32)
                           - jnp.asarray(b, jnp.float32)) ** 2))


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def _make_train_chunk(train_step, batch, key, n):
    """n train steps (fresh noise/t key each) as ONE jitted lax.scan —
    per-step python dispatch dominates tiny-model wall time on this box."""
    @jax.jit
    def chunk(state, base):
        def body(st, i):
            st, loss = train_step(st, batch, jax.random.fold_in(key, i))
            return st, loss
        state, _ = jax.lax.scan(body, state, base + jnp.arange(n))
        return state

    return chunk


def test_stage2_overfit_generates_the_right_story():
    """Overfit the stage-2 UNet+fusion on two (conditioning, target) pairs;
    DDIM generation must move toward the right target per conditioning."""
    b, f, hw, t = 2, 5, 16, 7
    ucfg = StoryUNetConfig.tiny()
    fcfg = FusionConfig.tiny(hidden_dim=ucfg.cross_attention_dim,
                             text_dim=ucfg.cross_attention_dim)
    trainer = Stage2Trainer(StoryUNet(ucfg), FusionModule(fcfg),
                            noise_offset=0.0)

    # two stories: smooth, well-separated latent targets + distinct text
    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, hw), jnp.linspace(-1, 1, hw),
                          indexing="ij")
    pat_a = jnp.stack([jnp.sin(2 * xx), jnp.cos(2 * yy), xx, yy], -1)
    pat_b = -pat_a[::-1]
    targets = jnp.stack([jnp.broadcast_to(pat_a, (f, hw, hw, 4)),
                         jnp.broadcast_to(pat_b, (f, hw, hw, 4))])
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    text = jnp.stack([
        jax.random.normal(ks[0], (f, t, fcfg.text_dim)),
        jax.random.normal(ks[1], (f, t, fcfg.text_dim))])
    batch = Stage2Batch(
        latents=targets,
        masked_latents=jnp.zeros((b, f, hw, hw, 4)),
        mask_label=jnp.zeros((b, f, hw, hw, 1)),
        image_tokens=jax.random.normal(ks[2], (b, f, 9, fcfg.seen_vis_dim)),
        image_proj=jax.random.normal(ks[3], (b, f, fcfg.unseen_vis_dim)),
        text_hidden=text,
        frame_known=jnp.zeros((b, f), bool),
    )

    params = trainer.init_params(jax.random.PRNGKey(1), batch)
    # lr 2e-3 was unstable on this recipe (the 3rd checkpoint regressed
    # 0.52 -> 0.69 and broke discrimination); 1e-3 x 250-step chunks holds
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=0))
    state = TrainState.create(params, tx)
    train_chunk = _make_train_chunk(trainer.train_step, batch,
                                    jax.random.PRNGKey(2), 250)

    sampler = StorySampler(trainer.unet, trainer.fusion, num_steps=20,
                           guidance_scale=1.0)  # no CFG: trained cond only
    cond = StoryConditioning(
        text_hidden=batch.text_hidden, text_hidden_u=batch.text_hidden,
        image_tokens=batch.image_tokens, image_proj=batch.image_proj,
        frame_known=batch.frame_known,
        masked_latents=batch.masked_latents, mask_label=batch.mask_label)
    generate = jax.jit(lambda p: sampler(
        {"params": p["params"]["unet"]}, {"params": p["params"]["fusion"]},
        cond, jax.random.PRNGKey(42)))

    mses = [_mse(generate(state.params), targets)]
    for ck in range(3):  # 3 x 250 steps, fresh noise/t each step
        state = train_chunk(state, ck * 250)
        mses.append(_mse(generate(state.params), targets))

    # every checkpoint improves on the untrained model; final by a wide
    # margin (checkpoint-to-checkpoint noise is expected — see docstring)
    for cur in mses[1:]:
        assert cur < mses[0], mses
    assert mses[-1] < 0.6 * mses[0], mses

    # conditioning discrimination: each story lands nearer ITS OWN target
    gen = generate(state.params)
    assert _mse(gen[0], targets[0]) < _mse(gen[0], targets[1]), mses
    assert _mse(gen[1], targets[1]) < _mse(gen[1], targets[0]), mses


def test_stage1_overfit_predicts_the_right_embeddings():
    """Overfit the frame prior on two (caption, target-embedding) pairs;
    UnCLIP sampling must reproduce the right embeddings per caption."""
    cfg = PriorConfig.tiny()
    b, f, d, t = 2, cfg.num_frames, cfg.embedding_dim, cfg.num_text_tokens
    trainer = Stage1Trainer(FramePrior(cfg), noise_offset=0.0)

    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    # targets drawn at the CLIP-embedding statistics the model normalizes by
    targets = (cfg.clip_mean
               + cfg.clip_std * jax.random.normal(ks[0], (b, f, d)))
    batch = Stage1Batch(
        target_embed=targets,
        source_embed=jnp.zeros((b, f, d)),
        mask_embed=jnp.zeros((b, f, d)),
        text_embed=jax.random.normal(ks[1], (b, f, d)),
        text_hidden=jax.random.normal(ks[2], (b, f, t, d)),
        text_mask=jnp.ones((b, f, t), bool),
    )
    params = trainer.model.init(
        ks[3], batch.target_embed, jnp.zeros((b, f), jnp.int32),
        batch.text_embed, batch.text_hidden, batch.source_embed,
        batch.mask_embed, batch.text_mask)
    tx = make_optimizer(OptimizerConfig(learning_rate=2e-3, warmup_steps=0,
                                        grad_clip_norm=10.0))
    state = TrainState.create(params, tx)
    train_chunk = _make_train_chunk(trainer.train_step, batch,
                                    jax.random.PRNGKey(4), 100)

    sampler = PriorSampler(trainer.model, num_steps=10, guidance_scale=1.0)
    cond = PriorConditioning(
        text_embed=batch.text_embed, text_hidden=batch.text_hidden,
        text_mask=batch.text_mask, text_embed_u=batch.text_embed,
        text_hidden_u=batch.text_hidden, text_mask_u=batch.text_mask,
        image_embed=batch.source_embed, mask_embed=batch.mask_embed)
    generate = jax.jit(
        lambda p: sampler(p, cond, jax.random.PRNGKey(42)))

    coss = [_cos(generate(state.params), targets)]
    for ck in range(3):
        state = train_chunk(state, ck * 100)
        coss.append(_cos(generate(state.params), targets))

    for cur in coss[1:]:
        assert cur > coss[0], coss
    assert coss[-1] > 0.9, coss

    gen = generate(state.params)
    assert _cos(gen[0], targets[0]) > _cos(gen[0], targets[1]), coss
    assert _cos(gen[1], targets[1]) > _cos(gen[1], targets[0]), coss
