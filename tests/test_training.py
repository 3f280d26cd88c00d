"""Training tests: loss decreases on a fixed batch, and the sharded
(8-virtual-CPU-device mesh) GSPMD data-parallel + ZeRO-2 path runs and
matches the single-device math (SURVEY.md §4: 'test multi-node without a
cluster')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.configs import (
    FusionConfig,
    MeshConfig,
    OptimizerConfig,
    PriorConfig,
    StoryUNetConfig,
)
from rcdms_tpu.models.fusion import FusionModule
from rcdms_tpu.models.prior import FramePrior
from rcdms_tpu.models.unet3d import StoryUNet
from rcdms_tpu.train.loop import make_sharded_train_step, place_state
from rcdms_tpu.train.optim import make_optimizer
from rcdms_tpu.train.sharding import make_mesh, shard_batch, zero2_opt_state_shardings
from rcdms_tpu.train.stage1 import Stage1Batch, Stage1Trainer
from rcdms_tpu.train.stage2 import Stage2Batch, Stage2Trainer
from rcdms_tpu.train.train_state import TrainState

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m 'not slow'


def _stage1_batch(key, b=8):
    cfg = PriorConfig.tiny()
    f, d, t = cfg.num_frames, cfg.embedding_dim, cfg.num_text_tokens
    ks = jax.random.split(key, 6)
    return cfg, Stage1Batch(
        target_embed=jax.random.normal(ks[0], (b, f, d)),
        source_embed=jax.random.normal(ks[1], (b, f, d)),
        mask_embed=jax.random.normal(ks[2], (b, f, d)),
        text_embed=jax.random.normal(ks[3], (b, f, d)),
        text_hidden=jax.random.normal(ks[4], (b, f, t, d)),
        text_mask=jnp.ones((b, f, t), bool),
    )


def test_stage1_loss_decreases():
    key = jax.random.PRNGKey(0)
    cfg, batch = _stage1_batch(key, b=4)
    trainer = Stage1Trainer(FramePrior(cfg))
    params = trainer.model.init(
        key, batch.target_embed, jnp.zeros(batch.target_embed.shape[:2],
                                           jnp.int32),
        batch.text_embed, batch.text_hidden, batch.source_embed,
        batch.mask_embed, batch.text_mask)
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=0,
                                        grad_clip_norm=10.0))
    state = TrainState.create(params, tx)
    step = jax.jit(trainer.train_step)
    losses = []
    for i in range(5):
        state, loss = step(state, batch, jax.random.PRNGKey(42))  # fixed key
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def _stage2_setup(key, b=8, hw=8):
    ucfg = StoryUNetConfig.tiny()
    fcfg = FusionConfig.tiny(hidden_dim=ucfg.cross_attention_dim,
                             text_dim=ucfg.cross_attention_dim)
    f, t = 5, 7
    ks = jax.random.split(key, 8)
    batch = Stage2Batch(
        latents=jax.random.normal(ks[0], (b, f, hw, hw, 4)),
        masked_latents=jax.random.normal(ks[1], (b, f, hw, hw, 4)),
        mask_label=jnp.ones((b, f, hw, hw, 1)),
        image_tokens=jax.random.normal(ks[2], (b, f, 9, fcfg.seen_vis_dim)),
        image_proj=jax.random.normal(ks[3], (b, f, fcfg.unseen_vis_dim)),
        text_hidden=jax.random.normal(ks[4], (b, f, t, fcfg.text_dim)),
        frame_known=jnp.zeros((b, f), bool).at[:, :2].set(True),
    )
    trainer = Stage2Trainer(StoryUNet(ucfg), FusionModule(fcfg))
    params = trainer.init_params(ks[5], batch)
    return trainer, params, batch


def test_stage2_loss_decreases():
    key = jax.random.PRNGKey(1)
    trainer, params, batch = _stage2_setup(key, b=2)
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=0))
    state = TrainState.create(params, tx)
    step = jax.jit(trainer.train_step)
    losses = []
    for _ in range(4):
        state, loss = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_stage2_sharded_train_step_zero2():
    """Full DP + ZeRO-2 path on the 8-device CPU mesh: optimizer state is
    actually sharded, loss matches the unsharded step."""
    key = jax.random.PRNGKey(2)
    trainer, params, batch = _stage2_setup(key, b=8)
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=0))
    state = TrainState.create(params, tx)

    # unsharded reference loss (same key, same batch)
    ref_loss = float(trainer.loss_fn(state.params, batch,
                                     jax.random.PRNGKey(3)))

    mesh = make_mesh(MeshConfig())
    sstate = place_state(state, mesh, zero2=True)
    sbatch = shard_batch(mesh, batch)
    step = make_sharded_train_step(trainer.train_step, sstate, mesh,
                                   zero2=True, loss_fn=trainer.loss_fn,
                                   grad_sharding="replicated")
    sstate2, loss = step(sstate, sbatch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)

    # ZeRO-2: at least one optimizer-state leaf is sharded over 'data'
    shardings = zero2_opt_state_shardings(sstate2.opt_state, mesh)
    specs = [s.spec for s in jax.tree_util.tree_leaves(shardings)]
    assert any("data" in str(sp) for sp in specs)
    leaves = jax.tree_util.tree_leaves(sstate2.opt_state)
    sharded_leaf = [l for l in leaves
                    if hasattr(l, "sharding")
                    and "data" in str(getattr(l.sharding, "spec", ""))]
    assert sharded_leaf, "no optimizer-state leaf is actually sharded"
    # params stay replicated
    p_leaf = jax.tree_util.tree_leaves(sstate2.params)[0]
    assert p_leaf.sharding.is_fully_replicated


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_stage1_sharded_matches_unsharded_params():
    """One DP step over the mesh produces the same updated params as the
    single-device step (GSPMD grad all-reduce correctness)."""
    key = jax.random.PRNGKey(4)
    cfg, batch = _stage1_batch(key, b=8)
    trainer = Stage1Trainer(FramePrior(cfg))
    params = trainer.model.init(
        key, batch.target_embed, jnp.zeros(batch.target_embed.shape[:2],
                                           jnp.int32),
        batch.text_embed, batch.text_hidden, batch.source_embed,
        batch.mask_embed, batch.text_mask)
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=0,
                                        grad_clip_norm=None))
    state = TrainState.create(params, tx)
    ref_state, ref_loss = jax.jit(trainer.train_step)(
        state, batch, jax.random.PRNGKey(5))

    mesh = make_mesh(MeshConfig())
    sstate = place_state(state, mesh, zero2=True)
    step = make_sharded_train_step(trainer.train_step, sstate, mesh,
                                   donate=False, loss_fn=trainer.loss_fn,
                                   grad_sharding="replicated")
    sstate2, loss = step(sstate, shard_batch(mesh, batch),
                         jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    # sharded grad reduction order differs from single-device; Adam's
    # normalization amplifies the fp32 noise, so compare at 10% of one
    # lr=1e-3 Adam step
    ref_leaf = np.asarray(jax.tree_util.tree_leaves(ref_state.params)[0])
    sh_leaf = np.asarray(jax.tree_util.tree_leaves(sstate2.params)[0])
    np.testing.assert_allclose(sh_leaf, ref_leaf, atol=1e-4)
