"""Gradient accumulation (optax.MultiSteps) + injectable sampler noise."""

import jax
import jax.numpy as jnp
import numpy as np

from rcdms_tpu.configs import OptimizerConfig, PriorConfig
from rcdms_tpu.train.optim import make_optimizer
from rcdms_tpu.train.train_state import TrainState


def test_gradient_accumulation_matches_big_batch():
    """2 microbatch steps with accumulate_steps=2 == 1 step on the mean
    gradient."""
    def loss_fn(p, x):
        return jnp.mean((p["w"] * x - 1.0) ** 2)

    x1, x2 = jnp.array([1.0, 2.0]), jnp.array([3.0, 0.5])
    params = {"w": jnp.array(0.5)}
    cfg = OptimizerConfig(learning_rate=1e-2, warmup_steps=0,
                          grad_clip_norm=None)

    # accumulated: two micro steps
    tx_acc = make_optimizer(
        OptimizerConfig(learning_rate=1e-2, warmup_steps=0,
                        grad_clip_norm=None, accumulate_steps=2))
    st = TrainState.create(params, tx_acc)
    for x in (x1, x2):
        g = jax.grad(loss_fn)(st.params, x)
        st = st.apply_gradients(g)
    # reference: one step on the averaged gradient
    tx = make_optimizer(cfg)
    st_ref = TrainState.create(params, tx)
    g_mean = jax.tree_util.tree_map(
        lambda a, b: (a + b) / 2, jax.grad(loss_fn)(params, x1),
        jax.grad(loss_fn)(params, x2))
    st_ref = st_ref.apply_gradients(g_mean)
    np.testing.assert_allclose(float(st.params["w"]),
                               float(st_ref.params["w"]), rtol=1e-6)
    # first micro step must not move params
    st2 = TrainState.create(params, tx_acc)
    st2 = st2.apply_gradients(jax.grad(loss_fn)(params, x1))
    np.testing.assert_allclose(float(st2.params["w"]), 0.5)


def test_prior_sampler_injected_step_noise():
    from tests.test_samplers import _prior_setup

    key = jax.random.PRNGKey(0)
    sampler, params, cond = _prior_setup(key, steps=3)
    noise = jax.random.normal(key, (3, 1, 5, 16))
    o1 = sampler(params, cond, jax.random.PRNGKey(1),
                 init_latents=jnp.zeros((1, 5, 16)), step_noise=noise)
    # key must be irrelevant once noise is injected
    o2 = sampler(params, cond, jax.random.PRNGKey(999),
                 init_latents=jnp.zeros((1, 5, 16)), step_noise=noise)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = sampler(params, cond, jax.random.PRNGKey(1),
                 init_latents=jnp.zeros((1, 5, 16)), step_noise=noise + 1.0)
    assert np.abs(np.asarray(o1 - o3)).max() > 1e-6
