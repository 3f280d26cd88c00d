"""Golden-value tests for the diffusion schedulers: every closed-form
quantity is recomputed here with independent float64 numpy and compared
against the jitted jax implementations (SURVEY.md §7 step 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.core.schedulers import (
    DDIMSchedule,
    DDPMSchedule,
    UnCLIPSchedule,
    cfg_combine,
    make_betas,
)


def test_beta_tables_golden():
    lin = make_betas("linear", 1000, 0.00085, 0.012)
    assert lin[0] == pytest.approx(0.00085)
    assert lin[-1] == pytest.approx(0.012)
    assert np.all(np.diff(lin) > 0)

    sl = make_betas("scaled_linear", 1000, 0.00085, 0.012)
    assert sl[0] == pytest.approx(0.00085)
    assert sl[-1] == pytest.approx(0.012)
    # midpoint of sqrt-space interpolation
    mid = ((np.sqrt(0.00085) + np.sqrt(0.012)) / 2) ** 2
    assert sl[499] == pytest.approx(mid, rel=1e-2)

    cos = make_betas("squaredcos_cap_v2", 1000)
    def alpha_bar(t):
        return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
    expect0 = 1 - alpha_bar(1 / 1000) / alpha_bar(0.0)
    assert cos[0] == pytest.approx(expect0, rel=1e-10)
    assert cos.max() <= 0.999 + 1e-12


def test_add_noise_golden():
    sched = DDPMSchedule.stage2_train()
    x0 = jnp.ones((2, 3), jnp.float32) * 0.5
    noise = jnp.ones((2, 3), jnp.float32)
    t = jnp.array([0, 999], jnp.int32)
    out = np.asarray(jax.jit(sched.add_noise)(x0, noise, t))
    acp = sched.alphas_cumprod
    for i, ti in enumerate([0, 999]):
        expect = np.sqrt(acp[ti]) * 0.5 + np.sqrt(1 - acp[ti]) * 1.0
        np.testing.assert_allclose(out[i], expect, rtol=1e-5)


def test_ddpm_step_variance_and_mean():
    sched = DDPMSchedule.stage2_train()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4).astype(np.float32))
    eps = jnp.asarray(rng.randn(1, 4).astype(np.float32))
    z = jnp.asarray(rng.randn(1, 4).astype(np.float32))
    t = jnp.array(500, jnp.int32)
    out = np.asarray(jax.jit(sched.step)(eps, t, x, z))

    acp = sched.alphas_cumprod
    beta = sched.betas[500]
    a_t, a_prev = acp[500], acp[499]
    x0 = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
    x0 = np.clip(x0, -1, 1)
    mean = (np.sqrt(a_prev) * beta / (1 - a_t) * x0
            + np.sqrt(1 - beta) * (1 - a_prev) / (1 - a_t) * np.asarray(x))
    var = (1 - a_prev) / (1 - a_t) * beta
    expect = mean + np.sqrt(var) * np.asarray(z)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)

    # t=0: no noise is added
    out0 = np.asarray(sched.step(eps, jnp.array(0, jnp.int32), x, z))
    x0_0 = (np.asarray(x) - np.sqrt(1 - acp[0]) * np.asarray(eps)) / np.sqrt(acp[0])
    x0_0 = np.clip(x0_0, -1, 1)
    mean0 = (np.sqrt(1.0) * sched.betas[0] / (1 - acp[0]) * x0_0
             + np.sqrt(1 - sched.betas[0]) * 0.0 / (1 - acp[0]) * np.asarray(x))
    np.testing.assert_allclose(out0, mean0, rtol=1e-4, atol=1e-5)


def test_ddim_timestep_spacing_leading():
    sched = DDIMSchedule.stage2_inference()
    ts = sched.timesteps(20)
    assert ts.tolist() == list(range(950, -1, -50))
    prev = sched.prev_timesteps(20)
    assert prev.tolist() == list(range(900, -51, -50))


def test_ddim_step_golden_eta0():
    sched = DDIMSchedule.stage2_inference()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    eps = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    t, pt = jnp.array(950, jnp.int32), jnp.array(900, jnp.int32)
    out = np.asarray(jax.jit(sched.step)(eps, t, pt, x))

    acp = sched.alphas_cumprod
    a_t, a_prev = acp[950], acp[900]
    x0 = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
    x0c = np.clip(x0, -1, 1)
    eps2 = (np.asarray(x) - np.sqrt(a_t) * x0c) / np.sqrt(1 - a_t)
    expect = np.sqrt(a_prev) * x0c + np.sqrt(1 - a_prev) * eps2
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_ddim_final_step_alpha_to_one():
    sched = DDIMSchedule.stage2_inference()
    x = jnp.ones((1, 2), jnp.float32) * 0.3
    eps = jnp.zeros((1, 2), jnp.float32)
    out = np.asarray(sched.step(eps, jnp.array(0, jnp.int32),
                                jnp.array(-50, jnp.int32), x))
    # acp_prev == 1 -> output is exactly (clipped) pred_x0
    a0 = sched.alphas_cumprod[0]
    x0 = 0.3 / np.sqrt(a0)
    np.testing.assert_allclose(out, np.clip(x0, -1, 1), rtol=1e-5)


def test_unclip_timesteps_trailing_linspace():
    sched = UnCLIPSchedule()
    ts = sched.timesteps(20)
    expect = np.round(np.arange(20) * (999 / 19))[::-1].astype(int)
    assert ts.tolist() == expect.tolist()
    prev = sched.prev_timesteps(20)
    assert prev[:-1].tolist() == ts[1:].tolist()
    assert prev[-1] == ts[-1] - 1


def test_unclip_step_golden_sample_prediction():
    sched = UnCLIPSchedule()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8).astype(np.float32))
    pred_x0 = jnp.asarray((rng.randn(2, 8) * 3).astype(np.float32))
    z = jnp.asarray(rng.randn(2, 8).astype(np.float32))
    t, pt = jnp.array(999, jnp.int32), jnp.array(946, jnp.int32)
    out = np.asarray(jax.jit(sched.step)(pred_x0, t, pt, x, z))

    acp = sched.alphas_cumprod
    a_t, a_prev = acp[999], acp[946]
    beta = 1 - a_t / a_prev          # non-adjacent transition
    alpha = 1 - beta
    x0 = np.clip(np.asarray(pred_x0), -10, 10)
    mean = (np.sqrt(a_prev) * beta / (1 - a_t) * x0
            + np.sqrt(alpha) * (1 - a_prev) / (1 - a_t) * np.asarray(x))
    std = np.sqrt(np.clip((1 - a_prev) / (1 - a_t) * beta, 1e-20, None))
    np.testing.assert_allclose(out, mean + std * np.asarray(z),
                               rtol=1e-4, atol=1e-5)


def test_unclip_adjacent_step_uses_beta_table():
    sched = UnCLIPSchedule()
    x = jnp.ones((1, 4), jnp.float32)
    x0 = jnp.zeros((1, 4), jnp.float32)
    z = jnp.zeros((1, 4), jnp.float32)
    out = np.asarray(sched.step(x0, jnp.array(5, jnp.int32),
                                jnp.array(4, jnp.int32), x, z))
    acp = sched.alphas_cumprod
    beta = sched.betas[5]
    mean = np.sqrt(1 - beta) * (1 - acp[4]) / (1 - acp[5]) * 1.0
    np.testing.assert_allclose(out, mean, rtol=1e-5)


def test_sample_prediction_roundtrip():
    """x0 -> add_noise -> step with perfect model -> closer to x0."""
    sched = DDPMSchedule.stage1_train()
    assert sched.prediction_type == "sample"
    x0 = jnp.full((1, 4), 0.7, jnp.float32)
    noise = jnp.ones((1, 4), jnp.float32)
    xt = sched.add_noise(x0, noise, jnp.array(800, jnp.int32))
    out = sched.step(x0, jnp.array(800, jnp.int32), xt,
                     jnp.zeros_like(x0))
    assert np.all(np.abs(np.asarray(out) - 0.7)
                  < np.abs(np.asarray(xt) - 0.7))


def test_cfg_combine():
    u = jnp.array([1.0]); c = jnp.array([3.0])
    np.testing.assert_allclose(np.asarray(cfg_combine(u, c, 2.0)), [5.0])
