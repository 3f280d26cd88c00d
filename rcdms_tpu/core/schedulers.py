"""Diffusion schedulers as pure functions over precomputed tables.

TPU-native re-design of the reference's diffusers scheduler usage:
  * stage-1 training:  DDPM(squaredcos_cap_v2, prediction='sample')
    (`/root/reference/train_stage1.py:187`)
  * stage-1 sampling:  UnCLIP scheduler with explicit `prev_timestep`
    (`/root/reference/src/pipelines/prior_pipeline.py:326-337`)
  * stage-2 training:  DDPM(scaled_linear 0.00085->0.012)
    (`/root/reference/train_stage2.py:299-301`)
  * stage-2 sampling:  DDIM(linear 0.00085->0.012)
    (`/root/reference/configs/testing.yaml:18-21`,
     `src/pipelines/RCDMs_pipeline.py:497`)

Everything here is shape-static and traced-`t` friendly so samplers compile
into a single `lax.scan` over timesteps. Tables are float64 numpy at build
time for accuracy, cast to float32 jnp on first use.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def make_betas(schedule: str, num_train_timesteps: int = 1000,
               beta_start: float = 0.0001, beta_end: float = 0.02) -> np.ndarray:
    """Beta tables matching diffusers semantics (float64 for accuracy)."""
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps,
                           dtype=np.float64)
    if schedule == "scaled_linear":
        return np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                           num_train_timesteps, dtype=np.float64) ** 2
    if schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(num_train_timesteps, dtype=np.float64)
        betas = 1.0 - alpha_bar((ts + 1) / num_train_timesteps) / alpha_bar(
            ts / num_train_timesteps)
        return np.minimum(betas, 0.999)
    raise ValueError(f"unknown beta schedule: {schedule}")


@dataclass(frozen=True)
class DiffusionSchedule:
    """Shared alpha/beta tables + q(x_t|x_0) forward process."""

    beta_schedule: str = "linear"
    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    prediction_type: str = "epsilon"   # epsilon | sample | v_prediction
    clip_sample: bool = False
    clip_sample_range: float = 1.0

    @cached_property
    def _tables(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        betas = make_betas(self.beta_schedule, self.num_train_timesteps,
                           self.beta_start, self.beta_end)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        return betas, alphas, alphas_cumprod

    @property
    def betas(self) -> np.ndarray:
        return self._tables[0]

    @property
    def alphas(self) -> np.ndarray:
        return self._tables[1]

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return self._tables[2]

    @property
    def one_minus_alphas_cumprod(self) -> np.ndarray:
        # computed in float64 to avoid fp32 cancellation at small t
        return 1.0 - self._tables[2]

    # ---- forward process -------------------------------------------------

    def _gather(self, table: np.ndarray, t: Array, ndim: int) -> Array:
        """Gather per-timestep scalars and reshape for broadcasting against a
        sample with `ndim` dims whose leading axis is batch."""
        vals = jnp.take(jnp.asarray(table, dtype=jnp.float32), t, axis=0)
        return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))

    def add_noise(self, x0: Array, noise: Array, t: Array) -> Array:
        """q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1-acp_t) noise.
        `t` is int32 of shape () or (batch,)."""
        acp = self._gather(self.alphas_cumprod, t, x0.ndim)
        omacp = self._gather(self.one_minus_alphas_cumprod, t, x0.ndim)
        return jnp.sqrt(acp) * x0 + jnp.sqrt(omacp) * noise

    def velocity(self, x0: Array, noise: Array, t: Array) -> Array:
        """v-prediction target: sqrt(acp) eps - sqrt(1-acp) x0."""
        acp = self._gather(self.alphas_cumprod, t, x0.ndim)
        omacp = self._gather(self.one_minus_alphas_cumprod, t, x0.ndim)
        return jnp.sqrt(acp) * noise - jnp.sqrt(omacp) * x0

    def pred_x0(self, model_output: Array, sample: Array, t: Array) -> Array:
        """Recover x0 from the model output under `prediction_type`."""
        acp = self._gather(self.alphas_cumprod, t, sample.ndim)
        omacp = self._gather(self.one_minus_alphas_cumprod, t, sample.ndim)
        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(omacp) * model_output) / jnp.sqrt(acp)
        elif self.prediction_type == "sample":
            x0 = model_output
        elif self.prediction_type == "v_prediction":
            x0 = jnp.sqrt(acp) * sample - jnp.sqrt(omacp) * model_output
        else:
            raise ValueError(self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        return x0


# ---------------------------------------------------------------------------
# DDPM (ancestral sampling; training uses add_noise only)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DDPMSchedule(DiffusionSchedule):
    """DDPM with fixed-small variance (diffusers `DDPMScheduler` semantics)."""

    variance_type: str = "fixed_small"

    @classmethod
    def stage1_train(cls) -> "DDPMSchedule":
        # reference train_stage1.py:187
        return cls(beta_schedule="squaredcos_cap_v2",
                   prediction_type="sample", clip_sample=True,
                   clip_sample_range=1.0)

    @classmethod
    def stage2_train(cls) -> "DDPMSchedule":
        # reference train_stage2.py:299-301 (diffusers defaults otherwise)
        return cls(beta_schedule="scaled_linear", beta_start=0.00085,
                   beta_end=0.012, prediction_type="epsilon",
                   clip_sample=True, clip_sample_range=1.0)

    def step(self, model_output: Array, t: Array, sample: Array,
             noise: Array) -> Array:
        """One ancestral step x_t -> x_{t-1}. `noise` must be supplied by the
        caller (externalized RNG for parity testing)."""
        ndim = sample.ndim
        acp_prev = jnp.where(_bshape(t > 0, ndim),
                             self._gather(self.alphas_cumprod,
                                          jnp.maximum(t - 1, 0), ndim),
                             1.0)
        beta_t = self._gather(self.betas, t, ndim)
        alpha_t = 1.0 - beta_t
        beta_prod_t = self._gather(self.one_minus_alphas_cumprod, t, ndim)
        beta_prod_prev = jnp.where(
            _bshape(t > 0, ndim),
            self._gather(self.one_minus_alphas_cumprod,
                         jnp.maximum(t - 1, 0), ndim), 0.0)

        x0 = self.pred_x0(model_output, sample, t)
        x0_coeff = jnp.sqrt(acp_prev) * beta_t / beta_prod_t
        cur_coeff = jnp.sqrt(alpha_t) * beta_prod_prev / beta_prod_t
        mean = x0_coeff * x0 + cur_coeff * sample

        var = jnp.clip(beta_prod_prev / beta_prod_t * beta_t, min=1e-20)
        has_noise = (t > 0).astype(mean.dtype)
        has_noise = has_noise.reshape(has_noise.shape + (1,) * (ndim - has_noise.ndim))
        return mean + has_noise * jnp.sqrt(var) * noise


# ---------------------------------------------------------------------------
# DDIM
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DDIMSchedule(DiffusionSchedule):
    """DDIM (diffusers `DDIMScheduler`, leading timestep spacing,
    `set_alpha_to_one=True`). Stage-2 inference uses this with linear betas
    0.00085->0.012 (`configs/testing.yaml:18-21`) and the diffusers defaults
    `clip_sample=True`, `prediction_type='epsilon'`."""

    clip_sample: bool = True
    steps_offset: int = 0

    @classmethod
    def stage2_inference(cls) -> "DDIMSchedule":
        return cls(beta_schedule="linear", beta_start=0.00085, beta_end=0.012)

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """'leading' spacing: (arange(S) * (T//S)).round()[::-1] + offset."""
        step_ratio = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1]
        return (ts + self.steps_offset).astype(np.int32)

    def prev_timesteps(self, num_inference_steps: int) -> np.ndarray:
        ts = self.timesteps(num_inference_steps)
        return (ts - self.num_train_timesteps // num_inference_steps).astype(
            np.int32)

    def step(self, model_output: Array, t: Array, prev_t: Array,
             sample: Array, eta: float = 0.0,
             noise: Optional[Array] = None) -> Array:
        """One DDIM step x_t -> x_{prev_t}. prev_t may be negative (final)."""
        ndim = sample.ndim
        acp_t = self._gather(self.alphas_cumprod, t, ndim)
        in_range = _bshape(prev_t >= 0, ndim)
        acp_prev = jnp.where(
            in_range,
            self._gather(self.alphas_cumprod, jnp.maximum(prev_t, 0), ndim),
            1.0)  # set_alpha_to_one
        omacp_t = self._gather(self.one_minus_alphas_cumprod, t, ndim)
        omacp_prev = jnp.where(
            in_range,
            self._gather(self.one_minus_alphas_cumprod,
                         jnp.maximum(prev_t, 0), ndim), 0.0)

        x0 = self.pred_x0(model_output, sample, t)
        # re-derive epsilon from (possibly clipped) x0 — diffusers behavior
        eps = (sample - jnp.sqrt(acp_t) * x0) / jnp.sqrt(omacp_t)

        if eta > 0.0:
            var = (omacp_prev / omacp_t) * (1.0 - acp_t / acp_prev)
            sigma = eta * jnp.sqrt(var)
        else:
            sigma = jnp.zeros_like(acp_t)

        dir_xt = jnp.sqrt(omacp_prev - sigma ** 2) * eps
        prev = jnp.sqrt(acp_prev) * x0 + dir_xt
        if eta > 0.0:
            if noise is None:
                raise ValueError("eta>0 requires externally supplied noise")
            prev = prev + sigma * noise
        return prev


# ---------------------------------------------------------------------------
# UnCLIP (stage-1 prior sampling)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class UnCLIPSchedule(DiffusionSchedule):
    """diffusers `UnCLIPScheduler` semantics with explicit `prev_timestep`
    (the reference's least-standard scheduler — `prior_pipeline.py:326-337`).
    Kandinsky-2.2-prior config: squaredcos_cap_v2 betas, prediction='sample',
    variance_type='fixed_small_log', clip_sample_range=10."""

    beta_schedule: str = "squaredcos_cap_v2"
    prediction_type: str = "sample"
    clip_sample: bool = True
    clip_sample_range: float = 10.0

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """'trailing linspace' spacing used by UnCLIPScheduler.set_timesteps."""
        if num_inference_steps == 1:
            return np.array([self.num_train_timesteps - 1], dtype=np.int32)
        step_ratio = (self.num_train_timesteps - 1) / (num_inference_steps - 1)
        ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1]
        return ts.astype(np.int32)

    def prev_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """prev_timestep chain: next entry of the timestep table; the final
        step uses t-1 (reference passes prev_timestep=None there, and the
        scheduler falls back to t-1)."""
        ts = self.timesteps(num_inference_steps)
        prev = np.concatenate([ts[1:], ts[-1:] - 1])
        return prev.astype(np.int32)

    def step(self, model_output: Array, t: Array, prev_t: Array,
             sample: Array, noise: Array) -> Array:
        """One UnCLIP ancestral step x_t -> x_{prev_t}."""
        ndim = sample.ndim
        acp_t = self._gather(self.alphas_cumprod, t, ndim)
        in_range = _bshape(prev_t >= 0, ndim)
        acp_prev = jnp.where(
            in_range,
            self._gather(self.alphas_cumprod, jnp.maximum(prev_t, 0), ndim),
            1.0)
        beta_prod_t = self._gather(self.one_minus_alphas_cumprod, t, ndim)
        beta_prod_prev = jnp.where(
            in_range,
            self._gather(self.one_minus_alphas_cumprod,
                         jnp.maximum(prev_t, 0), ndim), 0.0)

        # effective beta/alpha for (possibly multi-step) transition
        is_adjacent = _bshape(prev_t == t - 1, ndim)
        beta_table = self._gather(self.betas, t, ndim)
        beta_eff = jnp.where(is_adjacent, beta_table, 1.0 - acp_t / acp_prev)
        alpha_eff = 1.0 - beta_eff

        x0 = self.pred_x0(model_output, sample, t)

        x0_coeff = jnp.sqrt(acp_prev) * beta_eff / beta_prod_t
        cur_coeff = jnp.sqrt(alpha_eff) * beta_prod_prev / beta_prod_t
        mean = x0_coeff * x0 + cur_coeff * sample

        # fixed_small_log: std = exp(0.5 * log(clip(var, 1e-20)))
        var = beta_prod_prev / beta_prod_t * beta_eff
        std = jnp.exp(0.5 * jnp.log(jnp.clip(var, min=1e-20)))
        has_noise = _bshape(t > 0, ndim).astype(mean.dtype)
        return mean + has_noise * std * noise


def _bshape(x: Array, ndim: int) -> Array:
    """Reshape a () or (batch,) bool/float for broadcasting to `ndim` dims."""
    x = jnp.asarray(x)
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def cfg_combine(uncond: Array, cond: Array, scale: float) -> Array:
    """Classifier-free guidance mix."""
    return uncond + scale * (cond - uncond)
