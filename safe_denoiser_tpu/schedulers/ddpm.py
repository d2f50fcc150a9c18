"""DDPM scheduler as pure functions over static tables.

Semantics mirror ``diffusers.DDPMScheduler`` as configured by the reference
(run_nudity.py:108 loads DDPMScheduler from the SD-v1.4 scheduler config:
scaled_linear betas 0.00085..0.012, 1000 train steps, steps_offset=1,
prediction_type=epsilon, variance_type=fixed_small, clip_sample=False — the
SD-v1.x scheduler_config.json disables sample clipping).

TPU-first design: no mutable state, no host sync inside the loop. All
per-timestep coefficients are fp32 tables indexed by the traced timestep so
``step``/``add_noise`` can live inside a jitted ``lax.scan``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(num_train_timesteps: int, beta_start: float, beta_end: float,
               beta_schedule: str = "scaled_linear") -> np.ndarray:
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64).astype(np.float32)
    if beta_schedule == "scaled_linear":
        return (np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps,
                            dtype=np.float64) ** 2).astype(np.float32)
    if beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        ts = np.arange(num_train_timesteps, dtype=np.float64)
        betas = 1.0 - alpha_bar((ts + 1) / num_train_timesteps) / alpha_bar(ts / num_train_timesteps)
        return np.minimum(betas, 0.999).astype(np.float32)
    raise ValueError(f"unknown beta_schedule {beta_schedule}")


@dataclass(frozen=True)
class DDPMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    prediction_type: str = "epsilon"
    variance_type: str = "fixed_small"
    timestep_spacing: str = "leading"
    steps_offset: int = 1


class DDPMScheduler:
    def __init__(self, config: DDPMConfig = DDPMConfig()):
        self.config = config
        betas = make_betas(config.num_train_timesteps, config.beta_start,
                           config.beta_end, config.beta_schedule)
        alphas = 1.0 - betas
        self.betas = jnp.asarray(betas)
        self.alphas_cumprod = jnp.asarray(np.cumprod(alphas, dtype=np.float64).astype(np.float32))
        self.init_noise_sigma = 1.0
        # Interface parity with the reference's repellency construction
        # (run_nudity.py:310-312).
        self.beta_start = config.beta_start
        self.beta_end = config.beta_end

    # ------------------------------------------------------------------
    # host-side
    # ------------------------------------------------------------------
    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """'leading' spacing with steps_offset, like diffusers set_timesteps."""
        n_train = self.config.num_train_timesteps
        if self.config.timestep_spacing == "leading":
            step_ratio = n_train // num_inference_steps
            ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
            ts += self.config.steps_offset
        elif self.config.timestep_spacing == "trailing":
            step_ratio = n_train / num_inference_steps
            ts = np.round(np.arange(n_train, 0, -step_ratio)).astype(np.int64) - 1
        else:  # linspace
            ts = np.linspace(0, n_train - 1, num_inference_steps).round()[::-1].astype(np.int64)
        return ts

    # ------------------------------------------------------------------
    # traced (inside-scan) ops — all fp32
    # ------------------------------------------------------------------
    def _alpha_prod(self, t):
        return self.alphas_cumprod[t]

    def _alpha_prod_prev(self, t, num_inference_steps: int):
        prev_t = t - self.config.num_train_timesteps // num_inference_steps
        return jnp.where(prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)

    def scale_model_input(self, sample, t):
        return sample

    def pred_original_sample(self, model_output, t, sample):
        """Tweedie x̂₀ estimate (the repellency hook input)."""
        alpha_prod_t = self._alpha_prod(t)
        beta_prod_t = 1.0 - alpha_prod_t
        if self.config.prediction_type == "epsilon":
            x0 = (sample - beta_prod_t ** 0.5 * model_output) / alpha_prod_t ** 0.5
        elif self.config.prediction_type == "v_prediction":
            x0 = alpha_prod_t ** 0.5 * sample - beta_prod_t ** 0.5 * model_output
        else:  # "sample"
            x0 = model_output
        if self.config.clip_sample:
            x0 = jnp.clip(x0, -self.config.clip_sample_range, self.config.clip_sample_range)
        return x0

    def step(self, model_output, t, sample, num_inference_steps: int,
             rng=None, noise=None):
        """One reverse step x_t -> x_{t-1}.

        Returns ``(prev_sample, pred_original_sample)`` — the two outputs the
        reference pipelines consume (``.prev_sample`` /
        ``.pred_original_sample`` of diffusers' DDPMSchedulerOutput).
        ``noise`` may be supplied by the caller (the sampler passes
        per-sample-keyed noise so batched runs reproduce row-wise runs).
        """
        alpha_prod_t = self._alpha_prod(t)
        alpha_prod_t_prev = self._alpha_prod_prev(t, num_inference_steps)
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_t_prev = 1.0 - alpha_prod_t_prev
        current_alpha_t = alpha_prod_t / alpha_prod_t_prev
        current_beta_t = 1.0 - current_alpha_t

        x0 = self.pred_original_sample(model_output, t, sample)

        pred_original_coeff = (alpha_prod_t_prev ** 0.5 * current_beta_t) / beta_prod_t
        current_sample_coeff = current_alpha_t ** 0.5 * beta_prod_t_prev / beta_prod_t
        pred_prev = pred_original_coeff * x0 + current_sample_coeff * sample

        # fixed_small variance, clamped like diffusers (min 1e-20); zero at t==0
        variance = jnp.clip(current_beta_t * beta_prod_t_prev / beta_prod_t, 1e-20, None)
        if self.config.variance_type == "fixed_small_log":
            std = jnp.exp(0.5 * jnp.log(variance))
        else:
            std = variance ** 0.5
        if noise is None:
            noise = jax.random.normal(rng, sample.shape, dtype=jnp.float32)
        pred_prev = pred_prev + jnp.where(t > 0, std, 0.0) * noise
        return pred_prev, x0

    def add_noise(self, original_samples, noise, t):
        """Forward-noise clean samples to level t (used by the repellency
        renoise, reference modified_safree_*_threshold_time.py:565-569, and
        the β calibration, repellency_methods_threshold.py:108-155)."""
        sqrt_alpha_prod = self.alphas_cumprod[t] ** 0.5
        sqrt_one_minus = (1.0 - self.alphas_cumprod[t]) ** 0.5
        return sqrt_alpha_prod * original_samples + sqrt_one_minus * noise
