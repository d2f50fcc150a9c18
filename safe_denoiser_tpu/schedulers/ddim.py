"""DDIM scheduler (pure-functional), diffusers-semantics.

Used by BASELINE benchmark config #1 (10-step DDIM nudity run). Same static
fp32 tables + traced-timestep design as DDPMScheduler.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .ddpm import make_betas


@dataclass(frozen=True)
class DDIMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    set_alpha_to_one: bool = False
    prediction_type: str = "epsilon"
    timestep_spacing: str = "leading"
    steps_offset: int = 1
    eta: float = 0.0
    # diffusers recomputes epsilon from the clipped x0 only when the caller
    # passes use_clipped_model_output=True (default False)
    use_clipped_model_output: bool = False


class DDIMScheduler:
    def __init__(self, config: DDIMConfig = DDIMConfig()):
        self.config = config
        betas = make_betas(config.num_train_timesteps, config.beta_start,
                           config.beta_end, config.beta_schedule)
        alphas = 1.0 - betas
        self.alphas_cumprod = jnp.asarray(np.cumprod(alphas, dtype=np.float64).astype(np.float32))
        self.final_alpha_cumprod = 1.0 if config.set_alpha_to_one else float(self.alphas_cumprod[0])
        self.init_noise_sigma = 1.0
        self.beta_start = config.beta_start
        self.beta_end = config.beta_end

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        n_train = self.config.num_train_timesteps
        if self.config.timestep_spacing == "leading":
            step_ratio = n_train // num_inference_steps
            ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
            ts += self.config.steps_offset
        elif self.config.timestep_spacing == "trailing":
            step_ratio = n_train / num_inference_steps
            ts = np.round(np.arange(n_train, 0, -step_ratio)).astype(np.int64) - 1
        else:
            ts = np.linspace(0, n_train - 1, num_inference_steps).round()[::-1].astype(np.int64)
        return ts

    def scale_model_input(self, sample, t):
        return sample

    def _alpha_prod_prev(self, t, num_inference_steps: int):
        prev_t = t - self.config.num_train_timesteps // num_inference_steps
        return jnp.where(prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)],
                         self.final_alpha_cumprod)

    def pred_original_sample(self, model_output, t, sample):
        alpha_prod_t = self.alphas_cumprod[t]
        beta_prod_t = 1.0 - alpha_prod_t
        if self.config.prediction_type == "epsilon":
            x0 = (sample - beta_prod_t ** 0.5 * model_output) / alpha_prod_t ** 0.5
            eps = model_output
        elif self.config.prediction_type == "v_prediction":
            x0 = alpha_prod_t ** 0.5 * sample - beta_prod_t ** 0.5 * model_output
            eps = alpha_prod_t ** 0.5 * model_output + beta_prod_t ** 0.5 * sample
        else:  # sample
            x0 = model_output
            eps = (sample - alpha_prod_t ** 0.5 * x0) / beta_prod_t ** 0.5
        if self.config.clip_sample:
            x0 = jnp.clip(x0, -self.config.clip_sample_range, self.config.clip_sample_range)
        return x0, eps

    def step(self, model_output, t, sample, num_inference_steps: int,
             rng=None, noise=None):
        """Returns (prev_sample, pred_original_sample)."""
        eta = self.config.eta
        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_t_prev = self._alpha_prod_prev(t, num_inference_steps)
        beta_prod_t = 1.0 - alpha_prod_t

        x0, eps = self.pred_original_sample(model_output, t, sample)
        if self.config.clip_sample and self.config.use_clipped_model_output:
            eps = (sample - alpha_prod_t ** 0.5 * x0) / beta_prod_t ** 0.5

        variance = (1.0 - alpha_prod_t_prev) / (1.0 - alpha_prod_t) * \
                   (1.0 - alpha_prod_t / alpha_prod_t_prev)
        std_dev_t = eta * variance ** 0.5

        pred_sample_direction = (1.0 - alpha_prod_t_prev - std_dev_t ** 2) ** 0.5 * eps
        prev_sample = alpha_prod_t_prev ** 0.5 * x0 + pred_sample_direction
        if eta > 0:
            if noise is None:
                noise = jax.random.normal(rng, sample.shape, dtype=jnp.float32)
            prev_sample = prev_sample + std_dev_t * noise
        return prev_sample, x0

    def add_noise(self, original_samples, noise, t):
        sqrt_alpha_prod = self.alphas_cumprod[t] ** 0.5
        sqrt_one_minus = (1.0 - self.alphas_cumprod[t]) ** 0.5
        return sqrt_alpha_prod * original_samples + sqrt_one_minus * noise
