"""FlowMatchEuler scheduler for SD3 (diffusers-semantics, pure functions).

The SD3 safe-denoiser path (reference models/sdv3/safe_denoiser_pipeline.py:
1103,1135-1165) consumes ``sigmas = timesteps / num_train_timesteps`` and
performs its own renoising inside the repellency window; outside the window
it takes the plain Euler step ``x += (sigma_next - sigma) * v``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class FlowMatchEulerConfig:
    num_train_timesteps: int = 1000
    shift: float = 3.0


class FlowMatchEulerScheduler:
    def __init__(self, config: FlowMatchEulerConfig = FlowMatchEulerConfig()):
        self.config = config
        n = config.num_train_timesteps
        ts = np.linspace(1, n, n, dtype=np.float64)[::-1]
        sigmas = ts / n
        sigmas = self._shift(sigmas)
        self.sigma_min = float(sigmas[-1])
        self.sigma_max = float(sigmas[0])

    def _shift(self, sigmas):
        s = self.config.shift
        return s * sigmas / (1 + (s - 1) * sigmas)

    def timesteps_and_sigmas(self, num_inference_steps: int):
        """Returns (timesteps [n], sigmas [n+1] with terminal 0) as fp32.

        Matches diffusers FlowMatchEulerDiscreteScheduler.set_timesteps: the
        linspace endpoints are the *already shifted* sigma_{max,min} mapped
        back through t = sigma * num_train, then shifted again.
        """
        n_train = self.config.num_train_timesteps
        ts = np.linspace(self.sigma_max * n_train, self.sigma_min * n_train,
                         num_inference_steps, dtype=np.float64)
        sigmas = self._shift(ts / n_train)
        timesteps = (sigmas * n_train).astype(np.float32)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return timesteps, sigmas

    @staticmethod
    def step(model_output, sigma, sigma_next, sample):
        """Euler step in fp32 (diffusers upcasts); returns prev_sample."""
        return sample + (sigma_next - sigma) * model_output

    @staticmethod
    def scale_noise(sample, sigma, noise):
        """Forward process: x_sigma = (1-sigma)*x0 + sigma*noise."""
        return (1.0 - sigma) * sample + sigma * noise
