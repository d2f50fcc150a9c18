"""Flow-matching training steps for the SD3 family (MMDiT).

Extends the trainer to the reference's second model family: rectified-flow
velocity regression with SD3's logit-normal timestep density (Esser et al.
2024). Conventions match this repo's sampler exactly
(pipeline/sampler.py::sample_sd3): ``x_σ = (1−σ)·x₀ + σ·ε``, the model
predicts the velocity ``v = ε − x₀`` (so ``x̂₀ = x − σ·v``), and the MMDiT
timestep conditioning input is ``t = σ·num_train_timesteps``.

Same TPU-first shape as training/esd.py: one fused (loss+grad+adamw) jitted
program, params donated, data-sharded batch + TP-sharded params under the
(data, model) mesh with GSPMD-inserted gradient psums.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from .esd import ESDConfig, make_optimizer


def sample_sigmas_logit_normal(rng: jax.Array, batch: int, mean: float = 0.0,
                               std: float = 1.0) -> jax.Array:
    """SD3's logit-normal σ density: σ = sigmoid(𝒩(mean, std²)) — weights
    training toward mid-trajectory noise levels."""
    return jax.nn.sigmoid(mean + std * jax.random.normal(rng, (batch,)))


def flow_matching_loss(apply_fn: Callable, params: Any, x0: jax.Array,
                       ctx: jax.Array, pooled: jax.Array, sigma: jax.Array,
                       rng: jax.Array,
                       num_train_timesteps: int = 1000) -> jax.Array:
    """Rectified-flow MSE at per-sample noise levels σ ∈ (0, 1).

    x0: [B, H, W, C] clean latents; ctx: [B, S, D] joint text states;
    pooled: [B, P]; sigma: [B]. Loss in fp32 regardless of model dtype.
    """
    noise = jax.random.normal(rng, x0.shape, dtype=x0.dtype)
    sig = jnp.reshape(sigma, (-1,) + (1,) * (x0.ndim - 1)).astype(x0.dtype)
    x_sig = (1.0 - sig) * x0 + sig * noise
    t = (sigma * num_train_timesteps).astype(jnp.float32)
    pred = apply_fn(params, x_sig, t, ctx, pooled)
    target = noise.astype(jnp.float32) - x0.astype(jnp.float32)
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))


def make_flow_train_step(apply_fn: Callable, cfg: ESDConfig = ESDConfig(),
                         donate: bool = True,
                         num_train_timesteps: int = 1000,
                         param_mask: Any = None) -> Callable:
    """One fused flow-matching update.

    ``step(params, opt_state, x0, ctx, pooled, sigma, rng)
    -> (params, opt_state, loss)``; params/opt_state donated. Init the opt
    state with ``make_optimizer(cfg, param_mask).init(params)``.
    """
    tx = make_optimizer(cfg, param_mask)

    def step(params, opt_state, x0, ctx, pooled, sigma, rng):
        loss, grads = jax.value_and_grad(
            lambda p: flow_matching_loss(apply_fn, p, x0, ctx, pooled,
                                         sigma, rng, num_train_timesteps)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())
