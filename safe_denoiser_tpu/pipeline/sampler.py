"""The pure-functional sampling core: one jitted ``lax.scan`` over timesteps.

Replaces the reference's 16 near-duplicate pipeline classes
(models/vanilla/*, models/textuals/*, models/textuals_visual/*,
models/sdv3/*) with a single scan whose safety machinery — CFG, SAFREE
re-attention windows, SLD momentum guidance, FreeU/SafeGuard filters, and the
repellency hook — composes through static config:

  * guidance mode 'cfg'  = plain/SAFREE pipelines (2-way batch,
    modified_safree_diffusion_pipeline*.py:542-548)
  * guidance mode 'lra'  = SAFREE latent re-attention (3-way batch, third
    branch drives the SafeGuard filters; :518-545)
  * guidance mode 'sld'  = Safe Latent Diffusion momentum guidance Eqs. 3-8
    (3-way batch; modified_sld_pipeline_threshold_time.py:466-503)
  * repellency window    = timestep gating (``*_time``/``*_threshold_time``
    files, :552) or step-index gating (``*_threshold`` files, :548) — the
    file matrix becomes a RepellencyWindow config
  * SAFREE adaptive window = per-step boolean table computed host-side from
    f_beta (:472-486), selecting projected vs. original embeddings per step

Per-sample gating (beta gate, SAFREE window) is branchless ``jnp.where``
masks so the scan is trace-static; the per-step *scalar* repellency-window
predicate is a real ``lax.cond`` so the bank-streaming kernel is skipped
on-device outside the window. Per-step PRNG keys are folded in, never
threaded through host code.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..repellency.methods import RepellencyConfig, apply_repellency


def _window_cond_enabled() -> bool:
    """Read at trace time so one process can A/B both forms."""
    return os.environ.get("SDT_WINDOW_COND", "1") == "1"


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    guidance_scale: float = 7.5
    mode: str = "cfg"               # 'cfg' | 'lra' | 'sld'
    # SLD hyperparameters (reference modified_sld_pipeline*.py defaults)
    sld_guidance_scale: float = 2000.0
    sld_threshold: float = 0.025
    sld_momentum_scale: float = 0.5
    sld_mom_beta: float = 0.7
    sld_warmup_steps: int = 7

    @property
    def branches(self) -> int:
        return 2 if self.mode == "cfg" else 3


@dataclasses.dataclass(frozen=True)
class RepellencyWindow:
    """Gating window for the repellency hook.

    ``by_timestep=True`` reproduces the ``*_time`` / ``*_threshold_time``
    variants (apply when t_end <= t <= t_start; reference
    modified_safree_diffusion_pipeline_threshold_time.py:429-431,552);
    ``by_timestep=False`` the ``*_threshold`` step-index variants
    (step_start <= i <= step_end; modified_*_threshold.py:430-431,548).
    """

    t_start: float = 1000.0
    t_end: float = 780.0
    step_start: int = 0
    step_end: int = 10 ** 9
    by_timestep: bool = True

    def mask(self, i, t):
        if self.by_timestep:
            return jnp.logical_and(t <= self.t_start, t >= self.t_end)
        return jnp.logical_and(i >= self.step_start, i <= self.step_end)


def _combine_guidance(noise_pred: jax.Array, i, guidance: GuidanceConfig,
                      momentum: jax.Array, guidance_scale=None):
    """[branches, B, ...] model outputs → (guided eps [B, ...], momentum').

    ``guidance_scale`` may be a traced scalar (per-CSV-row guidance,
    reference run_nudity.py:394-399) — falls back to the static config value.
    """
    uncond, text = noise_pred[0], noise_pred[1]
    g = guidance.guidance_scale if guidance_scale is None else guidance_scale
    if hasattr(g, "ndim") and g.ndim == 1:       # per-sample guidance [B]
        g = g.reshape(-1, *([1] * (uncond.ndim - 1)))
    if guidance.mode in ("cfg", "lra"):
        # lra's 3rd branch only feeds the SafeGuard filters; CFG combine is
        # identical (reference :543-548)
        return uncond + g * (text - uncond), momentum
    # SLD (reference modified_sld_pipeline_threshold_time.py:466-503)
    safety = noise_pred[2]
    noise_guidance = text - uncond
    scale = jnp.clip(jnp.abs(text - safety) * guidance.sld_guidance_scale,
                     None, 1.0)                                    # Eq. 6
    safety_scale = jnp.where(text - safety >= guidance.sld_threshold,
                             0.0, scale)                           # Eq. 6
    guidance_safety = (safety - uncond) * safety_scale             # Eq. 4
    guidance_safety = guidance_safety + \
        guidance.sld_momentum_scale * momentum                     # Eq. 7
    momentum = guidance.sld_mom_beta * momentum + \
        (1.0 - guidance.sld_mom_beta) * guidance_safety            # Eq. 8
    noise_guidance = jnp.where(i >= guidance.sld_warmup_steps,
                               noise_guidance - guidance_safety,
                               noise_guidance)                     # Eq. 3
    return uncond + g * noise_guidance, momentum


def _repellency_hook(scheduler, noise_pred, t, latents, refs_nchw,
                     rep_cfg: RepellencyConfig, in_window, noise,
                     rep_bank=None):
    """Tweedie → repellency → renoise → masked replace (reference :552-569)."""
    x0 = scheduler.pred_original_sample(noise_pred, t, latents)
    if isinstance(x0, tuple):
        x0 = x0[0]
    x0_nchw = jnp.transpose(x0, (0, 3, 1, 2))
    x0_rep, is_neg = apply_repellency(x0_nchw, refs_nchw, rep_cfg,
                                      bank=rep_bank)
    x0_rep = jnp.transpose(x0_rep, (0, 2, 3, 1))
    renoised = scheduler.add_noise(x0_rep, noise, t)
    use = jnp.logical_and(in_window, is_neg)[:, None, None, None]
    return jnp.where(use, renoised, latents), jnp.logical_and(in_window, is_neg)


def sample_sd(unet_apply: Callable[..., jax.Array],
              scheduler: Any,
              text_embeds: jax.Array,
              latents: jax.Array,
              rng: jax.Array,
              num_inference_steps: int,
              guidance: GuidanceConfig = GuidanceConfig(),
              repellency: Optional[RepellencyConfig] = None,
              refs_nchw: Optional[jax.Array] = None,
              window: RepellencyWindow = RepellencyWindow(),
              text_embeds_alt: Optional[jax.Array] = None,
              use_alt_per_step: Optional[jax.Array] = None,
              freeu=None,
              guidance_scale=None,
              rep_bank=None):
    """Run the full reverse-diffusion scan for SD-v1.x.

    Args:
      unet_apply: ``(latents [B', H, W, C], t, context [B', S, D], freeu) -> eps``
        — a closure over model params (already jittable).
      text_embeds: [branches, B, S, D] stacked per-branch contexts. Branch
        order: [uncond, cond, extra] where extra = original cond ('lra') or
        safety concept ('sld').
      latents: [B, H, W, C] initial noise (already scaled by init_noise_sigma).
      rng: a single PRNG key, or a [B, 2] batch of per-sample keys — with
        per-sample keys every row's noise stream depends only on its own key,
        so batched sweeps reproduce row-wise runs exactly.
      text_embeds_alt / use_alt_per_step: optional per-step swap of the
        context (SAFREE adaptive window; reference :525-532): at step i the
        context is ``text_embeds_alt`` where ``use_alt_per_step[i]``.
      freeu: optional FreeUConfig forwarded to the UNet (SafeGuard filters).
      rep_bank: optional ``parallel.ShardedBank`` — runs the repellency
        kernels over an M-sharded bank (refs_nchw pre-placed via
        ``shard_bank``) with psum'd partials instead of a replicated bank.

    Returns ``(final latents [B, H, W, C], rep_applied [steps, B] bool)``.
    """
    timesteps = jnp.asarray(scheduler.timesteps(num_inference_steps))
    n_branches, b = text_embeds.shape[0], text_embeds.shape[1]
    assert n_branches == guidance.branches

    if use_alt_per_step is None:
        use_alt_per_step = jnp.zeros((num_inference_steps,), dtype=bool)
    if use_alt_per_step.ndim == 1:               # [S] -> [S, B] per-sample
        use_alt_per_step = jnp.broadcast_to(use_alt_per_step[:, None],
                                            (num_inference_steps, b))
    if text_embeds_alt is None:
        text_embeds_alt = text_embeds

    per_sample_rng = hasattr(rng, "ndim") and rng.ndim == 2

    def _noise(step_rng, salt, shape):
        if per_sample_rng:
            return jax.vmap(lambda k: jax.random.normal(
                jax.random.fold_in(k, salt), shape[1:],
                dtype=jnp.float32))(step_rng)
        return jax.random.normal(jax.random.fold_in(step_rng, salt), shape,
                                 dtype=jnp.float32)

    def body(carry, scan_in):
        latents, momentum = carry
        i, t, use_alt = scan_in
        if per_sample_rng:
            step_rng = jax.vmap(lambda k: jax.random.fold_in(k, i))(rng)
        else:
            step_rng = jax.random.fold_in(rng, i)

        ctx = jnp.where(use_alt[None, :, None, None], text_embeds_alt,
                        text_embeds)
        ctx = ctx.reshape(n_branches * b, *ctx.shape[2:])
        latent_in = jnp.concatenate([latents] * n_branches, axis=0)
        latent_in = scheduler.scale_model_input(latent_in, t)

        eps = unet_apply(latent_in, t, ctx, freeu)
        eps = eps.reshape(n_branches, b, *eps.shape[1:])
        eps, momentum = _combine_guidance(eps, i, guidance, momentum,
                                          guidance_scale)

        if repellency is not None:
            in_window = window.mask(i, t)
            # The window predicate is a per-step scalar, so the whole hook
            # (bank-streaming kernel + Tweedie + renoise) sits under a real
            # lax.cond: outside the window the branch is skipped on-device
            # instead of computed-and-discarded through a jnp.where mask.
            # Same math as the masked form — the false branch returns
            # latents unchanged, exactly what the all-false mask produced
            # (agreement is to f32 fusion-reassociation tolerance).
            # SDT_WINDOW_COND=0 restores the masked form (A/B control).
            if _window_cond_enabled():
                latents, applied = jax.lax.cond(
                    in_window,
                    lambda lat: _repellency_hook(
                        scheduler, eps, t, lat, refs_nchw, repellency,
                        jnp.bool_(True), _noise(step_rng, 1, lat.shape),
                        rep_bank),
                    lambda lat: (lat, jnp.zeros((b,), dtype=bool)),
                    latents)
            else:
                latents, applied = _repellency_hook(
                    scheduler, eps, t, latents, refs_nchw, repellency,
                    in_window, _noise(step_rng, 1, latents.shape), rep_bank)
        else:
            applied = jnp.zeros((b,), dtype=bool)

        latents, _ = scheduler.step(eps, t, latents, num_inference_steps,
                                    noise=_noise(step_rng, 2, latents.shape))
        return (latents, momentum), applied

    momentum0 = jnp.zeros_like(latents)
    steps = jnp.arange(num_inference_steps)
    (latents, _), applied = jax.lax.scan(
        body, (latents, momentum0), (steps, timesteps, use_alt_per_step))
    return latents, applied


def sample_sd3(transformer_apply: Callable[..., jax.Array],
               scheduler: Any,
               text_embeds: jax.Array,
               pooled_embeds: jax.Array,
               latents: jax.Array,
               rng: jax.Array,
               num_inference_steps: int,
               guidance_scale: float = 7.0,
               repellency: Optional[RepellencyConfig] = None,
               refs_nchw: Optional[jax.Array] = None,
               window: RepellencyWindow = RepellencyWindow(),
               rep_bank=None):
    """SD3 flow-matching scan with the safe-denoiser renoising path.

    Implements the reference's flow repellency (models/sdv3/
    safe_denoiser_pipeline.py:1103,1135-1165): inside the window,
      x̂₀ = x − σ·v ; x̂₁ = x + (1−σ)·v ; repellency on x̂₀;
      noise = √σ₊·x̂₁ + √(1−σ₊)·ε ; x' = x̂₀' + σ₊·(noise − x̂₀')
    (σ₊ = σ − δ with δ = σ − σ_next); outside, the plain Euler step.

    text_embeds: [2, B, S, D] (uncond, cond); pooled: [2, B, P].

    ``rng`` may be one key (the reference convention) or [B] raw keys for
    per-sample noise streams; ``guidance_scale`` a scalar or [B] per-sample
    values — both batched forms serve the DynamicBatcher (generate_batch),
    where each padded row must reproduce its own single-row run. The
    scalar/single-key paths are byte-identical to before.
    """
    timesteps_np, sigmas_np = scheduler.timesteps_and_sigmas(num_inference_steps)
    timesteps = jnp.asarray(timesteps_np)
    sigmas = jnp.asarray(sigmas_np)
    b = latents.shape[0]
    ctx = text_embeds.reshape(2 * b, *text_embeds.shape[2:])
    pooled = pooled_embeds.reshape(2 * b, *pooled_embeds.shape[2:])
    per_sample_rng = hasattr(rng, "ndim") and rng.ndim == 2
    gs = jnp.asarray(guidance_scale)
    if gs.ndim == 1:                         # [B] -> broadcast over NHWC
        gs = gs[:, None, None, None]

    def body(carry, scan_in):
        latents = carry
        i, t, sigma, sigma_next = scan_in
        if per_sample_rng:
            step_rng = jax.vmap(lambda k: jax.random.fold_in(k, i))(rng)
        else:
            step_rng = jax.random.fold_in(rng, i)

        latent_in = jnp.concatenate([latents] * 2, axis=0)
        v = transformer_apply(latent_in, jnp.broadcast_to(t, (2 * b,)), ctx,
                              pooled)
        v_uncond, v_text = v[:b], v[b:]
        v = v_uncond + gs * (v_text - v_uncond)

        euler = latents + (sigma_next - sigma) * v

        if repellency is not None:
            in_window = window.mask(i, t)

            # Scalar window predicate → lax.cond skips the whole repellency
            # branch on-device outside the window (same rationale as the
            # SD-v1 hook above; bit-identical to the jnp.where-masked form).
            def _renoise(lat, gate=None):
                x0 = lat - sigma * v
                x1 = lat + (1.0 - sigma) * v
                x0_nchw = jnp.transpose(x0, (0, 3, 1, 2))
                x0_rep, is_neg = apply_repellency(x0_nchw, refs_nchw,
                                                  repellency, bank=rep_bank)
                x0_rep = jnp.transpose(x0_rep, (0, 2, 3, 1))
                if per_sample_rng:
                    eps = jax.vmap(lambda k: jax.random.normal(
                        jax.random.fold_in(k, 1), lat.shape[1:],
                        dtype=jnp.float32))(step_rng)
                else:
                    eps = jax.random.normal(jax.random.fold_in(step_rng, 1),
                                            lat.shape, dtype=jnp.float32)
                noise = (jnp.sqrt(sigma_next) * x1
                         + jnp.sqrt(1.0 - sigma_next) * eps)
                renoised = x0_rep + sigma_next * (noise - x0_rep)
                applied = is_neg if gate is None \
                    else jnp.logical_and(gate, is_neg)
                use = applied[:, None, None, None]
                return jnp.where(use, renoised, euler), applied

            if _window_cond_enabled():
                latents, applied = jax.lax.cond(
                    in_window, _renoise,
                    lambda lat: (euler, jnp.zeros((b,), dtype=bool)),
                    latents)
            else:
                latents, applied = _renoise(latents, gate=in_window)
        else:
            latents = euler
            applied = jnp.zeros((b,), dtype=bool)
        return latents, applied

    steps = jnp.arange(num_inference_steps)
    latents, applied = jax.lax.scan(
        body, latents, (steps, timesteps, sigmas[:-1], sigmas[1:]))
    return latents, applied
