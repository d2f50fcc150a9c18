"""Whole-loop distribution parity harness (round-1 VERDICT item 4).

Re-types the reference's per-step sampling loop in torch — CFG/SLD combine,
window gating, Tweedie x̂₀, kernel_fast conditioning, renoise-and-replace,
then the scheduler step (reference
modified_safree_diffusion_pipeline_threshold_time.py:514-576 and
modified_sld_pipeline_threshold_time.py:466-526) — and runs it against the
single-`lax.scan` sampler on IDENTICAL fabricated tiny-UNet weights and
identical noise streams. This is the missing rung between the per-block
goldens (test_torch_golden.py) and unobtainable real weights: it pins the
loop *structure* (operation order, gating semantics, renoise target).

Noise parity: both sides draw from the jax PRNG stream the scan uses
(fold_in(rng, i) -> fold_in(., salt)); the torch side materializes the same
arrays, so any mismatch is loop logic, not RNG.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from safe_denoiser_tpu.models import weights as W  # noqa: E402
from safe_denoiser_tpu.models.unet import UNetConfig, UNet2DCondition  # noqa: E402
from safe_denoiser_tpu.pipeline.sampler import (  # noqa: E402
    GuidanceConfig, RepellencyWindow, sample_sd)
from safe_denoiser_tpu.repellency import RepellencyConfig  # noqa: E402
from safe_denoiser_tpu.schedulers import (  # noqa: E402
    DDIMConfig, DDIMScheduler, DDPMScheduler)
from tests.golden.diffusers_torch_ref import ddim_step, ddpm_step, tables  # noqa: E402
from tests.test_repellency import _torch_kernel_fast  # noqa: E402
from tests.test_torch_golden import TUNet, _sd  # noqa: E402

B, H_LAT, CTX_D, STEPS = 2, 8, 16, 5
SIGMA, SCALE, EPSILON = 30.0, 0.4, 1e-8
RNG = jax.random.PRNGKey(1234)


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(11)
    tm = TUNet(chans=(16, 32), layers=1, heads=2, ctx_dim=CTX_D,
               groups=8).eval()
    cfg = UNetConfig(sample_size=H_LAT, block_out_channels=(16, 32),
                     layers_per_block=1, cross_attention_dim=CTX_D,
                     num_attention_heads=2, norm_num_groups=8)
    params = W.convert_unet(_sd(tm), cfg)
    model = UNet2DCondition(cfg)

    rs = np.random.RandomState(5)
    lat0 = rs.randn(B, 4, H_LAT, H_LAT).astype(np.float32)
    ctx3 = rs.randn(3, B, 5, CTX_D).astype(np.float32)  # [uncond, cond, extra]
    refs = rs.randn(8, 4, H_LAT, H_LAT).astype(np.float32)
    refs /= np.linalg.norm(refs, axis=1, keepdims=True)
    return tm, model, params, lat0, ctx3, refs


def _jax_noise(i: int, salt: int) -> np.ndarray:
    """The exact noise the scan draws at step i (sampler.py::_noise,
    single-key path), as NCHW numpy."""
    k = jax.random.fold_in(jax.random.fold_in(RNG, i), salt)
    n = jax.random.normal(k, (B, H_LAT, H_LAT, 4), dtype=jnp.float32)
    return np.asarray(n).transpose(0, 3, 1, 2)


def _torch_reference_loop(tm, lat0, ctx3, refs, *, mode, scheduler_kind,
                          repellency, window, guidance_scale=7.5,
                          sld=GuidanceConfig()):
    """The reference's python per-step loop, re-typed in torch."""
    ac = tables()
    n_br = 2 if mode == "cfg" else 3
    step_ratio = 1000 // STEPS
    timesteps = (np.arange(STEPS) * step_ratio)[::-1] + 1
    ctx = torch.from_numpy(np.concatenate(
        [ctx3[j] for j in range(n_br)], axis=0))
    latents = torch.from_numpy(lat0).clone()
    refs_flat = refs.reshape(refs.shape[0], -1)
    momentum = torch.zeros_like(latents)

    for i, t in enumerate(timesteps):
        t = int(t)
        lat_in = torch.cat([latents] * n_br, dim=0)
        with torch.no_grad():
            out = tm(lat_in, torch.full((n_br * B,), float(t)), ctx)
        chunks = out.chunk(n_br, dim=0)
        uncond, text = chunks[0], chunks[1]
        if mode == "cfg":
            eps = uncond + guidance_scale * (text - uncond)
        else:
            # SLD Eqs. 3-8 (reference modified_sld_pipeline*.py:466-503)
            safety = chunks[2]
            noise_guidance = text - uncond
            scale = torch.clamp(torch.abs(text - safety)
                                * sld.sld_guidance_scale, max=1.0)
            safety_scale = torch.where(text - safety >= sld.sld_threshold,
                                       torch.zeros_like(scale), scale)
            guidance_safety = (safety - uncond) * safety_scale
            guidance_safety = guidance_safety + \
                sld.sld_momentum_scale * momentum
            momentum = sld.sld_mom_beta * momentum + \
                (1 - sld.sld_mom_beta) * guidance_safety
            if i >= sld.sld_warmup_steps:
                noise_guidance = noise_guidance - guidance_safety
            eps = uncond + guidance_scale * noise_guidance

        if repellency is not None and window[1] <= t <= window[0]:
            # Tweedie x̂₀ via the scheduler, conditioning, renoise (reference
            # :552-569): the renoised latents feed the SAME step below
            apt = float(ac[t])
            x0 = (latents - (1 - apt) ** 0.5 * eps) / apt ** 0.5
            score, beta = _torch_kernel_fast(
                x0.reshape(B, -1).numpy(), refs_flat, SIGMA, EPSILON)
            x0p = x0 - SCALE * torch.from_numpy(score).reshape(x0.shape)
            is_neg = torch.from_numpy(
                beta > repellency.beta_threshold
                - repellency.beta_threshold_margin)
            noise_rep = torch.from_numpy(_jax_noise(i, 1))
            renoised = apt ** 0.5 * x0p + (1 - apt) ** 0.5 * noise_rep
            latents = torch.where(is_neg[:, None, None, None], renoised,
                                  latents)

        if scheduler_kind == "ddpm":
            prev, _, std = ddpm_step(ac, t, STEPS, latents, eps)
            if t > 0:
                prev = prev + std * torch.from_numpy(_jax_noise(i, 2))
        else:
            prev, _, _ = ddim_step(ac, t, STEPS, latents, eps,
                                   set_alpha_to_one=False)
        latents = prev
    return latents.numpy()


ERASE_MATRIX = [
    # (erase_id analogue, guidance mode, repellency?, window)
    ("std", "cfg", False, None),
    ("std_rep", "cfg", True, (1000.0, 300.0)),
    ("safe_denoiser", "cfg", True, (1000.0, 780.0)),
    ("sld", "sld", False, None),
    ("sld_rep_time", "sld", True, (1000.0, 300.0)),
]


@pytest.mark.parametrize("scheduler_kind", ["ddpm", "ddim"])
@pytest.mark.parametrize("erase", ERASE_MATRIX, ids=lambda e: e[0])
def test_scan_matches_torch_reference_loop(setup, erase, scheduler_kind):
    tm, model, params, lat0, ctx3, refs = setup
    _, mode, use_rep, window = erase

    rep_cfg = RepellencyConfig(method="kernel_fast", sigma=SIGMA, scale=SCALE,
                               epsilon=EPSILON, beta_threshold=1e-12,
                               use_beta_gate=True) if use_rep else None
    win = RepellencyWindow(*window) if window else RepellencyWindow()
    # short warmup so SLD's post-warmup branch is exercised within 5 steps
    guidance = GuidanceConfig(mode=mode, sld_warmup_steps=2)

    want = _torch_reference_loop(
        tm, lat0, ctx3, refs, mode=mode, scheduler_kind=scheduler_kind,
        repellency=rep_cfg, window=window or (0.0, -1.0),
        sld=guidance)

    sched = DDPMScheduler() if scheduler_kind == "ddpm" \
        else DDIMScheduler(DDIMConfig())
    n_br = guidance.branches
    text = jnp.asarray(ctx3[:n_br])
    lat_nhwc = jnp.asarray(lat0.transpose(0, 2, 3, 1))

    def unet_apply(lat, t, ctx, freeu=None):
        return model.apply(params, lat, t, ctx, freeu=freeu)

    got, applied = sample_sd(
        unet_apply, sched, text, lat_nhwc, RNG, STEPS, guidance=guidance,
        repellency=rep_cfg, refs_nchw=jnp.asarray(refs) if use_rep else None,
        window=win)
    got = np.asarray(got).transpose(0, 3, 1, 2)

    if use_rep:
        assert np.asarray(applied).any(), "repellency never fired — window bug?"
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
