"""Sampler-core and SAFREE/SLD math tests (golden vs. inline torch reference)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_denoiser_tpu.pipeline import (
    GuidanceConfig,
    RepellencyWindow,
    projection_matrix,
    safree_projection,
    sample_sd,
    sample_sd3,
)
from safe_denoiser_tpu.pipeline.sampler import _combine_guidance
from safe_denoiser_tpu.repellency import RepellencyConfig
from safe_denoiser_tpu.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    FlowMatchEulerScheduler,
)

torch = pytest.importorskip("torch")


def test_projection_matrix_vs_torch():
    rng = np.random.RandomState(0)
    E = rng.randn(16, 3).astype(np.float32)
    want = (torch.tensor(E) @ torch.pinverse(torch.tensor(E).T @ torch.tensor(E))
            @ torch.tensor(E).T).numpy()
    got = np.asarray(projection_matrix(jnp.asarray(E)))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # idempotent projector
    np.testing.assert_allclose(got @ got, got, atol=1e-4)


def test_safree_projection_vs_reference_math():
    """Inline torch port of reference safree_projection (:57-99)."""
    rng = np.random.RandomState(1)
    dim, n_t, L = 16, 5, 12
    ie = rng.randn(2, L, dim).astype(np.float32)
    p_emb = rng.randn(n_t, dim).astype(np.float32)
    ms = np.asarray(projection_matrix(jnp.asarray(rng.randn(dim, n_t).astype(np.float32))))
    cs = np.asarray(projection_matrix(jnp.asarray(rng.randn(dim, 3).astype(np.float32))))

    # torch reference
    iet = torch.tensor(ie)
    I_m_cs = torch.eye(dim) - torch.tensor(cs)
    dist_p_emb = torch.norm(I_m_cs @ torch.tensor(p_emb).T, dim=0)
    means = [torch.mean(torch.cat((dist_p_emb[:i], dist_p_emb[i + 1:])))
             for i in range(n_t)]
    mean_dist = torch.tensor(means)
    rm_vector = (dist_p_emb < mean_dist).float()
    ones = torch.ones(L)
    ones[1:n_t + 1] = rm_vector
    ones = ones.unsqueeze(1)
    uncond_e, text_e = iet[0], iet[1]
    new_text_e = (I_m_cs @ torch.tensor(ms) @ text_e.T).T
    merged = torch.where(ones.bool(), text_e, new_text_e)
    want = torch.stack([uncond_e, merged]).numpy()

    got, n_removed, keep = safree_projection(
        jnp.asarray(ie), jnp.asarray(p_emb), jnp.asarray(ms), jnp.asarray(cs),
        alpha=0.0, max_length=L)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    assert int(n_removed) == int(n_t - rm_vector.sum())


def test_sld_guidance_vs_reference_math():
    rng = np.random.RandomState(2)
    shape = (1, 4, 4, 2)
    eps = rng.randn(3, *shape).astype(np.float32)
    momentum = rng.randn(*shape).astype(np.float32)
    g = GuidanceConfig(guidance_scale=7.5, mode="sld", sld_guidance_scale=100.0,
                       sld_threshold=0.02, sld_momentum_scale=0.4,
                       sld_mom_beta=0.7, sld_warmup_steps=3)

    # torch reference (modified_sld_pipeline_threshold_time.py:466-503)
    u, t_, s = torch.tensor(eps[0]), torch.tensor(eps[1]), torch.tensor(eps[2])
    mom = torch.tensor(momentum)
    ng = t_ - u
    scale = torch.clamp(torch.abs(t_ - s) * 100.0, max=1.0)
    scs = torch.where(t_ - s >= 0.02, torch.zeros_like(scale), scale)
    ngs = (s - u) * scs
    ngs = ngs + 0.4 * mom
    mom2 = 0.7 * mom + 0.3 * ngs
    for i, after_warmup in [(0, False), (5, True)]:
        want_ng = ng - ngs if after_warmup else ng
        want = (u + 7.5 * want_ng).numpy()
        got, got_mom = _combine_guidance(jnp.asarray(eps), i, g,
                                         jnp.asarray(momentum))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_mom), mom2.numpy(), rtol=1e-4,
                                   atol=1e-5)


def _dummy_unet(latents, t, ctx, freeu=None):
    # pseudo noise-pred correlated with latents + context mean
    return 0.1 * latents + 0.01 * jnp.mean(ctx) * jnp.ones_like(latents)


def test_sample_sd_runs_and_is_deterministic():
    sched = DDIMScheduler()
    text = jnp.ones((2, 1, 7, 8))
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    out1, applied = sample_sd(_dummy_unet, sched, text, lat,
                              jax.random.PRNGKey(1), 10)
    out2, _ = sample_sd(_dummy_unet, sched, text, lat, jax.random.PRNGKey(1), 10)
    assert out1.shape == lat.shape
    assert applied.shape == (10, 1)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.asarray(applied).any()


def test_sample_sd_repellency_window_gating():
    sched = DDPMScheduler()
    text = jnp.ones((2, 1, 7, 8))
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    refs = jax.random.normal(jax.random.PRNGKey(2), (6, 4, 8, 8))
    rep = RepellencyConfig(method="kernel_fast", sigma=100.0, scale=0.33,
                           beta_threshold=-1e9, use_beta_gate=True)
    win = RepellencyWindow(t_start=1000.0, t_end=780.0, by_timestep=True)
    out, applied = sample_sd(_dummy_unet, sched, text, lat,
                             jax.random.PRNGKey(1), 10,
                             repellency=rep, refs_nchw=refs, window=win)
    applied = np.asarray(applied)[:, 0]
    ts = sched.timesteps(10)
    want = (ts <= 1000) & (ts >= 780)
    # σ huge + threshold −inf ⇒ β gate always passes ⇒ applied == window
    np.testing.assert_array_equal(applied, want)
    assert out.shape == lat.shape


def test_sample_sd_step_window_and_lra():
    sched = DDIMScheduler()
    text = jnp.ones((3, 1, 7, 8))
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    refs = jax.random.normal(jax.random.PRNGKey(2), (6, 4, 8, 8))
    rep = RepellencyConfig(method="kernel_fast", sigma=100.0, scale=0.33,
                           beta_threshold=-1e9, use_beta_gate=True)
    win = RepellencyWindow(step_start=0, step_end=3, by_timestep=False)
    _, applied = sample_sd(_dummy_unet, sched, text, lat, jax.random.PRNGKey(1),
                           8, guidance=GuidanceConfig(mode="lra"),
                           repellency=rep, refs_nchw=refs, window=win)
    applied = np.asarray(applied)[:, 0]
    np.testing.assert_array_equal(applied, np.arange(8) <= 3)


def test_sample_sd3_flow_runs():
    sched = FlowMatchEulerScheduler()

    def dummy_tf(latents, t, ctx, pooled):
        return 0.05 * latents + 0.001 * jnp.mean(pooled) * jnp.ones_like(latents)

    text = jnp.ones((2, 1, 6, 8))
    pooled = jnp.ones((2, 1, 5))
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16))
    refs = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 8, 8))
    rep = RepellencyConfig(method="kernel_fast", sigma=2.75, scale=0.03,
                           normalize_x=True, use_beta_gate=False)
    out, applied = sample_sd3(dummy_tf, sched, text, pooled, lat,
                              jax.random.PRNGKey(1), 10, guidance_scale=3.5,
                              repellency=rep, refs_nchw=refs,
                              window=RepellencyWindow(1000.0, 780.0))
    assert out.shape == lat.shape
    applied = np.asarray(applied)[:, 0]
    ts, _ = sched.timesteps_and_sigmas(10)
    np.testing.assert_array_equal(applied, (ts <= 1000) & (ts >= 780))


def test_window_cond_matches_where_mask(monkeypatch):
    """The lax.cond window gate must match the jnp.where masked control
    form (SDT_WINDOW_COND=0) for SD-v1 and SD3 — same math, so agreement
    to f32 fusion-reassociation tolerance; `applied` flags exactly."""
    sched = DDPMScheduler()
    text = jnp.ones((2, 2, 7, 8))
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    refs = jax.random.normal(jax.random.PRNGKey(2), (6, 4, 8, 8))
    rep = RepellencyConfig(method="kernel_fast", sigma=3.0, scale=0.33,
                           beta_threshold=0.0, use_beta_gate=True)
    win = RepellencyWindow(t_start=1000.0, t_end=500.0, by_timestep=True)

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("SDT_WINDOW_COND", flag)
        outs[flag] = sample_sd(_dummy_unet, sched, text, lat,
                               jax.random.PRNGKey(1), 10,
                               repellency=rep, refs_nchw=refs, window=win)
    np.testing.assert_allclose(np.asarray(outs["0"][0]),
                               np.asarray(outs["1"][0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(outs["0"][1]),
                                  np.asarray(outs["1"][1]))
    assert np.asarray(outs["1"][1]).any()  # window actually fired

    sched3 = FlowMatchEulerScheduler()

    def dummy_tf(latents, t, ctx, pooled):
        return 0.05 * latents + 0.001 * jnp.mean(pooled) * jnp.ones_like(latents)

    text3 = jnp.ones((2, 1, 6, 8))
    pooled = jnp.ones((2, 1, 5))
    lat3 = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16))
    refs3 = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 8, 8))
    rep3 = RepellencyConfig(method="kernel_fast", sigma=2.75, scale=0.03,
                            normalize_x=True, use_beta_gate=False)
    outs3 = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("SDT_WINDOW_COND", flag)
        outs3[flag] = sample_sd3(dummy_tf, sched3, text3, pooled, lat3,
                                 jax.random.PRNGKey(1), 10, guidance_scale=3.5,
                                 repellency=rep3, refs_nchw=refs3,
                                 window=RepellencyWindow(1000.0, 780.0))
    np.testing.assert_allclose(np.asarray(outs3["0"][0]),
                               np.asarray(outs3["1"][0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(outs3["0"][1]),
                                  np.asarray(outs3["1"][1]))
    assert np.asarray(outs3["1"][1]).any()


def test_postprocess_image_host_matches_eager_jnp():
    """fetch's host-side postprocess must be bit-identical to the previous
    on-device eager form ``(x/2 + 0.5).clip(0, 1)`` for both image dtypes
    the VAEs emit (bf16 compute path, f32 parity path) — the numpy move
    exists so the serving finisher thread never dispatches device work
    (ADVICE r4, serving/batcher.py threading contract)."""
    from safe_denoiser_tpu.pipeline.diffusion import postprocess_image_host

    for dtype in (jnp.bfloat16, jnp.float32):
        x = (jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
             .astype(dtype) * 1.5)
        old = np.asarray((x / 2 + 0.5).clip(0, 1))
        new = postprocess_image_host(x)
        assert old.dtype == new.dtype
        np.testing.assert_array_equal(
            old.view(np.uint16) if old.dtype != np.float32 else old,
            new.view(np.uint16) if new.dtype != np.float32 else new)
        # and a dense sweep across the clip edges / rounding boundaries
        v = jnp.asarray(np.linspace(-1.2, 1.2, 20001,
                                    dtype=np.float32)).astype(dtype)
        oldv = np.asarray((v / 2 + 0.5).clip(0, 1))
        newv = postprocess_image_host(v)
        np.testing.assert_array_equal(
            oldv.view(np.uint16) if oldv.dtype != np.float32 else oldv,
            newv.view(np.uint16) if newv.dtype != np.float32 else newv)
