import jax
import jax.numpy as jnp
import numpy as np

from safe_denoiser_tpu.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    FlowMatchEulerScheduler,
)
from safe_denoiser_tpu.schedulers.ddim import DDIMConfig
from safe_denoiser_tpu.schedulers.ddpm import DDPMConfig


def test_ddpm_tables_match_sd14():
    s = DDPMScheduler()
    # scaled_linear betas: endpoints are beta_start/beta_end exactly
    np.testing.assert_allclose(float(s.betas[0]), 0.00085, rtol=1e-6)
    np.testing.assert_allclose(float(s.betas[-1]), 0.012, rtol=1e-6)
    np.testing.assert_allclose(float(s.alphas_cumprod[0]), 1 - 0.00085, rtol=1e-6)
    assert s.alphas_cumprod.shape == (1000,)


def test_ddpm_leading_timesteps_50():
    s = DDPMScheduler()
    ts = s.timesteps(50)
    assert ts[0] == 981 and ts[-1] == 1 and len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_ddpm_pred_original_recovers_x0():
    s = DDPMScheduler(DDPMConfig(clip_sample=False))
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (1, 4, 8, 8)) * 0.3
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.int32(981)
    x_t = s.add_noise(x0, noise, t)
    # with the true epsilon as model output, Tweedie must invert exactly
    x0_hat = s.pred_original_sample(noise, t, x_t)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)


def test_ddpm_clip_sample():
    s = DDPMScheduler(DDPMConfig(clip_sample=True))
    x0_hat = s.pred_original_sample(jnp.zeros((1, 4, 4, 4)), jnp.int32(981),
                                    10.0 * jnp.ones((1, 4, 4, 4)))
    assert float(jnp.max(x0_hat)) <= 1.0


def test_ddpm_step_matches_posterior_mean():
    # independent q-posterior mean (DDPM paper eq. 7) vs our step()
    s = DDPMScheduler(DDPMConfig(clip_sample=False))
    n_inf = 50
    t = 501
    prev_t = t - 1000 // n_inf
    ac = np.asarray(s.alphas_cumprod)
    a_t, a_prev = ac[t], ac[prev_t]
    alpha_t = a_t / a_prev
    x_t = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(3), x_t.shape)
    x0 = (np.asarray(x_t) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
    mu = (np.sqrt(a_prev) * (1 - alpha_t) / (1 - a_t)) * x0 + \
         (np.sqrt(alpha_t) * (1 - a_prev) / (1 - a_t)) * np.asarray(x_t)

    prev, x0_hat = s.step(eps, jnp.int32(t), x_t, n_inf, jax.random.PRNGKey(4))
    var = (1 - alpha_t) * (1 - a_prev) / (1 - a_t)
    # subtract the stochastic part to compare means
    noise = jax.random.normal(jax.random.PRNGKey(4), x_t.shape)
    det = np.asarray(prev) - np.sqrt(var) * np.asarray(noise)
    np.testing.assert_allclose(det, mu, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x0_hat), x0, atol=1e-4)


def test_ddpm_step_t0_has_no_noise():
    s = DDPMScheduler(DDPMConfig(clip_sample=False))
    x_t = jnp.ones((1, 4, 4, 4))
    eps = jnp.zeros_like(x_t)
    p1, _ = s.step(eps, jnp.int32(501), x_t, 50, jax.random.PRNGKey(0))
    p2, _ = s.step(eps, jnp.int32(501), x_t, 50, jax.random.PRNGKey(9))
    # interior t → noisy; t=0 → deterministic
    q1, _ = s.step(eps, jnp.int32(0), x_t, 50, jax.random.PRNGKey(0))
    q2, _ = s.step(eps, jnp.int32(0), x_t, 50, jax.random.PRNGKey(9))
    assert not np.allclose(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))


def test_ddim_deterministic_and_inverts():
    s = DDIMScheduler(DDIMConfig())
    rng = jax.random.PRNGKey(0)
    x0 = 0.2 * jax.random.normal(rng, (1, 4, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.int32(981)
    x_t = s.add_noise(x0, noise, t)
    # eta=0 → pure deterministic step toward x0
    prev, x0_hat = s.step(noise, t, x_t, 50, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)
    # prev must equal add_noise(x0, eps, prev_t) for the same eps
    prev_expected = s.add_noise(x0, noise, jnp.int32(961))
    np.testing.assert_allclose(np.asarray(prev), np.asarray(prev_expected), atol=1e-4)


def test_flow_match_sigmas():
    s = FlowMatchEulerScheduler()
    ts, sigmas = s.timesteps_and_sigmas(50)
    assert len(ts) == 50 and len(sigmas) == 51
    assert sigmas[-1] == 0.0
    assert np.all(np.diff(sigmas) < 0)
    # shift(1.0) == 1.0 → first timestep is 1000
    np.testing.assert_allclose(ts[0], 1000.0, rtol=1e-5)
    np.testing.assert_allclose(sigmas[0], 1.0, rtol=1e-5)
    # timesteps = sigma * 1000 exactly
    np.testing.assert_allclose(ts, sigmas[:-1] * 1000.0, rtol=1e-6)


def test_flow_match_step_reaches_x0_one_step():
    # With the true velocity v = noise - x0, sigma_next=0 lands on x0.
    s = FlowMatchEulerScheduler()
    x0 = np.random.RandomState(0).randn(1, 16, 8, 8).astype(np.float32)
    noise = np.random.RandomState(1).randn(1, 16, 8, 8).astype(np.float32)
    sigma = np.float32(0.7)
    x_t = s.scale_noise(x0, sigma, noise)
    v = noise - x0
    out = s.step(v, sigma, np.float32(0.0), x_t)
    np.testing.assert_allclose(out, x0, atol=1e-5)
