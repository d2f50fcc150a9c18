"""SD3 flow-matching whole-loop parity (companion to test_loop_parity.py).

Re-types the reference's SD3 safe-denoiser loop in torch — FlowMatchEuler
sigmas, CFG combine, the x̂₀/x̂₁ flow split, channel-normalized kernel_fast
conditioning, the √σ₊·x̂₁ + √(1−σ₊)·ε renoise, the x̂₀′ + σ₊(n − x̂₀′)
recombine, and the plain Euler step outside the window (reference
models/sdv3/safe_denoiser_pipeline.py:1103,1135-1165) — and runs it against
pipeline/sampler.py::sample_sd3 on identical tiny MMDiT weights and the same
jax noise stream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from safe_denoiser_tpu.models import weights as W  # noqa: E402
from safe_denoiser_tpu.models.mmdit import MMDiT, MMDiTConfig  # noqa: E402
from safe_denoiser_tpu.pipeline.sampler import (  # noqa: E402
    RepellencyWindow, sample_sd3)
from safe_denoiser_tpu.repellency import RepellencyConfig  # noqa: E402
from safe_denoiser_tpu.schedulers import FlowMatchEulerScheduler  # noqa: E402
from tests.golden.diffusers_torch_ref import flow_sigmas  # noqa: E402
from tests.test_repellency import _torch_kernel_fast  # noqa: E402
from tests.test_torch_golden import TMMDiT, _sd  # noqa: E402

B, HW, STEPS = 2, 8, 6
SIGMA_K, SCALE_K, EPS_K = 10.0, 0.05, 1e-8
GUIDANCE = 2.5
RNG = jax.random.PRNGKey(77)


def _jax_noise(i: int, salt: int) -> np.ndarray:
    k = jax.random.fold_in(jax.random.fold_in(RNG, i), salt)
    n = jax.random.normal(k, (B, HW, HW, 4), dtype=jnp.float32)
    return np.asarray(n).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("use_rep", [False, True], ids=["std", "safe_denoiser"])
def test_sd3_scan_matches_torch_reference_loop(use_rep):
    torch.manual_seed(21)
    tm = TMMDiT(dim=32, heads=2, layers=2, cin=4, patch=2, joint_dim=24,
                pooled_dim=20, sample_size=16, pos_embed_max_size=8).eval()
    cfg = MMDiTConfig(sample_size=16, patch_size=2, in_channels=4,
                      out_channels=4, num_layers=2, num_heads=2, head_dim=16,
                      joint_attention_dim=24, caption_projection_dim=32,
                      pooled_projection_dim=20, pos_embed_max_size=8)
    params = W.convert_mmdit(_sd(tm), cfg)
    model = MMDiT(cfg)

    rs = np.random.RandomState(4)
    lat0 = rs.randn(B, 4, HW, HW).astype(np.float32)
    ctx2 = rs.randn(2, B, 7, 24).astype(np.float32)
    pooled2 = rs.randn(2, B, 20).astype(np.float32)
    refs = rs.randn(5, 4, HW, HW).astype(np.float32)
    refs /= np.linalg.norm(refs, axis=1, keepdims=True)
    refs_flat = refs.reshape(5, -1)

    # window chosen so some steps renoise and some take the Euler branch
    window = (1000.0, 500.0)

    # ---- torch reference loop ----------------------------------------
    timesteps, sigmas = flow_sigmas(STEPS, shift=3.0)
    latents = torch.from_numpy(lat0).clone()
    ctx_cat = torch.from_numpy(np.concatenate([ctx2[0], ctx2[1]], axis=0))
    pooled_cat = torch.from_numpy(
        np.concatenate([pooled2[0], pooled2[1]], axis=0))
    for i, t in enumerate(timesteps):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        lat_in = torch.cat([latents] * 2, dim=0)
        with torch.no_grad():
            v = tm(lat_in, torch.full((2 * B,), float(t)), ctx_cat, pooled_cat)
        v = v[:B] + GUIDANCE * (v[B:] - v[:B])
        in_window = window[1] <= t <= window[0]
        if use_rep and in_window:
            x0 = latents - sigma * v
            x1 = latents + (1.0 - sigma) * v
            xn = (x0 / x0.norm(dim=1, keepdim=True)).reshape(B, -1)
            score, _ = _torch_kernel_fast(xn.numpy(), refs_flat, SIGMA_K,
                                          EPS_K)
            x0p = x0 - SCALE_K * torch.from_numpy(score).reshape(x0.shape)
            eps = torch.from_numpy(_jax_noise(i, 1))
            noise = np.sqrt(sigma_next) * x1 + np.sqrt(1 - sigma_next) * eps
            latents = x0p + sigma_next * (noise - x0p)
        else:
            latents = latents + (sigma_next - sigma) * v
    want = latents.numpy()

    # ---- the scan ------------------------------------------------------
    def tf_apply(lat, t, ctx, pool):
        return model.apply(params, lat, t, ctx, pool)

    rep = RepellencyConfig(method="kernel_fast", sigma=SIGMA_K, scale=SCALE_K,
                           epsilon=EPS_K, use_beta_gate=False,
                           normalize_x=True) if use_rep else None
    got, applied = sample_sd3(
        tf_apply, FlowMatchEulerScheduler(),
        jnp.asarray(ctx2), jnp.asarray(pooled2),
        jnp.asarray(lat0.transpose(0, 2, 3, 1)), RNG, STEPS,
        guidance_scale=GUIDANCE, repellency=rep,
        refs_nchw=jnp.asarray(refs) if use_rep else None,
        window=RepellencyWindow(*window))
    got = np.asarray(got).transpose(0, 3, 1, 2)

    if use_rep:
        a = np.asarray(applied)
        assert a.any() and not a.all(), "window must split renoise/euler steps"
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
