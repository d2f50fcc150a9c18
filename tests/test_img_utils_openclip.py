"""Tests: repellency img_utils + OpenCLIP checkpoint conversion parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_denoiser_tpu.repellency.img_utils import (
    apply_blur,
    dynamic_thresholding,
    fft2c,
    gaussian_blur_kernel,
    ifft2c,
    mask_generator,
)

torch = pytest.importorskip("torch")


def test_fft_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ifft2c(fft2c(x)).real),
                               np.asarray(x), atol=1e-5)


def test_dynamic_thresholding_bounds():
    x = jnp.asarray(np.linspace(-10, 10, 4 * 4 * 4 * 3).reshape(4, 4, 4, 3))
    out = dynamic_thresholding(x, percentile=0.9)
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-6
    # values under the floor are untouched when s == floor
    small = jnp.asarray(np.full((1, 2, 2, 1), 0.5, np.float32))
    np.testing.assert_allclose(np.asarray(dynamic_thresholding(small)),
                               np.asarray(small))


def test_blur_preserves_mean():
    k = gaussian_blur_kernel(5, 1.5)
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-6)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 16, 16, 3).astype(np.float32))
    y = apply_blur(x, k)
    assert y.shape == x.shape
    # SAME zero-padding dims the border; the interior keeps the local mean
    ones = apply_blur(jnp.ones_like(x), k)
    np.testing.assert_allclose(np.asarray(ones)[0, 4:-4, 4:-4], 1.0, atol=1e-5)


def test_mask_generator():
    m = mask_generator((64, 64), "box", box_size=16, seed=3)
    assert m.shape == (64, 64)
    assert (m == 0).sum() == 16 * 16
    m2 = mask_generator((64, 64), "random", prob=0.5, seed=3)
    assert 0.3 < m2.mean() < 0.7


def test_openclip_vision_conversion_parity():
    """Build an OpenCLIP-layout state dict from a torch MultiheadAttention-
    style transformer and check numerical parity of one encoder layer."""
    from safe_denoiser_tpu.models import CLIPTextConfig
    from safe_denoiser_tpu.models.clip_text import CLIPEncoderLayer
    from safe_denoiser_tpu.models.weights import _openclip_layer

    torch.manual_seed(0)
    d, h, s = 32, 4, 10
    attn = torch.nn.MultiheadAttention(d, h, batch_first=True).eval()
    ln1, ln2 = torch.nn.LayerNorm(d).eval(), torch.nn.LayerNorm(d).eval()
    with torch.no_grad():
        for m in (ln1, ln2):
            m.weight.normal_()
            m.bias.normal_()
    fc = torch.nn.Linear(d, 4 * d)
    proj = torch.nn.Linear(4 * d, d)

    sd = {
        "blk.ln_1.weight": ln1.weight.detach().numpy(),
        "blk.ln_1.bias": ln1.bias.detach().numpy(),
        "blk.ln_2.weight": ln2.weight.detach().numpy(),
        "blk.ln_2.bias": ln2.bias.detach().numpy(),
        "blk.attn.in_proj_weight": attn.in_proj_weight.detach().numpy(),
        "blk.attn.in_proj_bias": attn.in_proj_bias.detach().numpy(),
        "blk.attn.out_proj.weight": attn.out_proj.weight.detach().numpy(),
        "blk.attn.out_proj.bias": attn.out_proj.bias.detach().numpy(),
        "blk.mlp.c_fc.weight": fc.weight.detach().numpy(),
        "blk.mlp.c_fc.bias": fc.bias.detach().numpy(),
        "blk.mlp.c_proj.weight": proj.weight.detach().numpy(),
        "blk.mlp.c_proj.bias": proj.bias.detach().numpy(),
    }
    params = _openclip_layer(sd, "blk")

    x = torch.randn(1, s, d)
    with torch.no_grad():
        hn = ln1(x)
        a, _ = attn(hn, hn, hn, need_weights=False)
        mid = x + a
        want = (mid + proj(torch.nn.functional.gelu(fc(ln2(mid))))).numpy()

    cfg = CLIPTextConfig(hidden_size=d, num_heads=h, intermediate_size=4 * d,
                         hidden_act="gelu")
    got = CLIPEncoderLayer(cfg).apply({"params": params},
                                      jnp.asarray(x.numpy()), None)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
