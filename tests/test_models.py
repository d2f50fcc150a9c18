"""Shape/jit tests for the model zoo on tiny configs (CPU mesh via conftest)."""

import jax
import jax.numpy as jnp
import pytest

from safe_denoiser_tpu.models import (
    AutoencoderKL, CLIPTextConfig, CLIPTextModel, FreeUConfig, MMDiT,
    MMDiTConfig, T5Config, T5Encoder, UNet2DCondition, UNetConfig, VAEConfig,
)

TINY_UNET = UNetConfig(sample_size=16, block_out_channels=(32, 64, 64),
                       layers_per_block=1, cross_attention_dim=32,
                       num_attention_heads=4, norm_num_groups=8)
TINY_VAE = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                     norm_num_groups=8, sample_size=32)
TINY_CLIP = CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                           num_heads=4, intermediate_size=64,
                           max_position_embeddings=16, eos_token_id=99,
                           projection_dim=24)
TINY_MMDIT = MMDiTConfig(sample_size=8, num_layers=2, num_heads=4, head_dim=8,
                         joint_attention_dim=48, caption_projection_dim=32,
                         pooled_projection_dim=40, pos_embed_max_size=16)
TINY_T5 = T5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4)


def test_unet_forward_and_jit():
    model = UNet2DCondition(TINY_UNET)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 16, 16, 4))
    t = jnp.array([10, 10])
    ctx = jnp.ones((2, 7, 32))
    params = model.init(rng, x, t, ctx)
    out = jax.jit(model.apply)(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert out.dtype == jnp.float32


def test_unet_freeu_safeguard():
    model = UNet2DCondition(TINY_UNET)
    rng = jax.random.PRNGKey(0)
    x = jnp.linspace(-1, 1, 3 * 16 * 16 * 4).reshape(3, 16, 16, 4)
    t = jnp.array([10, 10, 10])
    ctx = jnp.ones((3, 7, 32))
    params = model.init(rng, x, t, ctx)
    base = model.apply(params, x, t, ctx)
    freeu = model.apply(params, x, t, ctx, freeu=FreeUConfig(mode="all"))
    assert freeu.shape == base.shape
    # Filters only touch the conditional branch (index 1) and the shared
    # backbone scaling; branch 0 must differ from base only via b1/b2 scaling.
    assert not jnp.allclose(base[1], freeu[1])


def test_vae_roundtrip_shapes():
    model = AutoencoderKL(TINY_VAE)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 32, 32, 3))
    params = model.init({"params": rng}, x, rng)
    z = model.apply(params, x, rng, method=AutoencoderKL.sample_latent)
    assert z.shape == (1, 16, 16, 4)
    img = model.apply(params, z, method=AutoencoderKL.decode)
    assert img.shape == (1, 32, 32, 3)


def test_clip_text_outputs():
    model = CLIPTextModel(TINY_CLIP)
    ids = jnp.array([[1, 5, 7, 99, 0, 0, 0, 0]])
    params = model.init(jax.random.PRNGKey(0), ids)
    last, penult, pooled, projected = jax.jit(model.apply)(params, ids)
    assert last.shape == (1, 8, 32)
    assert penult.shape == (1, 8, 32)
    assert pooled.shape == (1, 32)
    assert projected.shape == (1, 24)
    # pooled must come from the EOS position (index 3)
    manual = last[0, 3]
    assert jnp.allclose(pooled[0], manual)


def test_mmdit_forward():
    model = MMDiT(TINY_MMDIT)
    x = jnp.ones((2, 8, 8, 16))
    t = jnp.array([500, 500])
    ctx = jnp.ones((2, 12, 48))
    pooled = jnp.ones((2, 40))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, pooled)
    out = jax.jit(model.apply)(params, x, t, ctx, pooled)
    assert out.shape == (2, 8, 8, 16)


def test_t5_encoder():
    model = T5Encoder(TINY_T5)
    ids = jnp.array([[3, 4, 5, 1, 0, 0]])
    params = model.init(jax.random.PRNGKey(0), ids)
    out = jax.jit(model.apply)(params, ids)
    assert out.shape == (1, 6, 32)


def test_fast_gelu_bound_and_gating():
    """bf16 compute uses the tanh-form gelu (SDT_FAST_GELU default on);
    f32 keeps the exact erf. The forms differ by <= 4.8e-4 absolute
    everywhere — below bf16 activation resolution (layers._gelu_for)."""
    import jax.numpy as jnp
    import numpy as np
    from safe_denoiser_tpu.models.layers import _gelu_for

    x = jnp.asarray(np.linspace(-12.0, 12.0, 20001), dtype=jnp.float32)
    exact = jax.nn.gelu(x, approximate=False)
    fast = _gelu_for(jnp.bfloat16)(x)
    assert float(jnp.max(jnp.abs(fast - exact))) <= 4.8e-4
    # f32 path is the exact erf form
    np.testing.assert_array_equal(np.asarray(_gelu_for(jnp.float32)(x)),
                                  np.asarray(exact))


@pytest.mark.parametrize("cross", [False, True])
@pytest.mark.parametrize("bias", [False, True])
def test_fused_qkv_matches_unfused(monkeypatch, cross, bias):
    """SDT_FUSED_QKV=1 packs the q/k/v (self) / k/v (cross) projections into
    one dot to amortize MXU output-lane padding (layers.Attention). Same
    param tree, same numerics — each output element is the identical dot
    product, so f32 results match exactly."""
    import numpy as np
    from safe_denoiser_tpu.models.layers import Attention

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 40), jnp.float32)
    ctx = jnp.asarray(rng.randn(2, 9, 24), jnp.float32) if cross else None
    mod = Attention(num_heads=4, head_dim=8, context_dim=24 if cross else None,
                    use_qkv_bias=bias)

    monkeypatch.setenv("SDT_FUSED_QKV", "0")
    params = mod.init(jax.random.PRNGKey(0), x, ctx)
    ref = mod.apply(params, x, ctx)

    monkeypatch.setenv("SDT_FUSED_QKV", "1")
    params_f = mod.init(jax.random.PRNGKey(0), x, ctx)
    # identical param tree: the fused path declares the same to_q/to_k/to_v
    # kernels, so converted checkpoints load unchanged
    assert jax.tree_util.tree_structure(params_f) == \
        jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree_util.tree_leaves(params_f),
                    jax.tree_util.tree_leaves(params)):
        assert a.shape == b.shape
    got = mod.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
