"""SD3 pipeline end-to-end smoke test on tiny models (flow matching +
SAFREE-for-SD3 + fast_sdv3 repellency renoising)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_denoiser_tpu.models import (
    AutoencoderKL, CLIPTextConfig, CLIPTextModel, MMDiT, MMDiTConfig,
    T5Config, T5Encoder, VAEConfig,
)
from safe_denoiser_tpu.pipeline.diffusion_sd3 import SafeDiffusion3Pipeline
from safe_denoiser_tpu.repellency import get_repellency_method
from safe_denoiser_tpu.schedulers import FlowMatchEulerScheduler
from safe_denoiser_tpu.text import CLIPTokenizer
from safe_denoiser_tpu.text.clip_tokenizer import bytes_to_unicode


def _tiny_tok(max_length):
    chars = list(bytes_to_unicode().values())
    tokens = chars + [c + "</w>" for c in chars]
    merges = [("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>")]
    tokens += ["".join(m) for m in merges]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    return CLIPTokenizer(merges, vocab, max_length=max_length)


@pytest.fixture(scope="module")
def sd3_pipe():
    tok = _tiny_tok(8)
    tok3 = _tiny_tok(12)  # stands in for the T5 tokenizer (same call API)
    joint = 48

    clip_cfg = CLIPTextConfig(
        vocab_size=len(tok.vocab), hidden_size=16, num_layers=2, num_heads=4,
        intermediate_size=32, max_position_embeddings=8,
        eos_token_id=tok.eos_token_id, projection_dim=16)
    clip_cfg2 = CLIPTextConfig(
        vocab_size=len(tok.vocab), hidden_size=16, num_layers=2, num_heads=2,
        intermediate_size=32, max_position_embeddings=8,
        eos_token_id=tok.eos_token_id, projection_dim=24)
    t5_cfg = T5Config(vocab_size=len(tok.vocab), d_model=joint, d_kv=8,
                      d_ff=64, num_layers=2, num_heads=4)
    mmdit_cfg = MMDiTConfig(sample_size=8, patch_size=2, in_channels=4,
                            out_channels=4, num_layers=2, num_heads=4,
                            head_dim=8, joint_attention_dim=joint,
                            caption_projection_dim=32,
                            pooled_projection_dim=40, pos_embed_max_size=8)
    vae_cfg = VAEConfig(latent_channels=4, block_out_channels=(8, 16),
                        layers_per_block=1, norm_num_groups=4,
                        scaling_factor=1.5305, shift_factor=0.0609,
                        sample_size=16)

    rng = jax.random.PRNGKey(0)
    clip_l = CLIPTextModel(clip_cfg)
    clip_l_p = clip_l.init(rng, jnp.zeros((1, 8), jnp.int32))
    clip_g = CLIPTextModel(clip_cfg2)
    clip_g_p = clip_g.init(rng, jnp.zeros((1, 8), jnp.int32))
    t5 = T5Encoder(t5_cfg)
    t5_p = t5.init(rng, jnp.zeros((1, 12), jnp.int32))
    tf = MMDiT(mmdit_cfg)
    tf_p = tf.init(rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray(500.0),
                   jnp.zeros((1, 20, joint)), jnp.zeros((1, 40)))
    vae = AutoencoderKL(vae_cfg)
    vae_p = vae.init({"params": rng}, jnp.zeros((1, 16, 16, 3)), rng)

    return SafeDiffusion3Pipeline(
        tf, tf_p, vae, vae_p, clip_l, clip_l_p, clip_g, clip_g_p, t5, t5_p,
        tok, tok, tok3, FlowMatchEulerScheduler(), max_sequence_length=12)


def test_encode_prompt_shapes(sd3_pipe):
    embeds, pooled = sd3_pipe.encode_prompt("a cat", "")
    # 8 CLIP tokens + 12 T5 tokens; pooled = 16 + 24
    assert embeds.shape == (2, 1, 20, 48)
    assert pooled.shape == (2, 1, 40)


def test_sd3_vanilla_generation(sd3_pipe):
    imgs = sd3_pipe("a cat", num_inference_steps=4, height=16, width=16,
                    seed=1)
    assert imgs[0].shape == (16, 16, 3)
    imgs2 = sd3_pipe("a cat", num_inference_steps=4, height=16, width=16,
                     seed=1)
    np.testing.assert_array_equal(imgs[0], imgs2[0])


def test_sd3_safree_repellency(sd3_pipe):
    class Log:
        lines = []
        def log(self, s): self.lines.append(s)
    sd3_pipe.logger = Log()

    ref_imgs = np.random.RandomState(0).randn(5, 3, 16, 16).astype(np.float32)

    def embed_fn(x):
        nhwc = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
        z = sd3_pipe.vae.apply(sd3_pipe.vae_params, nhwc, jax.random.PRNGKey(0),
                               method=AutoencoderKL.sample_latent)
        return jnp.transpose(z, (0, 3, 1, 2)) * 1.5305

    rep = get_repellency_method("kernel_fast", ref_data=ref_imgs,
                                embed_fn=embed_fn, n_embed=4, sigma=2.75,
                                scale=0.03, beta_threshold=0.5)
    imgs = sd3_pipe("a cat dog", num_inference_steps=4, height=16, width=16,
                    seed=2, safree=True, repellency_processor=rep)
    assert imgs[0].shape == (16, 16, 3)
    assert any("we remove" in l for l in Log.lines)
    # flow timesteps start near 1000 -> window fires on early steps
    assert any("Repellency applied" in l for l in Log.lines)


def test_sd3_generate_batch_rows_reproduce_single_runs(sd3_pipe):
    """Serving mode (serve.py --sd3): per-sample seeds/guidance are traced,
    and each batched row must equal its own single-row run (the
    DynamicBatcher pads partial groups by replicating a request, so row
    independence is what makes padding harmless)."""
    sd3_pipe.logger = None
    kw = dict(num_inference_steps=4, height=16, width=16)
    batch = sd3_pipe.generate_batch(["a cat", "a dog"], seeds=[3, 9],
                                    guidance_scales=[7.0, 4.0], **kw)
    assert len(batch) == 2 and batch[0].shape == (16, 16, 3)
    solo0 = sd3_pipe.generate_batch(["a cat", "a cat"], seeds=[3, 3],
                                    guidance_scales=[7.0, 7.0], **kw)
    np.testing.assert_array_equal(batch[0], solo0[0])
    np.testing.assert_array_equal(solo0[0], solo0[1])
    # different seed/guidance rows differ
    assert not np.array_equal(batch[0], batch[1])
    # a TRUE B=1 run (its own compiled program) must also reproduce the
    # batched row — catches any dependence on the compiled batch size
    solo1 = sd3_pipe.generate_batch(["a dog"], seeds=[9],
                                    guidance_scales=[4.0], **kw)
    np.testing.assert_array_equal(batch[1], solo1[0])


def test_sd3_generate_batch_repellency_and_safree(sd3_pipe):
    """The batched path supports SAFREE (per-prompt projection, stacked) and
    the flow-renoise repellency window like __call__."""
    class Log:
        lines = []
        def log(self, s): self.lines.append(s)
    sd3_pipe.logger = Log()
    ref_imgs = np.random.RandomState(1).randn(4, 3, 16, 16).astype(np.float32)

    def embed_fn(x):
        nhwc = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
        z = sd3_pipe.vae.apply(sd3_pipe.vae_params, nhwc,
                               jax.random.PRNGKey(0),
                               method=AutoencoderKL.sample_latent)
        return jnp.transpose(z, (0, 3, 1, 2)) * 1.5305

    rep = get_repellency_method("kernel_fast", ref_data=ref_imgs,
                                embed_fn=embed_fn, n_embed=4, sigma=2.75,
                                scale=0.03, beta_threshold=0.5)
    imgs = sd3_pipe.generate_batch(
        ["a cat dog", "a dog"], seeds=[2, 5], guidance_scales=[7.0, 7.0],
        num_inference_steps=4, height=16, width=16, safree=True,
        repellency_processor=rep)
    sd3_pipe.logger = None
    assert len(imgs) == 2 and imgs[0].shape == (16, 16, 3)
    assert any("we remove" in l for l in Log.lines)
    assert any("Repellency applied" in l for l in Log.lines)


def test_sd3_data_mesh_batch_matches_unsharded(sd3_pipe):
    """SD3 serving data mesh (enable_data_mesh): a batch sharded over the
    virtual 8-CPU mesh reproduces the unsharded rows (f32 fixture models,
    so the comparison is strict — see test_serving._f32_pipe for why bf16
    can only be compared loosely)."""
    prompts = ["a cat", "a dog", "a bus", "a tree",
               "a boat", "a fish", "a bird", "a car"]
    seeds = list(range(8))
    gs = [2.5, 3.5] * 4
    kw = dict(num_inference_steps=2, height=16, width=16)

    want_lat = sd3_pipe.dispatch_batch(
        prompts, seeds=seeds, guidance_scales=gs,
        **kw).fetch(return_latents=True)
    want = sd3_pipe.generate_batch(prompts, seeds=seeds,
                                   guidance_scales=gs, **kw)

    # the fixture is module-scoped: the mesh MUST be reset afterwards or
    # every later test in the module silently runs mesh-sharded (and odd
    # batch sizes hit the divisibility guard)
    sd3_pipe.enable_data_mesh(8)
    try:
        got_lat = sd3_pipe.dispatch_batch(
            prompts, seeds=seeds, guidance_scales=gs,
            **kw).fetch(return_latents=True)
        got = sd3_pipe.generate_batch(prompts, seeds=seeds,
                                      guidance_scales=gs, **kw)

        np.testing.assert_allclose(np.asarray(got_lat),
                                   np.asarray(want_lat),
                                   rtol=1e-4, atol=1e-4)
        for i, (g, w) in enumerate(zip(got, want)):
            d = np.abs(g.astype(np.int16) - w.astype(np.int16))
            assert d.max() <= 1, f"row {i}: max uint8 delta {d.max()}"

        with pytest.raises(ValueError, match="divisible"):
            sd3_pipe.dispatch_batch(["a"] * 3, seeds=[1, 2, 3],
                                    guidance_scales=[2.5] * 3, **kw)
        # both call orders of the mesh/bank conflict guard
        from safe_denoiser_tpu.parallel import make_mesh
        with pytest.raises(ValueError, match="bank"):
            sd3_pipe.enable_bank_sharding(make_mesh(8))
    finally:
        sd3_pipe._data_mesh = None
