"""End-to-end smoke test: the minimum slice of SURVEY.md §7 on tiny models.

prompt → tokenizer → CLIP → (SAFREE projection) → scan sampling with
kernel_fast repellency + renoise → VAE decode → uint8 images, across the
erase_id matrix. Tiny random weights; asserts shapes, determinism, and the
repellency activation pattern rather than image content.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_denoiser_tpu.models import (
    AutoencoderKL, CLIPTextConfig, CLIPTextModel, UNet2DCondition,
    UNetConfig, VAEConfig,
)
from safe_denoiser_tpu.pipeline.diffusion import (
    ERASE_SPECS, SLD_CONFIGS, SafeDiffusionPipeline,
)
from safe_denoiser_tpu.repellency import get_repellency_method
from safe_denoiser_tpu.schedulers import DDPMScheduler
from safe_denoiser_tpu.text import CLIPTokenizer
from safe_denoiser_tpu.text.clip_tokenizer import bytes_to_unicode


def _tiny_tokenizer():
    chars = list(bytes_to_unicode().values())
    tokens = chars + [c + "</w>" for c in chars]
    # merge outputs must not collide with existing tokens, else ids exceed
    # the embedding table (real CLIP vocab.json files are collision-free)
    merges = [("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>")]
    tokens += ["".join(m) for m in merges]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    return CLIPTokenizer(merges, vocab, max_length=16)


@pytest.fixture(scope="module")
def tiny_pipe():
    tok = _tiny_tokenizer()
    clip_cfg = CLIPTextConfig(
        vocab_size=len(tok.vocab), hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=16,
        eos_token_id=tok.eos_token_id, projection_dim=32)
    unet_cfg = UNetConfig(sample_size=8, block_out_channels=(16, 32),
                          layers_per_block=1, cross_attention_dim=32,
                          num_attention_heads=4, norm_num_groups=8)
    vae_cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                        norm_num_groups=4, sample_size=32)

    rng = jax.random.PRNGKey(0)
    text = CLIPTextModel(clip_cfg)
    text_params = text.init(rng, jnp.zeros((1, 16), jnp.int32))
    unet = UNet2DCondition(unet_cfg)
    unet_params = unet.init(rng, jnp.zeros((1, 16, 16, 4)), jnp.asarray(1),
                            jnp.zeros((1, 16, 32)))
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 32, 32, 3)), rng)

    return SafeDiffusionPipeline(unet, unet_params, vae, vae_params,
                                 text, text_params, tok, DDPMScheduler())


def _repellency(pipe, beta_threshold=1e-12):
    ref_imgs = np.random.RandomState(0).randn(6, 3, 32, 32).astype(np.float32)

    def embed_fn(x):
        nhwc = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
        z = pipe._vae_encode(nhwc, jax.random.PRNGKey(0))
        return jnp.transpose(z, (0, 3, 1, 2)) * pipe.vae.config.scaling_factor

    return get_repellency_method(
        "kernel_fast", ref_data=ref_imgs, embed_fn=embed_fn,
        num_timesteps=4, n_embed=4, sigma=100.0, scale=0.33,
        beta_threshold=beta_threshold)


def test_vanilla_generation(tiny_pipe):
    imgs = tiny_pipe("a cat", num_inference_steps=4, height=32, width=32,
                     seed=7)
    assert len(imgs) == 1
    assert imgs[0].shape == (32, 32, 3)
    assert imgs[0].dtype == np.uint8
    imgs2 = tiny_pipe("a cat", num_inference_steps=4, height=32, width=32,
                      seed=7)
    np.testing.assert_array_equal(imgs[0], imgs2[0])


def test_safree_rep_threshold_time(tiny_pipe):
    class Log:
        lines = []
        def log(self, s): self.lines.append(s)

    log = Log()
    rep = _repellency(tiny_pipe)
    imgs = tiny_pipe(
        # 5 steps so the leading-spaced timesteps include 801 ∈ [780, 1000]
        "a cat dog", num_inference_steps=5, height=32, width=32, seed=3,
        repellency_processor=rep,
        negative_prompt_space=["dog", "cat"],
        erase_spec=ERASE_SPECS["safree_neg_prompt_rep_threshold_time"],
        safree_dict={"safree": True, "svf": False, "lra": False,
                     "re_attn_t": [-1, 1001], "alpha": 0.01,
                     "category": "nudity", "up_t": 10, "logger": log})
    assert imgs[0].shape == (32, 32, 3)
    assert any("we remove" in l for l in log.lines)
    # σ huge + threshold ~0 ⇒ repellency fires inside the 780..1000 window
    assert any("Repellency applied at timestep" in l for l in log.lines)


def test_sld_erase_id(tiny_pipe):
    imgs = tiny_pipe("a dog", num_inference_steps=4, height=32, width=32,
                     seed=5, erase_spec=ERASE_SPECS["sld"],
                     safe_config=SLD_CONFIGS["MAX"])
    assert imgs[0].shape == (32, 32, 3)


def test_lra_freeu_path(tiny_pipe):
    from safe_denoiser_tpu.models import FreeUConfig
    rep = _repellency(tiny_pipe)
    imgs = tiny_pipe(
        "a cat", num_inference_steps=4, height=32, width=32, seed=5,
        repellency_processor=rep,
        negative_prompt_space=["dog"],
        erase_spec=ERASE_SPECS["safree_neg_prompt_rep_time"],
        freeu=FreeUConfig(b1=1.1, b2=1.2, s1=0.9, s2=0.2, mode="all"),
        safree_dict={"safree": True, "svf": True, "lra": True,
                     "re_attn_t": [-1, 1001], "alpha": 0.01,
                     "category": "nudity", "up_t": 10})
    assert imgs[0].shape == (32, 32, 3)


def test_return_latents(tiny_pipe):
    lat = tiny_pipe("a cat", num_inference_steps=2, height=32, width=32,
                    seed=1, return_latents=True)
    assert lat.shape == (1, 16, 16, 4)  # 32 / vae_scale_factor(2)


def test_generate_batch_matches_single(tiny_pipe):
    """Batched rows reproduce their single-row counterparts (per-sample
    seeds drive the initial latents)."""
    single_a = tiny_pipe("a cat", num_inference_steps=3, height=32, width=32,
                         seed=11, guidance_scale=7.5)[0]
    single_b = tiny_pipe("a dog", num_inference_steps=3, height=32, width=32,
                         seed=22, guidance_scale=5.0)[0]
    batched = tiny_pipe.generate_batch(
        ["a cat", "a dog"], seeds=[11, 22], guidance_scales=[7.5, 5.0],
        num_inference_steps=3, height=32, width=32)
    assert len(batched) == 2
    # per-sample PRNG keys: every row's noise stream depends only on its own
    # seed, so batched rows reproduce single-row calls EXACTLY
    np.testing.assert_array_equal(batched[0], single_a)
    np.testing.assert_array_equal(batched[1], single_b)
    # ...and are order-independent
    swapped = tiny_pipe.generate_batch(
        ["a dog", "a cat"], seeds=[22, 11], guidance_scales=[5.0, 7.5],
        num_inference_steps=3, height=32, width=32)
    np.testing.assert_array_equal(swapped[0], single_b)
    np.testing.assert_array_equal(swapped[1], single_a)


def test_bank_sharding_matches_replicated_pipeline(tiny_pipe):
    """enable_bank_sharding: the same prompt+seed through the M-sharded
    repellency path (parallel/bank.py) reproduces the replicated-bank images
    (psum reassociation may flip a uint8 rounding, nothing more)."""
    from safe_denoiser_tpu.parallel import make_mesh

    rep = _repellency(tiny_pipe)
    kw = dict(num_inference_steps=5, height=32, width=32, seed=3,
              repellency_processor=rep,
              erase_spec=ERASE_SPECS["std_rep"])
    want = tiny_pipe("a cat dog", **kw)[0]

    tiny_pipe.enable_bank_sharding(make_mesh(8))
    try:
        got = tiny_pipe("a cat dog", **kw)[0]
    finally:
        tiny_pipe._rep_bank = None
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1 and (diff == 0).mean() > 0.99


def test_int8_generation_close_to_f32(tiny_pipe):
    """enable_int8 (UNet W8A8, ops/quant.py): generation still runs end to
    end, is idempotent, and the quantized images stay close to the f32 ones
    (~1e-2 per-dot rel err; uint8 images should agree almost everywhere)."""
    kw = dict(num_inference_steps=4, height=32, width=32, seed=7)
    want = tiny_pipe("a cat", **kw)[0]
    saved = tiny_pipe.unet_params
    try:
        tiny_pipe.enable_int8(min_dim=8)
        assert "quant" in tiny_pipe.unet_params
        q = tiny_pipe.unet_params
        tiny_pipe.enable_int8(min_dim=8)   # idempotent: second call a no-op
        assert tiny_pipe.unet_params is q
        with pytest.raises(ValueError):    # mismatched re-gate must refuse
            tiny_pipe.enable_int8(min_dim=16)
        got = tiny_pipe("a cat", **kw)[0]
    finally:
        tiny_pipe.unet_params = saved
    assert got.shape == want.shape and got.dtype == np.uint8
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    # 4 denoising steps compound the quantization noise; the image must stay
    # recognizably the same, not bit-equal
    assert np.mean(diff) < 8.0, np.mean(diff)
