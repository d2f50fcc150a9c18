"""Real-weight readiness drill at FULL SD-1.4 scale (VERDICT r2 item 7).

Fabricates a complete full-size HF-layout SD-1.4 checkpoint directory on
disk via the inverse converters (~3.7 GB of safetensors: 860M-param UNet,
84M VAE, 123M CLIP-L, 49,408-entry tokenizer), then runs the REAL loading
path — ``SafeDiffusionPipeline.from_pretrained`` → repellency bank
projection → 2-step 512x512 sample → VAE decode — on the actual TPU in
bf16, asserting no converter/VMEM/dtype surprise fires at real scale
(today's other from_pretrained tests are tiny-config; the reference's
loader is run_nudity.py:105-136).

TPU-gated; run with:
    SDT_TPU_TESTS=1 python -m pytest tests/test_real_scale_drill.py -q
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("SDT_TPU_TESTS") != "1"
    or jax.default_backend() != "tpu",
    reason="full-scale drill needs the real TPU (SDT_TPU_TESTS=1)")


def _filled_like(shapes, fill=0.02):
    return jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, fill, s.dtype), shapes)


def _write_full_checkpoint(root):
    from safetensors.numpy import save_file

    from safe_denoiser_tpu.models import (
        AutoencoderKL, SD14_UNET, SD14_VAE, UNet2DCondition)
    from safe_denoiser_tpu.text.clip_tokenizer import bytes_to_unicode
    from tests.helpers_invert import invert_unet, invert_vae

    os.makedirs(root, exist_ok=True)
    rng = jax.random.PRNGKey(0)

    # -- UNet (full 860M) — eval_shape + fill avoids a minutes-long CPU init;
    # the drill targets the converter/VMEM/compile path, not numerics
    with jax.default_device(jax.devices("cpu")[0]):
        unet = UNet2DCondition(SD14_UNET)
        unet_shapes = jax.eval_shape(
            lambda: unet.init(rng, jnp.zeros((1, 64, 64, 4)), jnp.asarray(1),
                              jnp.zeros((1, 77, 768))))
        unet_params = _filled_like(unet_shapes)
        udir = os.path.join(root, "unet")
        os.makedirs(udir, exist_ok=True)
        save_file({k: np.asarray(v) for k, v in
                   invert_unet(unet_params["params"], SD14_UNET).items()},
                  os.path.join(udir, "model.safetensors"))
        del unet_params

        vae = AutoencoderKL(SD14_VAE)
        vae_shapes = jax.eval_shape(
            lambda: vae.init({"params": rng}, jnp.zeros((1, 512, 512, 3)),
                             rng))
        vae_params = _filled_like(vae_shapes)
        vdir = os.path.join(root, "vae")
        os.makedirs(vdir, exist_ok=True)
        save_file({k: np.asarray(v) for k, v in
                   invert_vae(vae_params["params"], SD14_VAE).items()},
                  os.path.join(vdir, "model.safetensors"))
        del vae_params

    # -- CLIP-L text encoder from the real HF module (authentic state-dict)
    import torch
    import transformers

    torch.manual_seed(0)
    # CLIP-L/14 dims (SD-1.4's text_encoder) — transformers' default
    # CLIPTextConfig is CLIP-base (512 wide), which this drill caught
    hf_text = transformers.CLIPTextModel(transformers.CLIPTextConfig(
        hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
        num_attention_heads=12, max_position_embeddings=77,
        hidden_act="quick_gelu", projection_dim=768)).eval()
    tdir = os.path.join(root, "text_encoder")
    os.makedirs(tdir, exist_ok=True)
    save_file({k: v.numpy() for k, v in hf_text.state_dict().items()
               if "position_ids" not in k},
              os.path.join(tdir, "model.safetensors"))
    del hf_text

    # -- full-vocab tokenizer (49,408 entries, byte-level base + filler)
    base = list(bytes_to_unicode().values())
    vocab = {}
    for ch in base:
        vocab[ch] = len(vocab)
    for ch in base:
        vocab[ch + "</w>"] = len(vocab)
    i = 0
    while len(vocab) < 49406:
        vocab[f"tok{i}</w>"] = len(vocab)
        i += 1
    vocab["<|startoftext|>"] = 49406
    vocab["<|endoftext|>"] = 49407
    tkdir = os.path.join(root, "tokenizer")
    os.makedirs(tkdir, exist_ok=True)
    with open(os.path.join(tkdir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tkdir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(tkdir, "tokenizer_config.json"), "w") as f:
        json.dump({"model_max_length": 77}, f)
    return root


def test_full_scale_from_pretrained_sample_decode(tmp_path_factory):
    from safe_denoiser_tpu.pipeline.diffusion import (EraseSpec,
                                                      SafeDiffusionPipeline)
    from safe_denoiser_tpu.repellency import get_repellency_method

    root = _write_full_checkpoint(
        str(tmp_path_factory.mktemp("sd14_full") / "ckpt"))

    pipe = SafeDiffusionPipeline.from_pretrained(root)
    # bf16 storage on the compute towers, like the runners load them
    assert pipe.unet.dtype == jnp.bfloat16

    # negative bank (NCHW, like the data layer) -> VAE-encode projection at
    # the real latent width, using the runners' canonical embed_fn form
    bank = np.random.RandomState(0).rand(4, 3, 512, 512).astype(
        np.float32) - 0.5

    def embed_fn(x):
        nhwc = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
        z = pipe._vae_encode(nhwc, jax.random.PRNGKey(0))
        return jnp.transpose(z, (0, 3, 1, 2)) * pipe.vae.config.scaling_factor

    proc = get_repellency_method(
        "kernel_fast", bank, embed_fn=embed_fn,
        sigma=3.15, scale=0.33, beta_threshold=7.0, n_embed=2)
    refs = proc.get_proj_ref()
    assert refs.shape == (4, 4, 64, 64)
    assert np.isfinite(np.asarray(refs, dtype=np.float32)).all()

    imgs = pipe("a photograph of an astronaut riding a horse",
                num_inference_steps=2, seed=1,
                repellency_processor=proc,
                erase_spec=EraseSpec(repellency=True))
    assert len(imgs) == 1
    assert imgs[0].shape == (512, 512, 3)
    assert imgs[0].dtype == np.uint8
