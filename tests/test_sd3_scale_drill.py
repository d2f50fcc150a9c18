"""Full-scale SD3-medium converter/loader drill (CPU, ~16 GB disk).

Fabricates a complete HF-layout SD3-medium checkpoint directory at REAL
dimensions — 2.0B-param MMDiT (sharded 2 files + index.json), 16-channel
VAE, CLIP-L, CLIP-bigG, 4.7B-param T5-XXL (sharded, fp16 on disk) plus the
three tokenizer dirs and scheduler config — then runs the REAL loading path
``SafeDiffusion3Pipeline.from_pretrained`` and asserts every converted tree
matches the model's expected structure exactly, with a small real forward
through each text tower. Catches the converter/key/shape/shard-index
surprises that only appear at full scale (the tiny-config test
``test_sd3_from_pretrained.py`` cannot see a wrong-shaped full checkpoint;
the reference loads real SD3 weights via sdv3_pipeline.py:200-290).

Heavy and CPU-bound (~16 GB written + read back on one vCPU), so gated:
    SDT_SCALE_TESTS=1 python -m pytest tests/test_sd3_scale_drill.py -q
"""

import gc
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("SDT_SCALE_TESTS") != "1",
    reason="full-scale SD3 drill writes ~16 GB (SDT_SCALE_TESTS=1)")


def _filled_like(shapes, fill=0.02):
    return jax.tree_util.tree_map(
        lambda s: np.full(s.shape, fill, s.dtype), shapes)


def _save_sharded(state, dirpath, n_shards=2):
    """Write a real HF shard layout: model-0000i-of-0000N.safetensors +
    model.safetensors.index.json (exercises load_sharded_state_dict's
    index path at scale)."""
    from safetensors.numpy import save_file

    keys = sorted(state)
    per = -(-len(keys) // n_shards)
    weight_map = {}
    for s in range(n_shards):
        fname = f"model-{s + 1:05d}-of-{n_shards:05d}.safetensors"
        chunk = {k: state[k] for k in keys[s * per:(s + 1) * per]}
        save_file(chunk, os.path.join(dirpath, fname))
        weight_map.update({k: fname for k in chunk})
    with open(os.path.join(dirpath, "model.safetensors.index.json"),
              "w") as f:
        json.dump({"metadata": {"total_size": 0},
                   "weight_map": weight_map}, f)


def _meta_state_f16(build, fill=0.01):
    """Instantiate an HF torch module on the meta device (no RAM, no init
    cost) and fabricate its state dict as fp16 constants."""
    import torch

    with torch.device("meta"):
        mod = build()
    out = {k: np.full(tuple(v.shape), fill, np.float16)
           for k, v in mod.state_dict().items() if "position_ids" not in k}
    del mod
    return out


def _write_full_vocab_tokenizer(dirpath):
    from safe_denoiser_tpu.text.clip_tokenizer import bytes_to_unicode

    os.makedirs(dirpath, exist_ok=True)
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
    with open(os.path.join(dirpath, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(dirpath, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(dirpath, "tokenizer_config.json"), "w") as f:
        json.dump({"model_max_length": 77}, f)


def _write_checkpoint(root):
    import transformers
    from safetensors.numpy import save_file

    from safe_denoiser_tpu.models import AutoencoderKL, MMDiT
    from safe_denoiser_tpu.models.mmdit import SD3_MEDIUM
    from safe_denoiser_tpu.models.vae import SD3_VAE
    from tests.helpers_invert import invert_mmdit, invert_vae
    from tests.test_sd3_from_pretrained import _write_t5_fast_tokenizer

    rng = jax.random.PRNGKey(0)

    # -- MMDiT (full 2.0B) — eval_shape + constant fill (init would take
    # minutes of CPU); fp16 on disk like the real fp16 variant shards
    tf = MMDiT(SD3_MEDIUM)
    tf_shapes = jax.eval_shape(
        lambda: tf.init(rng, jnp.zeros((1, 128, 128, 16)), jnp.asarray(500.0),
                        jnp.zeros((1, 333, 4096)), jnp.zeros((1, 2048))))
    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir, exist_ok=True)
    inv = invert_mmdit(_filled_like(tf_shapes)["params"], SD3_MEDIUM)
    _save_sharded({k: np.asarray(v, np.float16) for k, v in inv.items()},
                  tdir)
    del inv, tf_shapes
    gc.collect()
    with open(os.path.join(tdir, "config.json"), "w") as f:
        json.dump({"sample_size": 128, "patch_size": 2, "in_channels": 16,
                   "out_channels": 16, "num_layers": 24,
                   "num_attention_heads": 24, "attention_head_dim": 64,
                   "joint_attention_dim": 4096,
                   "caption_projection_dim": 1536,
                   "pooled_projection_dim": 2048,
                   "pos_embed_max_size": 192}, f)

    # -- VAE (16-channel SD3 variant, no quant convs)
    vae = AutoencoderKL(SD3_VAE)
    vae_shapes = jax.eval_shape(
        lambda: vae.init({"params": rng}, jnp.zeros((1, 256, 256, 3)), rng))
    vdir = os.path.join(root, "vae")
    os.makedirs(vdir, exist_ok=True)
    save_file({k: np.asarray(v, np.float16) for k, v in
               invert_vae(_filled_like(vae_shapes)["params"],
                          SD3_VAE).items()},
              os.path.join(vdir, "model.safetensors"))
    del vae_shapes
    gc.collect()
    with open(os.path.join(vdir, "config.json"), "w") as f:
        json.dump({"latent_channels": 16,
                   "block_out_channels": [128, 256, 512, 512],
                   "layers_per_block": 2, "norm_num_groups": 32,
                   "scaling_factor": 1.5305, "shift_factor": 0.0609,
                   "sample_size": 1024, "use_quant_conv": False,
                   "use_post_quant_conv": False}, f)

    # -- CLIP-L and CLIP-bigG at real dims (meta-device HF modules give the
    # authentic key sets without init cost)
    for sub, (hidden, layers, heads, inter, proj, act) in {
            "text_encoder": (768, 12, 12, 3072, 768, "quick_gelu"),
            "text_encoder_2": (1280, 32, 20, 5120, 1280, "gelu")}.items():
        cdir = os.path.join(root, sub)
        os.makedirs(cdir, exist_ok=True)
        cfg = transformers.CLIPTextConfig(
            vocab_size=49408, hidden_size=hidden, num_hidden_layers=layers,
            num_attention_heads=heads, intermediate_size=inter,
            max_position_embeddings=77, hidden_act=act, projection_dim=proj,
            eos_token_id=49407)
        save_file(_meta_state_f16(
            lambda: transformers.CLIPTextModelWithProjection(cfg)),
            os.path.join(cdir, "model.safetensors"))
        with open(os.path.join(cdir, "config.json"), "w") as f:
            json.dump({"vocab_size": 49408, "hidden_size": hidden,
                       "num_hidden_layers": layers,
                       "num_attention_heads": heads,
                       "max_position_embeddings": 77,
                       "intermediate_size": inter, "hidden_act": act,
                       "projection_dim": proj, "eos_token_id": 49407}, f)

    # -- T5-XXL (full 4.7B, gated-gelu v1.1), sharded fp16
    t5dir = os.path.join(root, "text_encoder_3")
    os.makedirs(t5dir, exist_ok=True)
    t5_cfg = transformers.T5Config(
        vocab_size=32128, d_model=4096, d_kv=64, d_ff=10240, num_layers=24,
        num_heads=64, feed_forward_proj="gated-gelu",
        is_encoder_decoder=False, use_cache=False, dropout_rate=0.0)
    _save_sharded(_meta_state_f16(
        lambda: transformers.T5EncoderModel(t5_cfg)), t5dir)
    gc.collect()
    with open(os.path.join(t5dir, "config.json"), "w") as f:
        json.dump({"vocab_size": 32128, "d_model": 4096, "d_kv": 64,
                   "d_ff": 10240, "num_layers": 24, "num_heads": 64,
                   "relative_attention_num_buckets": 32,
                   "relative_attention_max_distance": 128}, f)

    # -- tokenizers + scheduler
    _write_full_vocab_tokenizer(os.path.join(root, "tokenizer"))
    _write_full_vocab_tokenizer(os.path.join(root, "tokenizer_2"))
    import pathlib
    _write_t5_fast_tokenizer(pathlib.Path(root) / "tokenizer_3",
                             max_vocab=32128)
    sdir = os.path.join(root, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 3.0}, f)
    return root


def _tree_shapes(tree):
    return {jax.tree_util.keystr(k): v.shape for k, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def _n_params(tree):
    return sum(int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(tree))


def test_full_scale_sd3_from_pretrained(tmp_path_factory):
    from safe_denoiser_tpu.pipeline.diffusion_sd3 import SafeDiffusion3Pipeline

    root = str(tmp_path_factory.mktemp("sd3_full"))
    _write_checkpoint(root)
    pipe = SafeDiffusion3Pipeline.from_pretrained(root)

    # scheduler config honored
    assert pipe.scheduler.config.shift == 3.0

    # converted trees must match the models' expected structures exactly
    rng = jax.random.PRNGKey(0)
    tf_shapes = jax.eval_shape(
        lambda: pipe.transformer.init(
            rng, jnp.zeros((1, 128, 128, 16)), jnp.asarray(500.0),
            jnp.zeros((1, 333, 4096)), jnp.zeros((1, 2048))))
    assert _tree_shapes(pipe.transformer_params) == _tree_shapes(tf_shapes)
    vae_shapes = jax.eval_shape(
        lambda: pipe.vae.init({"params": rng},
                              jnp.zeros((1, 256, 256, 3)), rng))
    assert _tree_shapes(pipe.vae_params) == _tree_shapes(vae_shapes)

    # real-scale parameter counts (the tiny tests can't catch a full
    # checkpoint converting to the wrong width)
    assert 1.9e9 < _n_params(pipe.transformer_params) < 2.2e9
    assert 4.5e9 < _n_params(pipe.t5_params) < 5.0e9

    # the jitted denoise/decode programs must trace against the converted
    # trees (catches tree-structure drift the shape compare can't express)
    jax.eval_shape(pipe.transformer.apply, pipe.transformer_params,
                   jnp.zeros((2, 128, 128, 16), jnp.bfloat16),
                   jnp.full((2,), 500.0),
                   jnp.zeros((2, 333, 4096), jnp.bfloat16),
                   jnp.zeros((2, 2048), jnp.bfloat16))
    jax.eval_shape(lambda p, z: pipe.vae.apply(p, z, method=pipe.vae.decode),
                   pipe.vae_params, jnp.zeros((1, 128, 128, 16),
                                              jnp.bfloat16))

    # small REAL forwards through the converted text towers (8 ids, CPU)
    ids = np.full((1, 8), 5, np.int64)
    out = pipe.t5.apply(pipe.t5_params, jnp.asarray(ids))
    assert out.shape == (1, 8, 4096) and bool(jnp.isfinite(out).all())
    lo = pipe.clip_l.apply(pipe.clip_l_params, jnp.asarray(ids))
    assert lo[0].shape == (1, 8, 768)
    go = pipe.clip_g.apply(pipe.clip_g_params, jnp.asarray(ids))
    assert go[0].shape == (1, 8, 1280)
