"""SD3 from_pretrained integration: fabricated HF-layout SD3 checkpoint dir
(config.jsons + safetensors for all five component towers + three tokenizer
dirs) → SafeDiffusion3Pipeline → one tiny generation."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from safe_denoiser_tpu.models import (
    AutoencoderKL, CLIPTextConfig, CLIPTextModel, MMDiT, MMDiTConfig,
    T5Config, T5Encoder, VAEConfig,
)
from safe_denoiser_tpu.pipeline.diffusion_sd3 import SafeDiffusion3Pipeline
from tests.helpers_invert import invert_mmdit, invert_vae
from tests.test_e2e_pipeline import _tiny_tokenizer

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _write_tokenizer(dirpath, tok, max_length):
    dirpath.mkdir(parents=True, exist_ok=True)
    (dirpath / "vocab.json").write_text(json.dumps(tok.vocab))
    merges = sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)
    (dirpath / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n")
    (dirpath / "tokenizer_config.json").write_text(
        json.dumps({"model_max_length": max_length}))


def _write_t5_fast_tokenizer(dirpath, max_vocab):
    """A real Unigram T5TokenizerFast fixture (tokenizer.json) so the SD3
    pipeline's transformers.AutoTokenizer branch is exercised — round-1
    VERDICT item 7 (reference sdv3_pipeline.py:290-344 uses the true T5
    tokenizer; the CLIPTokenizer fallback must not silently take over)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, processors

    dirpath.mkdir(parents=True, exist_ok=True)
    pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0)]
    words = ["▁a", "▁cat", "▁dog", "▁photo", "▁of",
             "▁the", "▁"]
    pieces += [(w, -2.0) for w in words]
    pieces += [(ch, -6.0) for ch in "abcdefghijklmnopqrstuvwxyz"]
    assert len(pieces) <= max_vocab, "unigram vocab exceeds model vocab"
    tk = Tokenizer(models.Unigram(pieces, unk_id=2))
    tk.pre_tokenizer = pre_tokenizers.Metaspace()
    tk.decoder = decoders.Metaspace()
    tk.post_processor = processors.TemplateProcessing(
        single="$A </s>", pair="$A </s> $B </s>",
        special_tokens=[("</s>", 1)])
    tk.save(str(dirpath / "tokenizer.json"))
    (dirpath / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "T5TokenizerFast", "model_max_length": 512,
        "pad_token": "<pad>", "eos_token": "</s>", "unk_token": "<unk>"}))
    (dirpath / "special_tokens_map.json").write_text(json.dumps({
        "pad_token": "<pad>", "eos_token": "</s>", "unk_token": "<unk>"}))


def _write_clip_text(dirpath, tok, hidden, heads, proj):
    dirpath.mkdir(parents=True, exist_ok=True)
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=len(tok.vocab), hidden_size=hidden, intermediate_size=2 * hidden,
        num_hidden_layers=2, num_attention_heads=heads,
        max_position_embeddings=8, hidden_act="gelu", projection_dim=proj,
        eos_token_id=tok.eos_token_id, bos_token_id=tok.bos_token_id,
        pad_token_id=tok.eos_token_id)
    torch.manual_seed(hidden)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    save_file({k: v.numpy() for k, v in hf.state_dict().items()
               if "position_ids" not in k}, str(dirpath / "model.safetensors"))
    (dirpath / "config.json").write_text(json.dumps({
        "vocab_size": len(tok.vocab), "hidden_size": hidden,
        "num_hidden_layers": 2, "num_attention_heads": heads,
        "max_position_embeddings": 8, "intermediate_size": 2 * hidden,
        "hidden_act": "gelu", "projection_dim": proj,
        "eos_token_id": tok.eos_token_id}))


def _write_t5(dirpath, tok, d_model):
    dirpath.mkdir(parents=True, exist_ok=True)
    hf_cfg = transformers.T5Config(
        vocab_size=len(tok.vocab), d_model=d_model, d_kv=8, d_ff=2 * d_model,
        num_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj="gated-gelu",
        is_encoder_decoder=False, use_cache=False, dropout_rate=0.0)
    torch.manual_seed(1)
    hf = transformers.T5EncoderModel(hf_cfg).eval()
    save_file({k: v.numpy() for k, v in hf.state_dict().items()},
              str(dirpath / "model.safetensors"))
    (dirpath / "config.json").write_text(json.dumps({
        "vocab_size": len(tok.vocab), "d_model": d_model, "d_kv": 8,
        "d_ff": 2 * d_model, "num_layers": 2, "num_heads": 4,
        "relative_attention_num_buckets": 8,
        "relative_attention_max_distance": 20}))


def write_sd3_checkpoint(root, tok, t5_fast_tokenizer=False,
                         scheduler_cfg=None):
    """Fabricate a full tiny HF-layout SD3 checkpoint dir (shared by the
    from_pretrained / runner-CLI / serve --sd3 tests)."""
    joint = 48
    mmdit_cfg = MMDiTConfig(sample_size=8, patch_size=2, in_channels=4,
                            out_channels=4, num_layers=2, num_heads=4,
                            head_dim=8, joint_attention_dim=joint,
                            caption_projection_dim=32,
                            pooled_projection_dim=40, pos_embed_max_size=8)
    tf = MMDiT(mmdit_cfg)
    tf_params = tf.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.asarray(500.0), jnp.zeros((1, 20, joint)),
                        jnp.zeros((1, 40)))
    tdir = root / "transformer"
    tdir.mkdir(parents=True)
    save_file(invert_mmdit(tf_params["params"], mmdit_cfg),
              str(tdir / "model.safetensors"))
    (tdir / "config.json").write_text(json.dumps({
        "sample_size": 8, "patch_size": 2, "in_channels": 4,
        "out_channels": 4, "num_layers": 2, "num_attention_heads": 4,
        "attention_head_dim": 8, "joint_attention_dim": joint,
        "caption_projection_dim": 32, "pooled_projection_dim": 40,
        "pos_embed_max_size": 8}))

    vae_cfg = VAEConfig(latent_channels=4, block_out_channels=(8, 16),
                        layers_per_block=1, norm_num_groups=4,
                        scaling_factor=1.5305, shift_factor=0.0609,
                        sample_size=16)
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(0))
    vdir = root / "vae"
    vdir.mkdir()
    save_file(invert_vae(vae_params["params"], vae_cfg),
              str(vdir / "model.safetensors"))
    (vdir / "config.json").write_text(json.dumps({
        "latent_channels": 4, "block_out_channels": [8, 16],
        "layers_per_block": 1, "norm_num_groups": 4,
        "scaling_factor": 1.5305, "shift_factor": 0.0609, "sample_size": 16}))

    # text towers: clip-l (16d -> proj 16), bigG stand-in (16d -> proj 24),
    # t5 (d_model = joint)
    _write_clip_text(root / "text_encoder", tok, hidden=16, heads=4, proj=16)
    _write_clip_text(root / "text_encoder_2", tok, hidden=16, heads=2, proj=24)
    _write_t5(root / "text_encoder_3", tok, d_model=joint)
    _write_tokenizer(root / "tokenizer", tok, 8)
    _write_tokenizer(root / "tokenizer_2", tok, 8)
    if t5_fast_tokenizer:
        _write_t5_fast_tokenizer(root / "tokenizer_3",
                                 max_vocab=len(tok.vocab))
    else:
        _write_tokenizer(root / "tokenizer_3", tok, 12)
    if scheduler_cfg:
        sdir = root / "scheduler"
        sdir.mkdir()
        (sdir / "scheduler_config.json").write_text(json.dumps(scheduler_cfg))
    return root


def test_sd3_from_pretrained_and_generate(tmp_path):
    tok = _tiny_tokenizer()
    joint = 48
    root = tmp_path / "sd3"
    # the checkpoint's scheduler config must be honored, not the defaults
    write_sd3_checkpoint(root, tok, t5_fast_tokenizer=True,
                         scheduler_cfg={
                             "_class_name": "FlowMatchEulerDiscreteScheduler",
                             "num_train_timesteps": 1000, "shift": 1.75})

    pipe = SafeDiffusion3Pipeline.from_pretrained(str(root))
    assert pipe.scheduler.config.shift == 1.75
    pipe.max_sequence_length = 12
    # the AutoTokenizer branch must win over the CLIPTokenizer fallback
    assert isinstance(pipe.tokenizer_3, transformers.T5TokenizerFast)
    direct = transformers.T5TokenizerFast.from_pretrained(
        str(root / "tokenizer_3"))
    want_ids = direct(["a cat"], padding="max_length", max_length=12,
                      truncation=True)["input_ids"]
    np.testing.assert_array_equal(pipe._t5_ids(["a cat"], max_length=12),
                                  want_ids)
    assert np.asarray(want_ids).max() < len(tok.vocab)

    embeds, pooled = pipe.encode_prompt("a cat", "")
    assert embeds.shape == (2, 1, 8 + 12, joint)
    assert pooled.shape == (2, 1, 40)

    imgs = pipe("a cat", num_inference_steps=2, height=16, width=16, seed=3)
    assert imgs[0].shape == (16, 16, 3)


def test_run_nudity_sdv3_cli(tmp_path):
    """Full SD3 runner main(): fabricated checkpoint + bank + ONNX gate."""
    from tests.test_onnx_rt import _attr_int, _attr_ints, _model, _node, _tensor

    tok = _tiny_tokenizer()
    root = tmp_path / "sd3ckpt"
    write_sd3_checkpoint(root, tok)

    # negative bank + task yaml
    from PIL import Image
    rng = np.random.RandomState(0)
    bank = tmp_path / "bank" / "tiny"
    bank.mkdir(parents=True)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            bank / f"{i}.png")
    task_yaml = tmp_path / "task.yaml"
    task_yaml.write_text(f"""
repellency:
  method: kernel_fast
  n_embed: 2
  params: {{sigma: 2.75, scale: 0.03, beta_threshold: 0.5}}
data: {{name: nudity, root: {tmp_path / 'bank'}, class_info: tiny, size: 16}}
mean_processor: null
""")

    # tiny NudeNet-style ONNX gate (NHWC input)
    w = rng.randn(4, 3, 8, 8).astype(np.float32) * 0.1
    b = rng.randn(4).astype(np.float32)
    fw = rng.randn(2, 4).astype(np.float32)
    fb = np.array([0.1, -0.1], np.float32)
    nodes = [
        _node("Transpose", ["input"], ["nchw"], _attr_ints("perm", [0, 3, 1, 2])),
        _node("Conv", ["nchw", "w", "b"], ["c"],
              _attr_ints("strides", [8, 8]) + _attr_ints("kernel_shape", [8, 8])),
        _node("Relu", ["c"], ["r"]),
        _node("GlobalAveragePool", ["r"], ["g"]),
        _node("Flatten", ["g"], ["f"], _attr_int("axis", 1)),
        _node("Gemm", ["f", "fw", "fb"], ["l"], _attr_int("transB", 1)),
        _node("Softmax", ["l"], ["probs"], _attr_int("axis", 1)),
    ]
    inits = [_tensor("w", w), _tensor("b", b), _tensor("fw", fw),
             _tensor("fb", fb)]
    onnx_path = tmp_path / "nudenet.onnx"
    onnx_path.write_bytes(_model(nodes, inits, ["input"], ["probs"]))

    csv = tmp_path / "prompts.csv"
    csv.write_text("case_number,prompt,evaluation_seed\n0,a cat,7\n")

    from safe_denoiser_tpu.runners.sdv3 import main_nudity
    save_dir = tmp_path / "out"
    main_nudity(["--data", str(csv), "--save-dir", str(save_dir),
                 "--model_dir", str(root), "--task_config", str(task_yaml),
                 "--category", "nudity", "--nudenet-path", str(onnx_path),
                 "--num_inference_steps", "3", "--image_length", "16",
                 "--safree"])
    assert (save_dir / "detect_dict.json").exists()
    assert (save_dir / "logs.txt").exists()
    assert len(list((save_dir / "all").glob("*.png"))) == 1

    # artists-* branch: save-and-skip-eval, empty detect_dict (reference
    # run_nudity_sdv3.py:367-369,407) — no NudeNet gate needed
    artist_dir = tmp_path / "out_artist"
    main_nudity(["--data", str(csv), "--save-dir", str(artist_dir),
                 "--model_dir", str(root), "--task_config", str(task_yaml),
                 "--category", "artists-Test",
                 "--num_inference_steps", "2", "--image_length", "16"])
    assert (artist_dir / "all" / "0.png").exists()
    assert json.loads((artist_dir / "detect_dict.json").read_text()) == {}
