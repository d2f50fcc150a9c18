"""Runner CLI end-to-end: tiny HF-layout checkpoint on disk → run_nudity
main() → images + logs + config.yaml outputs. Exercises from_pretrained
config loading, weight conversion, the task-YAML repellency assembly, and
the artists- output path (NudeNet/Q16 weights aren't available in CI)."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from safetensors.numpy import save_file

from safe_denoiser_tpu.models import (
    AutoencoderKL, CLIPTextConfig, CLIPTextModel, UNet2DCondition,
    UNetConfig, VAEConfig,
)
from tests.test_e2e_pipeline import _tiny_tokenizer


def _write_checkpoint(tmp_path, tok):
    """Create a tiny HF-layout SD checkpoint from HF torch modules so the
    state-dict layout is authentic."""
    import torch
    import transformers

    root = tmp_path / "ckpt"
    # -- text encoder (HF CLIPText) --
    tdir = root / "text_encoder"
    tdir.mkdir(parents=True)
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=len(tok.vocab), hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu",
        projection_dim=32, eos_token_id=tok.eos_token_id,
        bos_token_id=tok.bos_token_id, pad_token_id=tok.eos_token_id)
    torch.manual_seed(0)
    hf_text = transformers.CLIPTextModel(hf_cfg).eval()
    save_file({k: v.numpy() for k, v in hf_text.state_dict().items()
               if "position_ids" not in k},
              str(tdir / "model.safetensors"))
    (tdir / "config.json").write_text(json.dumps({
        "vocab_size": len(tok.vocab), "hidden_size": 32,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "max_position_embeddings": 16, "intermediate_size": 64,
        "hidden_act": "quick_gelu", "projection_dim": 32,
        "eos_token_id": tok.eos_token_id}))

    # -- unet / vae: init flax tiny models, convert to torch layout --
    unet_cfg = UNetConfig(sample_size=8, block_out_channels=(16, 32),
                          layers_per_block=1, cross_attention_dim=32,
                          num_attention_heads=4, norm_num_groups=8)
    vae_cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                        norm_num_groups=4, sample_size=32)
    rng = jax.random.PRNGKey(0)
    unet = UNet2DCondition(unet_cfg)
    unet_params = unet.init(rng, jnp.zeros((1, 16, 16, 4)), jnp.asarray(1),
                            jnp.zeros((1, 16, 32)))
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 32, 32, 3)), rng)

    from tests.helpers_invert import invert_unet, invert_vae
    udir = root / "unet"
    udir.mkdir()
    save_file(invert_unet(unet_params["params"], unet_cfg),
              str(udir / "model.safetensors"))
    (udir / "config.json").write_text(json.dumps({
        "sample_size": 8, "block_out_channels": [16, 32],
        "layers_per_block": 1, "cross_attention_dim": 32,
        "attention_head_dim": 4, "norm_num_groups": 8}))
    vdir = root / "vae"
    vdir.mkdir()
    save_file(invert_vae(vae_params["params"], vae_cfg),
              str(vdir / "model.safetensors"))
    (vdir / "config.json").write_text(json.dumps({
        "block_out_channels": [8, 16], "layers_per_block": 1,
        "norm_num_groups": 4, "latent_channels": 4,
        "scaling_factor": 0.18215, "sample_size": 32}))

    # -- tokenizer files --
    tkdir = root / "tokenizer"
    tkdir.mkdir()
    (tkdir / "vocab.json").write_text(json.dumps(tok.vocab))
    (tkdir / "tokenizer_config.json").write_text(
        json.dumps({"model_max_length": 16}))
    merges = sorted(tok.bpe_ranks, key=tok.bpe_ranks.get)
    (tkdir / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n")
    return root


def test_run_nudity_cli_artists(tmp_path, monkeypatch):
    tok = _tiny_tokenizer()
    ckpt = _write_checkpoint(tmp_path, tok)

    # negative bank + task yaml
    from PIL import Image
    bank = tmp_path / "bank" / "tiny"
    bank.mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            bank / f"{i}.png")
    task_yaml = tmp_path / "task.yaml"
    task_yaml.write_text(f"""
repellency:
  method: kernel_fast
  n_embed: 2
  params:
    sigma: 100.0
    scale: 0.33
    beta_threshold: 1.0e-12
data:
  name: artists
  root: {tmp_path / 'bank'}
  class_info: tiny
  size: 32
mean_processor: null
""")
    csv = tmp_path / "prompts.csv"
    csv.write_text("case_number,prompt,evaluation_seed\n0,a cat,7\n")

    save_dir = tmp_path / "out"
    from safe_denoiser_tpu.runners.nudity import main
    main(["--data", str(csv), "--save-dir", str(save_dir),
          "--erase_id", "std_rep", "--model_dir", str(ckpt),
          "--task_config", str(task_yaml),
          "--category", "artists-Test",
          "--num_inference_steps", "3", "--image_length", "32"])

    assert (save_dir / "all" / "0.png").exists()
    assert (save_dir / "logs.txt").exists()
    logs = (save_dir / "logs.txt").read_text()
    assert "Repellency method : kernel_fast" in logs

    # --shard_bank: same run with the negative bank M-sharded over the
    # 8-device test mesh (parallel/bank.py) — images must match the
    # replicated run up to psum reassociation in the uint8 rounding
    from PIL import Image as PILImage
    sharded_dir = tmp_path / "out_sharded"
    main(["--data", str(csv), "--save-dir", str(sharded_dir),
          "--erase_id", "std_rep", "--model_dir", str(ckpt),
          "--task_config", str(task_yaml),
          "--category", "artists-Test", "--shard_bank",
          "--num_inference_steps", "3", "--image_length", "32"])
    logs2 = (sharded_dir / "logs.txt").read_text()
    assert "Repellency bank sharded over 8 devices" in logs2
    a = np.asarray(PILImage.open(save_dir / "all" / "0.png"), dtype=np.int32)
    b = np.asarray(PILImage.open(sharded_dir / "all" / "0.png"),
                   dtype=np.int32)
    assert np.abs(a - b).max() <= 1


def test_run_artist_cli(tmp_path):
    tok = _tiny_tokenizer()
    ckpt = _write_checkpoint(tmp_path, tok)
    save_dir = tmp_path / "out_munch"
    from safe_denoiser_tpu.runners.artist import main
    main("munch", ["--save-dir", str(save_dir), "--erase_id", "std",
                   "--model_dir", str(ckpt), "--num-samples", "2",
                   "--num_inference_steps", "2", "--image_length", "32"])
    assert (save_dir / "all" / "0.png").exists()
    assert (save_dir / "all" / "1.png").exists()
    # the reference dumps the merged config + (empty) detect_dict even for
    # artist runs (run_munch.py tail = run_ann_graham.py:428-431)
    assert (save_dir / "config.yaml").exists()
    assert json.loads((save_dir / "detect_dict.json").read_text()) == {}


def test_run_artist_cli_fleet_shards_samples(tmp_path):
    """Fleet mode on the artist runners: the sample-index loop round-robins
    across shards (disjoint + covering, global filenames) instead of every
    shard regenerating all samples (review finding r3s13)."""
    tok = _tiny_tokenizer()
    ckpt = _write_checkpoint(tmp_path, tok)
    from safe_denoiser_tpu.runners.artist import main
    got = {}
    for k in (0, 1):
        save_dir = tmp_path / f"out_shard{k}"
        main("munch", ["--save-dir", str(save_dir), "--erase_id", "std",
                       "--model_dir", str(ckpt), "--num-samples", "3",
                       "--num_inference_steps", "2", "--image_length", "32",
                       "--num_shards", "2", "--shard_id", str(k)])
        got[k] = {p.name for p in (save_dir / "all").glob("*.png")}
    assert got[0] == {"0.png", "2.png"}
    assert got[1] == {"1.png"}
    # out-of-range shard ids are rejected loudly, like the CSV runners
    import pytest as _pytest
    with _pytest.raises(ValueError, match="shard_id"):
        main("munch", ["--save-dir", str(tmp_path / "bad"),
                       "--erase_id", "std", "--model_dir", str(ckpt),
                       "--num-samples", "1", "--num_inference_steps", "2",
                       "--image_length", "32",
                       "--num_shards", "2", "--shard_id", "5"])


def test_scheduler_config_loaded_from_checkpoint(tmp_path):
    import json as _json

    from safe_denoiser_tpu.pipeline.diffusion import _ddpm_config_from_checkpoint
    d = tmp_path / "scheduler"
    d.mkdir()
    (d / "scheduler_config.json").write_text(_json.dumps({
        "num_train_timesteps": 1000, "beta_start": 0.00085,
        "beta_end": 0.012, "beta_schedule": "scaled_linear",
        "clip_sample": False, "prediction_type": "epsilon",
        "steps_offset": 1}))
    cfg = _ddpm_config_from_checkpoint(str(d))
    assert cfg.clip_sample is False and cfg.steps_offset == 1
    # absent dir -> defaults (clip_sample False per SD-v1.x)
    cfg2 = _ddpm_config_from_checkpoint(str(tmp_path / "missing"))
    assert cfg2.clip_sample is False


def test_run_copro_cli_q16(tmp_path, monkeypatch):
    """CoPro runner end-to-end with a fabricated Q16 gate (tiny CLIP vision
    tower + 2-prompt embedding file)."""
    import pickle

    import torch
    import transformers

    from safe_denoiser_tpu.models import CLIPVisionConfig
    from safe_denoiser_tpu.models.weights import convert_clip_vision

    tok = _tiny_tokenizer()
    ckpt = _write_checkpoint(tmp_path, tok)

    # tiny vision tower (HF layout -> converted params), injected via
    # monkeypatched build_eval since the CLI flag expects ViT-L/14 weights
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, hidden_act="quick_gelu",
        projection_dim=16)
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    vcfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                            num_layers=2, num_heads=4, intermediate_size=64,
                            hidden_act="quick_gelu", projection_dim=16)
    vparams = convert_clip_vision(
        {k: v.numpy() for k, v in hf.state_dict().items()}, vcfg)

    prompts_p = tmp_path / "q16.p"
    prompts_p.write_bytes(pickle.dumps(
        np.random.RandomState(0).randn(2, 16).astype(np.float32)))

    from safe_denoiser_tpu.evals.q16 import Q16Eval
    import safe_denoiser_tpu.runners.copro as copro_mod

    def fake_build_eval(args):
        return Q16Eval(str(prompts_p), vision_params=vparams,
                       vision_config=vcfg)
    monkeypatch.setattr(copro_mod, "build_eval", fake_build_eval)

    csv = tmp_path / "copro.csv"
    csv.write_text("idx,unsafe_prompt,safe_prompt,concept,category\n"
                   "0,a cat,a hat,x,sexual\n")
    save_dir = tmp_path / "out_copro"
    copro_mod.main(["--data", str(csv), "--save-dir", str(save_dir),
                    "--erase_id", "std", "--model_dir", str(ckpt),
                    "--num_inference_steps", "2", "--image_length", "32"])
    assert (save_dir / "detect_dict.json").exists()
    assert (save_dir / "all" / "0.png").exists()
    logs = (save_dir / "logs.txt").read_text()
    assert "toxicity pred" in logs


def test_run_coco30k_batched(tmp_path):
    tok = _tiny_tokenizer()
    ckpt = _write_checkpoint(tmp_path, tok)
    csv = tmp_path / "coco.csv"
    csv.write_text("case_number,prompt,evaluation_seed\n"
                   "10,a cat,1\n11,a dog,2\n12,a cat dog,3\n")
    save_dir = tmp_path / "out_coco"
    from safe_denoiser_tpu.runners.coco30k import main
    main(["--data", str(csv), "--save-dir", str(save_dir),
          "--erase_id", "std", "--model_dir", str(ckpt),
          "--num_inference_steps", "2", "--image_length", "32",
          "--batch_size", "2"])
    for case in (10, 11, 12):
        assert (save_dir / "all" / f"{case}.png").exists()
    assert "Wall-Clock Time for batch of 2" in (save_dir / "logs.txt").read_text()


def test_bank_image_length_mismatch_fails_fast():
    """A task-YAML bank resized to a different side than --image_length must
    fail BEFORE the bank VAE-encode with an actionable message (a 512-side
    bank against a tiny test model previously burned tens of GB in the VAE
    mid-block attention before dying on a cryptic reshape deep in the scan).
    The cache-import path skips the check: the bank images are unused there."""
    from safe_denoiser_tpu.runners.common import (
        check_bank_matches_image_length)

    refs_512 = np.zeros((2, 3, 512, 512), np.float32)
    with pytest.raises(SystemExit) as ei:
        check_bank_matches_image_length(
            refs_512, {"params": {"sigma": 1.0}}, 32)
    msg = str(ei.value)
    assert "data.size: 32" in msg and "--image_length 512" in msg

    # matched side: fine
    check_bank_matches_image_length(
        np.zeros((2, 3, 32, 32), np.float32), {"params": {}}, 32)
    # cache-imported proj refs: bank images unused, mismatch tolerated
    check_bank_matches_image_length(
        refs_512, {"params": {"cache_proj_ref": True}}, 32)


def test_run_nudity_fleet_shards_disjoint_and_covering(tmp_path):
    """Fleet mode (--num_shards/--shard_id): two shard processes of the same
    benchmark must generate disjoint case sets whose union is the full set
    (round-robin by enumeration order), each into its own save dir."""
    tok = _tiny_tokenizer()
    ckpt = _write_checkpoint(tmp_path, tok)
    csv = tmp_path / "prompts.csv"
    csv.write_text("case_number,prompt,evaluation_seed\n"
                   "0,a cat,7\n1,a dog,8\n2,a bird,9\n")

    from safe_denoiser_tpu.runners.nudity import main
    outs = []
    for k in range(2):
        save_dir = tmp_path / f"out_shard{k}"
        main(["--data", str(csv), "--save-dir", str(save_dir),
              "--erase_id", "std", "--model_dir", str(ckpt),
              "--category", "artists-Test",
              "--num_inference_steps", "2", "--image_length", "32",
              "--num_shards", "2", "--shard_id", str(k)])
        outs.append({p.name for p in (save_dir / "all").glob("*.png")})
    assert outs[0] == {"0.png", "2.png"}
    assert outs[1] == {"1.png"}

    # invalid shard indices are rejected loudly
    with pytest.raises(ValueError, match="out of range"):
        main(["--data", str(csv), "--save-dir", str(tmp_path / "bad"),
              "--erase_id", "std", "--model_dir", str(ckpt),
              "--category", "artists-Test",
              "--num_inference_steps", "2", "--image_length", "32",
              "--num_shards", "2", "--shard_id", "2"])


def test_run_nudity_overlapped_loop_matches_serial(tmp_path, monkeypatch):
    """The overlapped runner loop (dispatch-ahead + grouped NudeNet gate,
    SDT_RUNNER_DEPTH/SDT_EVAL_GROUP) changes SCHEDULING only: decisions,
    detect_dict, and the PNG bytes must be identical to the reference's
    fully-serial order (depth=1, group=1)."""
    from tests.test_nudenet_graph import _build_graph_and_torch

    tok = _tiny_tokenizer()
    ckpt = _write_checkpoint(tmp_path, tok)
    model_bytes, _ = _build_graph_and_torch()
    onnx_path = tmp_path / "nudenet.onnx"
    onnx_path.write_bytes(model_bytes)

    csv = tmp_path / "prompts.csv"
    csv.write_text(
        "case_number,prompt,evaluation_seed,categories\n"
        "0,a cat,7,sexual\n1,a dog,9,sexual\n2,a bird,3,violence\n"
        "3,a fish,5,sexual\n4,a horse,2,violence\n")

    from safe_denoiser_tpu.runners.nudity import main

    outs = {}
    for name, depth, group in (("serial", "1", "1"), ("overlap", "3", "2")):
        monkeypatch.setenv("SDT_RUNNER_DEPTH", depth)
        monkeypatch.setenv("SDT_EVAL_GROUP", group)
        save_dir = tmp_path / f"out_{name}"
        main(["--data", str(csv), "--save-dir", str(save_dir),
              "--erase_id", "std", "--model_dir", str(ckpt),
              "--category", "nudity", "--nudenet-path", str(onnx_path),
              "--num_inference_steps", "3", "--image_length", "32"])
        pngs = {p.name: p.read_bytes()
                for p in (save_dir / "all").glob("*.png")}
        detect = json.loads((save_dir / "detect_dict.json").read_text())
        outs[name] = (pngs, detect)
        # every case produced exactly one routed copy (safe/ xor unsafe/)
        routed = {p.name for p in (save_dir / "safe").glob("*.png")} | \
                 {p.name for p in (save_dir / "unsafe").glob("*.png")}
        assert routed == set(pngs) and len(pngs) == 5

    assert set(outs["serial"][0]) == set(outs["overlap"][0])
    for k in outs["serial"][0]:
        assert outs["serial"][0][k] == outs["overlap"][0][k], k
    assert outs["serial"][1] == outs["overlap"][1]
