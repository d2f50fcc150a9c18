"""CLI surface checks: every run_*.py parser builds and exposes the
reference's flags; --config JSON feeds argparse defaults (3-tier config)."""

import json
import os

import pytest

from safe_denoiser_tpu.runners.common import base_parser


def test_base_parser_flags():
    parser, _ = base_parser("t")
    args = parser.parse_args([
        "--data", "x.csv", "--save-dir", "out", "--erase_id", "std",
        "--num_inference_steps", "10", "--guidance_scale", "3.5",
        "--safree", "-svf", "-lra", "--re_attn_t", "0,20",
        "--safe_level", "MAX", "--valid_case_numbers", "0,5",
        "--nudity_thr", "0.6", "--freeu_hyp", "1.2-1.4-0.9-0.2",
    ])
    assert args.safree and args.self_validation_filter
    assert args.latent_re_attention
    assert args.guidance_scale == 3.5
    assert args.safe_level == "MAX"


def test_config_json_becomes_defaults(tmp_path, monkeypatch):
    cfg = {"erase_id": "safree_neg_prompt_rep", "guidance_scale": 5.0,
           "safree": True, "svf": True, "lra": True, "image_length": 256}
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    monkeypatch.setattr("sys.argv", ["prog", "--config", str(path)])
    parser, loaded = base_parser("t")
    args = parser.parse_args(["--config", str(path)])
    assert loaded["erase_id"] == "safree_neg_prompt_rep"
    assert args.erase_id == "safree_neg_prompt_rep"
    assert args.guidance_scale == 5.0
    assert args.safree is True and args.image_length == 256
    # CLI still overrides the JSON default
    args2 = parser.parse_args(["--config", str(path), "--erase_id", "std"])
    assert args2.erase_id == "std"


def test_shipped_base_configs_load():
    import glob

    from safe_denoiser_tpu.pipeline.diffusion import ERASE_SPECS
    from safe_denoiser_tpu.utils.config import load_yaml, read_json

    base = sorted(glob.glob("configs/base/*/*.json"))
    assert len(base) == 18
    for p in base:
        cfg = read_json(p)
        assert cfg["erase_id"] in ERASE_SPECS, (p, cfg["erase_id"])

    tasks = sorted(glob.glob("configs/*/*.yaml"))
    assert len(tasks) >= 8
    for p in tasks:
        t = load_yaml(p)
        assert "repellency" in t and "data" in t and "mean_processor" in t
        assert "params" in t["repellency"]


def test_evaluate_entry_scripts_run(tmp_path):
    """Drive both evaluate_* entry scripts' main() on tiny fixtures
    (random-init towers; reference evaluate_coco30k_fid_clip.py /
    evaluate_copro_aes_clip.py CLI surface). In-process: the axon plugin
    sometimes ignores JAX_PLATFORMS=cpu in subprocesses (CLAUDE.md)."""
    import importlib.util
    import sys

    import numpy as np
    from PIL import Image

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rs = np.random.RandomState(0)
    sample = tmp_path / "run" / "all"
    ref = tmp_path / "ref"
    sample.mkdir(parents=True)
    ref.mkdir()
    for i in range(3):
        Image.fromarray(rs.randint(0, 255, (64, 64, 3), np.uint8)).save(
            sample / f"{i}.png")
        Image.fromarray(rs.randint(0, 255, (64, 64, 3), np.uint8)).save(
            ref / f"{i}.png")

    def load(name):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(root, name + ".py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    coco = load("evaluate_coco30k_fid_clip")
    coco.main(["--sample_dir", str(sample), "--dataset_root", str(ref),
               "--allow_random_init"])
    assert (tmp_path / "run" / "metrics_org_coco30k_10k.yaml").exists()

    # copro script: both optional weight flags absent -> parses and returns
    # without touching weights (the reference requires real weights here)
    copro = load("evaluate_copro_aes_clip")
    copro.main(["--sample_dir", str(sample)])
