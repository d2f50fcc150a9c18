"""CLI surface checks: every run_*.py parser builds and exposes the
reference's flags; --config JSON feeds argparse defaults (3-tier config)."""

import json

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
