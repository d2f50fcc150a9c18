import argparse
import json

import yaml

from safe_denoiser_tpu.utils import load_yaml, read_json, save_combined_config


def test_read_json(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"erase_id": "std", "guidance_scale": 7.5}))
    cfg = read_json(str(p))
    assert cfg["erase_id"] == "std"


def test_load_yaml_task_config(tmp_path):
    p = tmp_path / "t.yaml"
    p.write_text(
        "repellency:\n  method: kernel_fast\n  n_embed: 16\n"
        "  params:\n    scale: 0.33\n    sigma: 3.15\n"
        "data:\n  name: nudity\n  root: datasets/nudity\n  class_info: i2p_sexual\n"
        "mean_processor:\n  dynamic_threshold: False\n  clip_denoised: True\n"
    )
    cfg = load_yaml(str(p))
    assert cfg["repellency"]["method"] == "kernel_fast"
    assert cfg["repellency"]["params"]["sigma"] == 3.15
    assert cfg["data"]["class_info"] == "i2p_sexual"


def test_save_combined_config(tmp_path):
    args = argparse.Namespace(data="x.csv", guidance_scale=7.5, logger=object())
    out = tmp_path / "config.yaml"
    save_combined_config(args, str(out), {"repellency": {"method": "kernel_fast"}})
    loaded = yaml.safe_load(out.read_text())
    assert loaded["data"] == "x.csv"
    assert loaded["repellency"]["method"] == "kernel_fast"
