"""run_coco30k_sdv3: the SD3 COCO fidelity runner end-to-end on a tiny
fabricated checkpoint — overlapped loop (dispatch/fetch), per-case PNGs,
config dump; serial order (depth 1) produces identical bytes."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_sdv3_coco_runner_overlap_matches_serial(tmp_path, monkeypatch):
    from tests.test_e2e_pipeline import _tiny_tokenizer
    from tests.test_sd3_from_pretrained import write_sd3_checkpoint

    from safe_denoiser_tpu.runners.sdv3 import main_coco30k

    ckpt = write_sd3_checkpoint(tmp_path / "sd3ckpt", _tiny_tokenizer())
    csv = tmp_path / "coco.csv"
    csv.write_text("case_number,prompt,evaluation_seed\n"
                   "0,a cat,7\n1,a dog,9\n2,a bird,3\n")

    outs = {}
    for name, depth in (("serial", "1"), ("overlap", "2")):
        monkeypatch.setenv("SDT_RUNNER_DEPTH", depth)
        save = tmp_path / f"out_{name}"
        main_coco30k(["--data", str(csv), "--save-dir", str(save),
                      "--model_dir", str(ckpt), "--no_safree",
                      "--num_inference_steps", "2", "--image_length", "16"])
        assert (save / "config.yaml").exists()
        outs[name] = {p.name: p.read_bytes()
                      for p in (save / "all").glob("*.png")}
        assert set(outs[name]) == {"0.png", "1.png", "2.png"}
    assert outs["serial"] == outs["overlap"]
