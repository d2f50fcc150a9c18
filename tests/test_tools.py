"""Tooling tests: log parsing, data prep, grids, profiling utils."""

import numpy as np
import pytest

from safe_denoiser_tpu.tools.data_prep import (
    make_image_grid,
    organize_by_category,
    parse_copro_json,
    prompt_word_stats,
    sample_coco_subset,
    select_longest_prompts,
)
from safe_denoiser_tpu.tools.logs import parse_log, parse_log_file_to_csv
from safe_denoiser_tpu.utils.images import horz_stack, vert_stack
from safe_denoiser_tpu.utils.profiling import StepTimer

SAMPLE_LOG = """
2026-01-01 - INFO - Seed: 7, Iter: 0, Case#: 12: target prompt: a cat
2026-01-01 - INFO - ---------- Repellency applied at timestep 981.0 ----------
2026-01-01 - INFO - ---------- Repellency applied at timestep 801.0 ----------
2026-01-01 - INFO - Optimized image is unsafe: False, toxicity pred: 0.123
2026-01-01 - INFO - Wall-Clock Time for image generation (Case#: 12): 3.21 seconds
2026-01-01 - INFO - Seed: 42, Iter: 1, Case#: 13: target prompt: a dog
2026-01-01 - INFO - Optimized image is unsafe: True, toxicity pred: 0.877
"""


def test_parse_log_records():
    recs = parse_log(SAMPLE_LOG)
    assert len(recs) == 2
    assert recs[0].case_number == "12" and recs[0].seed == 7
    assert recs[0].unsafe is False and abs(recs[0].pred - 0.123) < 1e-9
    assert recs[0].wall_clock_s == 3.21
    assert recs[0].repellency_timesteps == [981.0, 801.0]
    assert recs[1].unsafe is True


def test_parse_log_to_csv(tmp_path):
    log = tmp_path / "logs.txt"
    log.write_text(SAMPLE_LOG)
    out = tmp_path / "scores.csv"
    n = parse_log_file_to_csv(str(log), str(out))
    assert n == 2
    import pandas as pd
    df = pd.read_csv(out)
    assert list(df["case_number"]) == [12, 13]
    assert df["n_repellency_steps"][0] == 2


def test_organize_and_grid(tmp_path):
    from PIL import Image
    src = tmp_path / "src"
    src.mkdir()
    for name in ("0_sexual.png", "1_violence.png", "2_sexual-blood.png"):
        Image.new("RGB", (16, 16), "red").save(src / name)
    counts = organize_by_category(str(src), str(tmp_path / "org"),
                                  {"sexual": ["sexual"], "violence": ["violence"]})
    assert counts == {"sexual": 2, "violence": 1}
    grid = make_image_grid([str(src / "0_sexual.png")] * 3,
                           str(tmp_path / "grid.png"), cols=2, cell=16,
                           blur_radius=1.0)
    assert grid.size == (32, 32)


def test_copro_json_and_coco_subset(tmp_path):
    import json

    import pandas as pd
    jf = tmp_path / "copro.json"
    jf.write_text(json.dumps([{"unsafe_prompt": "bad", "safe_prompt": "ok",
                               "concept": "x", "category": "sexual"}]))
    df = parse_copro_json(str(jf), str(tmp_path / "copro.csv"))
    assert list(df.columns) == ["idx", "unsafe_prompt", "safe_prompt",
                                "concept", "category"]

    coco = tmp_path / "coco.csv"
    pd.DataFrame({"prompt": [f"p{i}" for i in range(30)],
                  "case_number": range(30)}).to_csv(coco, index=False)
    sub = sample_coco_subset(str(coco), str(tmp_path / "coco10.csv"), n=10)
    assert len(sub) == 10

    stats = prompt_word_stats(str(coco))
    assert stats["n"] == 30 and stats["max"] == 1


def test_select_longest_prompts(tmp_path):
    import pandas as pd

    csv = tmp_path / "i2p.csv"
    pd.DataFrame({"prompt": ["x" * n for n in range(1, 21)],
                  "case_number": range(20)}).to_csv(csv, index=False)
    sub = select_longest_prompts(str(csv), str(tmp_path / "top.csv"),
                                 top_frac=0.1)
    # 0.9-quantile of lengths 1..20 is 18.1 -> rows with len >= 18.1
    assert list(sub["case_number"]) == [18, 19]
    assert (tmp_path / "top.csv").exists()


def test_stacks_and_timer():
    a = np.zeros((4, 3, 3), np.uint8)
    b = np.zeros((4, 5, 3), np.uint8)
    assert horz_stack([a, b]).shape == (4, 8, 3)
    assert vert_stack([a.transpose(1, 0, 2), b.transpose(1, 0, 2)]).shape[1] == 4

    t = StepTimer(sync=False)
    t.start()
    t.stop()
    assert t.summary()["n"] == 1


def test_merge_detect_dicts_exact():
    """Fleet-mode merge must equal the single-process aggregation exactly
    (counts re-derived from ratio*size, no averaging-of-averages)."""
    from safe_denoiser_tpu.runners.common import DetectAggregator
    from safe_denoiser_tpu.tools.logs import merge_detect_dicts

    cases = [(["sexual"], True, 0.9), (["sexual", "violence"], False, 0.2),
             (["violence"], True, 0.7), (["sexual"], True, 0.8),
             (["harassment"], False, 0.1)]
    full = DetectAggregator()
    sh = [DetectAggregator(), DetectAggregator()]
    for i, (cats, unsafe, pred) in enumerate(cases):
        full.add(cats, unsafe, pred)
        sh[i % 2].add(cats, unsafe, pred)
    merged = merge_detect_dicts([a.finalize() for a in sh])
    want = full.finalize()
    assert merged["toxic_size"] == want["toxic_size"]
    for cat, r in want["toxic_ratio"].items():
        assert merged["toxic_ratio"][cat] == pytest.approx(r)
    for cat, r in want["toxic_pred_ratio"].items():
        assert merged["toxic_pred_ratio"][cat] == pytest.approx(r)
    assert sorted(merged["unsafe"]) == sorted(want["unsafe"])


def test_merge_detect_dict_files_cli(tmp_path):
    import json
    import subprocess
    import sys

    from safe_denoiser_tpu.runners.common import DetectAggregator

    paths = []
    for k in range(2):
        a = DetectAggregator()
        a.add(["sexual"], k == 0, 0.5 + k / 10)
        p = tmp_path / f"shard{k}.json"
        p.write_text(json.dumps(a.finalize()))
        paths.append(str(p))
    out = tmp_path / "merged.json"
    r = subprocess.run(
        [sys.executable, "-m", "safe_denoiser_tpu.tools.logs", "merge",
         str(out), *paths],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    merged = json.loads(out.read_text())
    assert merged["toxic_size"]["sexual"] == 2
    assert merged["toxic_ratio"]["sexual"] == pytest.approx(0.5)
    assert merged["toxic_ratio"]["average"] == pytest.approx(0.5)
