"""Data-layer tests: image bank loading + prompt-CSV sniffing rules."""

import os

import numpy as np
import pandas as pd
import pytest

from safe_denoiser_tpu.data import (
    get_dataset,
    get_transform,
    iter_prompt_cases,
    load_image_bank,
)
from safe_denoiser_tpu.data.prompts import load_prompt_csv

PIL = pytest.importorskip("PIL")
from PIL import Image


def _write_images(root, class_info, n, size=32):
    d = root / class_info
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        arr = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
        ext = "png" if i % 2 == 0 else "jpg"
        Image.fromarray(arr).save(d / f"img_{i:03d}.{ext}")


def test_image_bank_shape_and_range(tmp_path):
    _write_images(tmp_path, "i2p_sexual", 5)
    bank = load_image_bank("nudity", str(tmp_path), "i2p_sexual", size=64)
    assert bank.shape == (5, 3, 64, 64)
    assert bank.dtype == np.float32
    assert bank.min() >= -1.0 and bank.max() <= 1.0


def test_artists_dataset_png_only(tmp_path):
    _write_images(tmp_path, "munch", 4)
    ds = get_dataset("artists", root=str(tmp_path), class_info="munch",
                     transforms=get_transform(size=32))
    assert len(ds) == 2  # only the pngs


def test_prompt_sniffing_i2p_schema():
    df = pd.DataFrame({
        "case_number": [10, 11, 12],
        "prompt": ["a cat", 123, "a dog"],         # row 1 broken (non-str)
        "evaluation_seed": [7, 8, 9],
        "guidance": [6.0, 6.0, 8.0],
        "categories": ["sexual, harassment", "x", "violence"],
    })
    cases = list(iter_prompt_cases(df))
    assert len(cases) == 2
    assert cases[0].case_number == 10 and cases[0].seed == 7
    assert cases[0].guidance == 6.0
    assert cases[0].categories == ["sexual", "harassment"]
    assert cases[1].prompt == "a dog"


def test_prompt_sniffing_mma_and_ringabell():
    df = pd.DataFrame({"adv_prompt": ["x y z"]})
    c = next(iter_prompt_cases(df, default_guidance=7.5))
    assert c.prompt == "x y z" and c.seed == 42 and c.guidance == 7.5

    df2 = pd.DataFrame({"sensitive prompt": ["bad"], "normal prompt": ["ok"]})
    c2 = next(iter_prompt_cases(df2))
    assert c2.prompt == "bad"


def test_valid_case_numbers_slicing():
    df = pd.DataFrame({"prompt": [f"p{i}" for i in range(10)],
                       "case_number": list(range(10))})
    cases = list(iter_prompt_cases(df, valid_case_numbers="2,3"))
    assert [c.prompt for c in cases] == ["p2", "p3", "p4"]


# ---------------------------------------------------------------------------
# Checked-in 5-row fixtures with the REAL reference schemas
# (reference datasets/*.csv headers; synthetic benign row content) — pins the
# sniffing against the actual column names/fallbacks, VERDICT round-1 item 8.
# ---------------------------------------------------------------------------

_FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "csv")


def _fix(name):
    return load_prompt_csv(os.path.join(_FIXDIR, name))


def test_fixture_ring_a_bell_schema():
    cases = list(iter_prompt_cases(_fix("nudity-ring-a-bell.csv")))
    assert len(cases) == 5
    # sensitive column wins; no seed/guidance columns -> 42 / 7.5
    assert cases[0].prompt.endswith("detail one.")
    assert cases[0].case_number == 0 and cases[0].seed == 42
    assert cases[0].guidance == 7.5
    assert cases[0].categories == ["nudity"]


def test_fixture_i2p_and_nudity_schema():
    for name in ("i2p.csv", "nudity.csv"):
        cases = list(iter_prompt_cases(_fix(name), default_guidance=7.5))
        assert len(cases) == 5, name
        c = cases[0]
        # case_number column wins over the row index; evaluation_seed used;
        # evaluation_guidance is NOT the 'guidance' column -> default
        assert c.seed == int(_fix(name)["evaluation_seed"].iloc[0])
        assert c.case_number == int(_fix(name)["case_number"].iloc[0])
        assert c.guidance == 7.5
    i2p = list(iter_prompt_cases(_fix("i2p.csv")))
    assert i2p[0].categories == ["violence", "self-harm"]
    assert i2p[2].categories == ["shocking", "illegal activity"]


def test_fixture_mma_schema():
    cases = list(iter_prompt_cases(_fix("mma-diffusion-nsfw-adv-prompts.csv")))
    assert len(cases) == 5
    assert cases[0].prompt == "synthetic adversarial token soup one"
    assert cases[1].case_number == 1      # row index fallback
    assert cases[0].seed == 42            # no seed column


def test_fixture_copro_schema():
    cases = list(iter_prompt_cases(_fix("CoPro_balanced.csv")))
    assert len(cases) == 5
    assert cases[0].prompt == "synthetic copro unsafe one"
    assert cases[0].case_number == 28731  # idx column wins
    assert cases[2].categories == ["nudity"]  # 'category' != 'categories'


def test_fixture_coco30k_schema():
    cases = list(iter_prompt_cases(_fix("coco_30k.csv"), default_guidance=7.5))
    assert len(cases) == 5
    assert cases[0].prompt.startswith("A bicycle replica")
    assert cases[0].case_number == 0 and cases[0].seed == 41337


def test_shard_cases_partition_disjoint_and_covering():
    """Fleet mode: shards are balanced round-robin, disjoint, covering, and
    deterministic; out-of-range ids are rejected loudly."""
    from safe_denoiser_tpu.data import shard_cases

    df = pd.DataFrame({
        "case_number": list(range(7)),
        "prompt": [f"p{i}" for i in range(7)],
        "evaluation_seed": list(range(7)),
    })
    full = [c.case_number for c in iter_prompt_cases(df)]
    shards = [[c.case_number for c in
               shard_cases(iter_prompt_cases(df), 3, k)] for k in range(3)]
    assert shards == [[0, 3, 6], [1, 4], [2, 5]]
    assert sorted(sum(shards, [])) == full
    # num_shards=1 is the identity
    assert [c.case_number
            for c in shard_cases(iter_prompt_cases(df), 1, 0)] == full
    # the partition indexes the ENUMERATION, not case_number: a broken row
    # (skipped by the sniffer on every shard) must not unbalance shards
    df_broken = pd.DataFrame({
        "case_number": list(range(7)),
        "prompt": [f"p{i}" if i != 1 else 123 for i in range(7)],  # row 1
        "evaluation_seed": list(range(7)),                # broken (non-str)
    })
    s0 = [c.case_number for c in
          shard_cases(iter_prompt_cases(df_broken), 2, 0)]
    s1 = [c.case_number for c in
          shard_cases(iter_prompt_cases(df_broken), 2, 1)]
    assert sorted(s0 + s1) == [0, 2, 3, 4, 5, 6]
    assert abs(len(s0) - len(s1)) <= 1

    import pytest as _pytest
    with _pytest.raises(ValueError):
        list(shard_cases(iter_prompt_cases(df), 2, 2))
    with _pytest.raises(ValueError):
        list(shard_cases(iter_prompt_cases(df), 0, 0))


def test_hf_coco_dataset_branch(tmp_path):
    """--hf_dataset_dir surface (reference run_coco30k.py:284-285 +
    410-414): a local save_to_disk dir AND a parquet file both load, cap at
    the limit, drop the pixel column, and flow through iter_prompt_cases's
    recaption branch (prompt = ORIGINAL caption, case# = image_id)."""
    import datasets

    from safe_denoiser_tpu.data import iter_prompt_cases, load_hf_coco_dataset

    rows = {
        "image_id": [101, 102, 103],
        "caption": ["a cat", "a dog", "a bus"],
        "recaption": ["a fluffy cat", "a brown dog", "a red bus"],
        # stand-in for the pixel column (real rows carry a PIL image)
        "image": [[0, 1], [2, 3], [4, 5]],
    }
    ds = datasets.Dataset.from_dict(rows)

    d_disk = tmp_path / "hf_disk"
    ds.save_to_disk(str(d_disk))
    p_parq = tmp_path / "coco.parquet"
    ds.remove_columns(["image"]).to_parquet(str(p_parq))

    for src in (str(d_disk), str(p_parq)):
        df = load_hf_coco_dataset(src, limit=2)
        assert len(df) == 2
        assert "image" not in df.columns
        cases = list(iter_prompt_cases(df))
        assert [c.prompt for c in cases] == ["a cat", "a dog"]  # caption,
        assert [c.case_number for c in cases] == [101, 102]     # not recaption
        assert all(c.seed == 42 and c.guidance == 7.5 for c in cases)

    # a dir of parquet shards
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    ds.remove_columns(["image"]).to_parquet(str(shard_dir / "part0.parquet"))
    df = load_hf_coco_dataset(str(shard_dir))
    assert len(df) == 3

    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        load_hf_coco_dataset(str(tmp_path / "empty_nowhere"))
