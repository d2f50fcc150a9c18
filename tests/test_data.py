"""Data-layer tests: image bank loading + prompt-CSV sniffing rules."""

import numpy as np
import pandas as pd
import pytest

from safe_denoiser_tpu.data import (
    get_dataset,
    get_transform,
    iter_prompt_cases,
    load_image_bank,
)

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
