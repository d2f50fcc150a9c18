"""Offline evaluator smoke tests: FID/KID + IS over tiny image dirs with a
random-init Inception tower (weights paths are runtime inputs; the metric
plumbing and YAML outputs are what's under test)."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from safe_denoiser_tpu.evals.offline import (
    evaluate_fid,
    evaluate_inception_score,
    list_images,
    load_image,
)


def _write_images(d, n, seed):
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            d / f"{i}.png")


@pytest.fixture(scope="module")
def image_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("fid")
    _write_images(root / "run" / "all", 4, 0)
    _write_images(root / "ref", 4, 1)
    return root


def test_list_and_load(image_dirs):
    paths = list_images(str(image_dirs / "ref"))
    assert len(paths) == 4
    img = load_image(paths[0], 299)
    assert img.shape == (299, 299, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_evaluate_fid_and_is(image_dirs):
    res = evaluate_fid(str(image_dirs / "run" / "all"),
                       str(image_dirs / "ref"), allow_random_init=True)
    assert set(res) == {"fid", "kid", "log_kid"}
    assert np.isfinite(res["fid"]) and res["fid"] >= 0
    assert (image_dirs / "run" / "metrics_org_coco30k_10k.yaml").exists()

    res2 = evaluate_inception_score(str(image_dirs / "run" / "all"),
                                    allow_random_init=True)
    assert res2["inception_score"] >= 1.0
    # identical dirs -> FID exactly 0
    res3 = evaluate_fid(str(image_dirs / "ref"), str(image_dirs / "ref"),
                        save_yaml=False, allow_random_init=True)
    with pytest.raises(ValueError):
        evaluate_fid(str(image_dirs / "ref"), str(image_dirs / "ref"),
                     save_yaml=False)
    assert abs(res3["fid"]) < 1e-3
