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


def test_frechet_distance_healthy_path_closed_form():
    """Low-dim full-rank Gaussians: the sqrtm is exact and must NOT take the
    eps-retry (any LinAlgWarning here is an error). Closed form for diagonal
    covariances: |mu1-mu2|^2 + sum(s1 + s2 - 2*sqrt(s1*s2))."""
    import warnings

    from scipy.linalg import LinAlgWarning

    from safe_denoiser_tpu.evals.metrics import frechet_distance

    mu1, mu2 = np.zeros(2), np.array([1.0, 2.0])
    s1, s2 = np.diag([1.0, 4.0]), np.diag([9.0, 1.0])
    want = (1 + 4) + (1 + 9 - 2 * 3) + (4 + 1 - 2 * 2)
    with warnings.catch_warnings():
        warnings.simplefilter("error", LinAlgWarning)
        got = frechet_distance(mu1, s1, mu2, s2)
    assert got == pytest.approx(want, rel=1e-9)


@pytest.mark.filterwarnings(
    # 4 images x 2048-dim features is rank-deficient BY DESIGN (the test
    # exercises the plumbing; the healthy sqrtm path is pinned above)
    "ignore:Matrix is singular")
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
