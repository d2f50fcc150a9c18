"""Path-based NudeNet classifier variants (evals/nudenet_classifier.py —
reference nudenet/classifier.py, lite_classifier.py, run_classify.py)."""

import numpy as np
import pytest

from safe_denoiser_tpu.evals.nudenet_classifier import (
    Classifier,
    LiteClassifier,
    load_images,
)


def _write_pngs(tmp_path, n=3, size=40, seed=0):
    from PIL import Image

    rs = np.random.RandomState(seed)
    paths = []
    for i in range(n):
        arr = rs.randint(0, 255, (size, size, 3), dtype=np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def test_load_images_semantics(tmp_path):
    """NEAREST resize → RGB float32 /255, failures skipped not raised
    (reference image_utils.py:117-143)."""
    paths = _write_pngs(tmp_path, n=2)
    bad = str(tmp_path / "missing.png")
    frames, kept = load_images(paths + [bad], (64, 64),
                               image_names=paths + [bad])
    assert kept == paths                  # the bad path was skipped
    assert frames.shape == (2, 64, 64, 3)
    assert frames.dtype == np.float32
    assert frames.max() <= 1.0 and frames.min() >= 0.0


def test_classifier_matches_nudeclassifier(tmp_path):
    """Path-based Classifier == the PIL-based NudeClassifier on the same
    images and graph (both reproduce the same preprocessing + model:
    classifier.py vs classify_pil.py differ only in the loading surface)."""
    from tests.test_nudenet_graph import _build_graph_and_torch

    from safe_denoiser_tpu.evals.nudenet import NudeClassifier

    model_bytes, _ = _build_graph_and_torch()
    mp = tmp_path / "cls.onnx"
    mp.write_bytes(model_bytes)
    paths = _write_pngs(tmp_path, n=3)

    c = Classifier(str(mp))
    got = c.classify(paths, batch_size=2)
    assert set(got) == set(paths)
    for v in got.values():
        assert set(v) == {"unsafe", "safe"}
        assert abs(sum(v.values()) - 1.0) < 1e-5

    from PIL import Image
    pil = NudeClassifier(str(mp))
    want = pil.classify(images=[Image.open(p) for p in paths],
                        image_names=paths)
    for p in paths:
        for k in ("unsafe", "safe"):
            np.testing.assert_allclose(got[p][k], want[p][k], rtol=1e-5)

    # string path (non-list) form + empty-dir tolerance
    single = c.classify(paths[0])
    np.testing.assert_allclose(single[paths[0]]["unsafe"],
                               got[paths[0]]["unsafe"], rtol=1e-6)
    assert c.classify([str(tmp_path / "nope.png")]) == {}


def test_lite_classifier_nchw(tmp_path):
    """LiteClassifier feeds NCHW (the reference's rollaxis before cv2.dnn)
    — verified against a real torch.onnx-exported NCHW classifier."""
    torch = pytest.importorskip("torch")
    from tests.test_onnx_torch_export import SepConvNet, _export

    torch.manual_seed(0)
    m = SepConvNet().eval()
    with torch.no_grad():
        m.bn.running_mean.normal_()
        m.bn.running_var.uniform_(0.5, 2.0)
    mp = tmp_path / "lite.onnx"
    _export(m, (torch.randn(1, 3, 32, 32),), mp,
            input_names=["input"], output_names=["prob"])

    paths = _write_pngs(tmp_path, n=2, size=32)
    lite = LiteClassifier(str(mp))
    got = lite.classify(paths, size=(32, 32))
    assert set(got) == set(paths)
    frames, _ = load_images(paths, (32, 32), image_names=paths)
    with torch.no_grad():
        want = m(torch.from_numpy(np.rollaxis(frames, 3, 1))).numpy()
    for i, p in enumerate(paths):
        np.testing.assert_allclose(got[p]["unsafe"], want[i][0], atol=1e-5)
        np.testing.assert_allclose(got[p]["safe"], want[i][1], atol=1e-5)
    # string form
    one = lite.classify(paths[0], size=(32, 32))
    assert set(one) == {paths[0]}


def test_classifier_video(tmp_path):
    """classify_video: interest-frame sampling + per-frame preds keyed by
    frame index, with fps/length metadata (classifier.py:39-95)."""
    cv2 = pytest.importorskip("cv2")
    from tests.test_nudenet_graph import _build_graph_and_torch

    model_bytes, _ = _build_graph_and_torch()
    mp = tmp_path / "cls.onnx"
    mp.write_bytes(model_bytes)

    vp = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"MJPG"), 4.0, (48, 48))
    if not w.isOpened():
        pytest.skip("cv2 VideoWriter backend unavailable")
    rs = np.random.RandomState(0)
    for i in range(8):
        # alternate two very different frames so similarity pruning keeps >1
        frame = rs.randint(0, 255, (48, 48, 3), dtype=np.uint8) if i % 2 \
            else np.zeros((48, 48, 3), dtype=np.uint8)
        w.write(frame)
    w.release()

    c = Classifier(str(mp))
    out = c.classify_video(vp)
    assert out["metadata"]["video_path"] == vp
    assert out["metadata"]["video_length"] >= 8
    assert len(out["preds"]) >= 1
    for v in out["preds"].values():
        assert set(v) == {"unsafe", "safe"}


def test_run_classify_cli_skip_generation(tmp_path, capsys):
    """run_classify.py surface: --skip_generation classifies an existing
    dir and prints the reference's count/rate lines (run_classify.py:56-67)."""
    from tests.test_nudenet_graph import _build_graph_and_torch

    from safe_denoiser_tpu.runners.classify import main

    model_bytes, _ = _build_graph_and_torch()
    mp = tmp_path / "cls.onnx"
    mp.write_bytes(model_bytes)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    _write_pngs(img_dir, n=3)

    cnt, rate = main(["--model_dir", "unused", "--nudenet-path", str(mp),
                      "--img_dir", str(img_dir), "--skip_generation",
                      "--threshold", "0.0"])
    assert cnt == 3 and rate == 1.0      # threshold 0 → every image counts
    outp = capsys.readouterr().out
    assert "Nude cnt:" in outp and "Nude rate:" in outp
