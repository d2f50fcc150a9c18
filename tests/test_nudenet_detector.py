"""NudeNet Detector host path on a structured toy detector graph.

The real detector_v2 checkpoint (keras-retinanet ONNX with in-graph NMS) is
not obtainable here; this pins everything around the session: caffe-mode BGR
preprocessing, aspect-preserving resize scale, dtype-based output sniffing
(labels int32 / scores scalar-float / boxes array-float in ANY output
order), min_prob filtering, box /scale rescaling, class-name mapping, and
censor() box blanking (reference nudenet/detector.py:133-191,
detector_utils.py:7-61)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from PIL import Image  # noqa: E402

from safe_denoiser_tpu.evals.nudenet_detector import (  # noqa: E402
    Detector, _ssim, compute_resize_scale, is_similar_frame,
    preprocess_image)
from tests.test_onnx_rt import (  # noqa: E402
    _attr_float, _attr_int, _attr_ints, _model, _node, _tensor)


def _toy_detector_graph():
    rs = np.random.RandomState(3)
    w_box = (rs.rand(3, 12).astype(np.float32) * 5 + 1)
    w_score = rs.randn(3, 3).astype(np.float32) * 0.1
    w_label = rs.rand(3, 3).astype(np.float32) * 3
    nodes = [
        _node("Transpose", ["input_1"], ["x"], _attr_ints("perm", [0, 3, 1, 2])),
        _node("GlobalAveragePool", ["x"], ["gap"]),
        _node("Reshape", ["gap", "shape2"], ["feat"]),
        _node("MatMul", ["feat", "w_score"], ["s0"]),
        _node("Sigmoid", ["s0"], ["scores"]),
        _node("MatMul", ["feat", "w_box"], ["b0"]),
        _node("Reshape", ["b0", "shape_boxes"], ["boxes"]),
        _node("MatMul", ["feat", "w_label"], ["l0"]),
        _node("Clip", ["l0"], ["l1"],
              _attr_float("min", 0.0) + _attr_float("max", 2.0)),
        _node("Cast", ["l1"], ["labels"], _attr_int("to", 6)),  # int32
    ]
    inits = [_tensor("w_box", w_box), _tensor("w_score", w_score),
             _tensor("w_label", w_label),
             _tensor("shape2", np.array([0, -1], dtype=np.int64)),
             _tensor("shape_boxes", np.array([1, 3, 4], dtype=np.int64))]
    # scores FIRST, labels LAST: the reference sniffs outputs by dtype/shape,
    # never by position
    model = _model(nodes, inits, ["input_1"], ["scores", "boxes", "labels"])
    weights = {"w_box": w_box, "w_score": w_score, "w_label": w_label}
    return model, weights


def _expected(img_path, weights, min_prob):
    image, scale = preprocess_image(img_path)
    feat = image.transpose(2, 0, 1).reshape(3, -1).mean(axis=1)[None]  # [1,3]
    scores = 1 / (1 + np.exp(-(feat @ weights["w_score"])))
    boxes = (feat @ weights["w_box"]).reshape(1, 3, 4) / scale
    labels = np.clip(feat @ weights["w_label"], 0.0, 2.0).astype(np.int32)
    out = []
    for box, score, label in zip(boxes[0], scores[0], labels[0]):
        if score < min_prob:
            continue
        out.append({"box": [int(c) for c in box.astype(int)],
                    "score": float(score), "label": int(label)})
    return out


def test_detector_detect_and_censor(tmp_path):
    model, weights = _toy_detector_graph()
    ckpt = tmp_path / "detector.onnx"
    ckpt.write_bytes(model)
    classes = tmp_path / "classes"
    classes.write_text("ALPHA\nBETA\nGAMMA\n\n")

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (64, 48, 3), dtype=np.uint8)
    img_path = str(tmp_path / "img.png")
    Image.fromarray(img).save(img_path)

    det = Detector(str(ckpt), str(classes))
    assert det.classes == ["ALPHA", "BETA", "GAMMA"]

    got = det.detect(img_path, min_prob=0.4)
    want = _expected(img_path, weights, 0.4)
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g["box"] == w["box"]
        np.testing.assert_allclose(g["score"], w["score"], atol=1e-5)
        assert g["label"] == ["ALPHA", "BETA", "GAMMA"][w["label"]]

    # min_prob=1.1 filters everything
    assert det.detect(img_path, min_prob=1.1) == []

    # censor blanks the detected boxes (black rectangles)
    out_path = str(tmp_path / "censored.png")
    det.censor(img_path, out_path=out_path)
    assert (tmp_path / "censored.png").exists()

    # default classes kick in when no classes file is given
    det2 = Detector(str(ckpt))
    assert det2.classes[0] == "EXPOSED_ANUS" and len(det2.classes) == 16


def test_resize_scale_and_fast_mode_semantics():
    # min_side governs unless max_side caps (reference detector_utils.py:33-44)
    assert compute_resize_scale((100, 200, 3), 800, 1333) == 1333 / 200
    assert compute_resize_scale((400, 420, 3), 800, 1333) == 800 / 400


def test_frame_similarity_ssim():
    rs = np.random.RandomState(1)
    a = rs.randint(0, 255, (64, 64), dtype=np.uint8)
    assert _ssim(a, a) == pytest.approx(1.0)
    b = rs.randint(0, 255, (64, 64), dtype=np.uint8)
    assert _ssim(a, b) < 0.2
    # 3-channel + resize path
    a3 = np.stack([a] * 3, axis=-1)
    assert is_similar_frame(a3, a3.copy(), thresh=0.9)
    assert not is_similar_frame(a3, np.stack([b] * 3, -1), thresh=0.5)
