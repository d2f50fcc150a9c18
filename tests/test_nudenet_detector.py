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


def _retinanet_style_graph():
    """Toy keras-retinanet-shaped graph: NHWC input -> Transpose -> conv
    backbone -> per-anchor box DECODE (Exp on sizes) -> NMS -> gathered
    boxes/scores/int32 labels — the op chain of the real detector_v2 export."""
    rs = np.random.RandomState(11)
    from tests.test_onnx_rt import _attr_ints as AI, _attr_int as A, _str, _ld

    def attr_str(name, s):
        return _ld(5, _str(1, name) + _str(4, s))

    n_anchors = 4
    w_conv = rs.randn(8, 3, 3, 3).astype(np.float32) * 0.1
    w_box = rs.randn(8, n_anchors * 4).astype(np.float32) * 0.05
    w_cls = rs.randn(8, n_anchors * 2).astype(np.float32) * 0.3
    # fixed anchor boxes [1, n_anchors, 4] (y1 x1 y2 x2)
    anchors = np.array([[[10, 10, 60, 60], [30, 30, 90, 90],
                         [5, 40, 55, 100], [40, 5, 100, 55]]],
                       dtype=np.float32)
    nodes = [
        _node("Transpose", ["input_1"], ["x"], AI("perm", [0, 3, 1, 2])),
        _node("Conv", ["x", "w_conv"], ["c"],
              AI("kernel_shape", [3, 3]) + AI("strides", [2, 2])
              + attr_str("auto_pad", "SAME_UPPER")),
        _node("Relu", ["c"], ["r"]),
        _node("GlobalAveragePool", ["r"], ["gap"]),
        _node("Reshape", ["gap", "shape2"], ["feat"]),          # [1, 8]
        # box deltas -> decoded sizes via Exp (retinanet decode idiom)
        _node("MatMul", ["feat", "w_box"], ["deltas0"]),
        _node("Reshape", ["deltas0", "shape_b"], ["deltas"]),   # [1, A, 4]
        _node("Mul", ["deltas", "scale_d"], ["deltas_s"]),
        _node("Exp", ["deltas_s"], ["grow"]),
        _node("Mul", ["anchors", "grow"], ["boxes"]),           # [1, A, 4]
        _node("MatMul", ["feat", "w_cls"], ["cls0"]),
        _node("Reshape", ["cls0", "shape_c"], ["cls1"]),        # [1, A, 2]
        _node("Sigmoid", ["cls1"], ["probs"]),
        _node("Transpose", ["probs"], ["scores_cf"], AI("perm", [0, 2, 1])),
        _node("NonMaxSuppression",
              ["boxes", "scores_cf", "maxout", "iou_thr"], ["sel"]),
        # gather the selected (batch, class, box) rows (topo order — the
        # interpreter is a straight-line executor like real exports)
        _node("Squeeze", ["boxes", "sq0_ax"], ["boxes_sq"]),
        _node("Slice", ["sel", "sl_st", "sl_en", "sl_ax"], ["box_idx"]),
        _node("Squeeze", ["box_idx", "sq_ax"], ["box_idx1"]),
        _node("Gather", ["boxes_sq", "box_idx1"], ["out_boxes0"],
              A("axis", 0)),
        _node("Unsqueeze", ["out_boxes0", "unsq_ax"], ["out_boxes"]),
        _node("Slice", ["sel", "cl_st", "cl_en", "sl_ax"], ["cls_idx"]),
        _node("Squeeze", ["cls_idx", "sq_ax"], ["cls_idx1"]),
        _node("Cast", ["cls_idx1"], ["labels0"], A("to", 6)),
        _node("Unsqueeze", ["labels0", "unsq_ax"], ["out_labels"]),
        _node("Squeeze", ["probs", "sq0_ax"], ["probs_sq"]),
        _node("Unsqueeze", ["box_idx1", "unsq1_ax"], ["box_idx1_2d"]),
        _node("Unsqueeze", ["cls_idx1", "unsq1_ax"], ["cls_idx1_2d"]),
        _node("Concat", ["box_idx1_2d", "cls_idx1_2d"], ["gnd_idx"],
              A("axis", 1)),
        _node("GatherND", ["probs_sq", "gnd_idx"], ["out_scores0"]),
        _node("Unsqueeze", ["out_scores0", "unsq_ax"], ["out_scores"]),
    ]
    inits = [
        _tensor("w_conv", w_conv), _tensor("w_box", w_box),
        _tensor("w_cls", w_cls), _tensor("anchors", anchors),
        _tensor("scale_d", np.full((1, n_anchors, 4), 0.2, np.float32)),
        _tensor("shape2", np.array([0, -1], dtype=np.int64)),
        _tensor("shape_b", np.array([1, n_anchors, 4], dtype=np.int64)),
        _tensor("shape_c", np.array([1, n_anchors, 2], dtype=np.int64)),
        _tensor("maxout", np.array([n_anchors], dtype=np.int64)),
        _tensor("iou_thr", np.array([0.5], dtype=np.float32)),
        _tensor("sl_st", np.array([2], dtype=np.int64)),
        _tensor("sl_en", np.array([3], dtype=np.int64)),
        _tensor("sl_ax", np.array([1], dtype=np.int64)),
        _tensor("cl_st", np.array([1], dtype=np.int64)),
        _tensor("cl_en", np.array([2], dtype=np.int64)),
        _tensor("sq_ax", np.array([1], dtype=np.int64)),
        _tensor("sq0_ax", np.array([0], dtype=np.int64)),
        _tensor("unsq_ax", np.array([0], dtype=np.int64)),
        _tensor("unsq1_ax", np.array([1], dtype=np.int64)),
    ]
    model = _model(nodes, inits, ["input_1"],
                   ["out_boxes", "out_scores", "out_labels"])
    return model


def test_detector_through_retinanet_style_graph(tmp_path):
    """End-to-end Detector.detect over a graph using the real detector
    export's op chain (conv -> Exp box decode -> NMS -> gathers)."""
    model = _retinanet_style_graph()
    ckpt = tmp_path / "detector_v2.onnx"
    ckpt.write_bytes(model)
    rs = np.random.RandomState(1)
    img = rs.randint(0, 255, (120, 100, 3), dtype=np.uint8)
    img_path = str(tmp_path / "i.png")
    Image.fromarray(img).save(img_path)

    det = Detector(str(ckpt))
    res = det.detect(img_path, min_prob=0.0)
    assert len(res) >= 1
    for r in res:
        assert set(r) == {"box", "score", "label"}
        assert 0.0 <= r["score"] <= 1.0
        assert r["label"] in det.classes
        assert len(r["box"]) == 4
    # min_prob above all sigmoids filters everything
    assert det.detect(img_path, min_prob=1.01) == []
