"""ONNX interpreter tests: hand-encoded protobuf models vs. torch math.

No onnx/onnxruntime in the image, so the test encodes ModelProto wire format
directly (the same field numbers onnx_rt decodes) — this exercises both the
parser and the op interpreter end to end.
"""

import struct

import numpy as np
import pytest

from safe_denoiser_tpu.evals.onnx_rt import InferenceSession, parse_model, run_graph

torch = pytest.importorskip("torch")


# -- minimal protobuf encoder ------------------------------------------------

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _ld(num: int, payload: bytes) -> bytes:  # length-delimited
    return _field(num, 2, _varint(len(payload)) + payload)


def _str(num: int, s: str) -> bytes:
    return _ld(num, s.encode())


def _tensor(name: str, arr: np.ndarray) -> bytes:
    dtype = {np.dtype("float32"): 1, np.dtype("int64"): 7}[arr.dtype]
    msg = b"".join(_field(1, 0, _varint(d)) for d in arr.shape)
    msg += _field(2, 0, _varint(dtype))
    msg += _str(8, name)
    msg += _ld(9, arr.tobytes())
    return msg


def _attr_ints(name: str, vals) -> bytes:
    return _ld(5, _str(1, name) +
               b"".join(_field(8, 0, _varint(v)) for v in vals))


def _attr_int(name: str, v: int) -> bytes:
    return _ld(5, _str(1, name) + _field(3, 0, _varint(v)))


def _attr_float(name: str, v: float) -> bytes:
    return _ld(5, _str(1, name) + _field(2, 5, struct.pack("<f", v)))


def _attr_str(name: str, s: str) -> bytes:
    return _ld(5, _str(1, name) + _ld(4, s.encode()))


def _node(op: str, inputs, outputs, attrs: bytes = b"") -> bytes:
    msg = b"".join(_str(1, i) for i in inputs)
    msg += b"".join(_str(2, o) for o in outputs)
    msg += _str(4, op)
    msg += attrs
    return _ld(1, msg)


def _value_info(name: str) -> bytes:
    return _str(1, name)


def _model(nodes: list[bytes], initializers: list[bytes],
           inputs: list[str], outputs: list[str]) -> bytes:
    graph = b"".join(nodes)
    graph += b"".join(_ld(5, t) for t in initializers)
    graph += b"".join(_ld(11, _value_info(n)) for n in inputs)
    graph += b"".join(_ld(12, _value_info(n)) for n in outputs)
    return _ld(7, graph)


def test_cnn_pipeline_matches_torch(tmp_path):
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1).eval()
    bn = torch.nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_()
        bn.bias.normal_()
    fc = torch.nn.Linear(8 * 8 * 8, 5).eval()

    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        h = torch.relu(bn(conv(x)))
        h = torch.nn.functional.max_pool2d(h, 2)
        want = torch.softmax(fc(h.flatten(1)), dim=1).numpy()

    nodes = [
        _node("Conv", ["x", "w", "b"], ["c1"],
              _attr_ints("strides", [2, 2]) + _attr_ints("pads", [1, 1, 1, 1])
              + _attr_ints("kernel_shape", [3, 3])),
        _node("BatchNormalization",
              ["c1", "bn_s", "bn_b", "bn_m", "bn_v"], ["b1"],
              _attr_float("epsilon", 1e-5)),
        _node("Relu", ["b1"], ["r1"]),
        _node("MaxPool", ["r1"], ["p1"],
              _attr_ints("kernel_shape", [2, 2]) + _attr_ints("strides", [2, 2])),
        _node("Flatten", ["p1"], ["f1"], _attr_int("axis", 1)),
        _node("Gemm", ["f1", "fc_w", "fc_b"], ["g1"], _attr_int("transB", 1)),
        _node("Softmax", ["g1"], ["y"], _attr_int("axis", 1)),
    ]
    inits = [
        _tensor("w", conv.weight.detach().numpy()),
        _tensor("b", conv.bias.detach().numpy()),
        _tensor("bn_s", bn.weight.detach().numpy()),
        _tensor("bn_b", bn.bias.detach().numpy()),
        _tensor("bn_m", bn.running_mean.numpy()),
        _tensor("bn_v", bn.running_var.numpy()),
        _tensor("fc_w", fc.weight.detach().numpy()),
        _tensor("fc_b", fc.bias.detach().numpy()),
    ]
    model_bytes = _model(nodes, inits, ["x"], ["y"])
    path = tmp_path / "model.onnx"
    path.write_bytes(model_bytes)

    sess = InferenceSession(str(path))
    assert [i.name for i in sess.get_inputs()] == ["x"]
    out = sess.run(None, {"x": x.numpy()})[0]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_grouped_conv_and_avgpool():
    torch.manual_seed(1)
    conv = torch.nn.Conv2d(4, 8, 3, padding=1, groups=2).eval()
    x = torch.randn(1, 4, 8, 8)
    with torch.no_grad():
        want = torch.nn.functional.avg_pool2d(conv(x), 2).numpy()
    nodes = [
        _node("Conv", ["x", "w", "b"], ["c"],
              _attr_ints("pads", [1, 1, 1, 1]) + _attr_int("group", 2)
              + _attr_ints("kernel_shape", [3, 3])),
        _node("AveragePool", ["c"], ["y"],
              _attr_ints("kernel_shape", [2, 2]) + _attr_ints("strides", [2, 2])),
    ]
    inits = [_tensor("w", conv.weight.detach().numpy()),
             _tensor("b", conv.bias.detach().numpy())]
    graph = parse_model(_model(nodes, inits, ["x"], ["y"]))
    out = run_graph(graph, {"x": x.numpy()})[0]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_pad_opset11_constant_value_and_modes():
    x = np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4)
    pads = np.array([0, 0, 1, 1, 0, 0, 1, 1], dtype=np.int64)

    # opset-11+: fill value arrives as input 2, not the `value` attribute
    nodes = [_node("Pad", ["x", "pads", "cv"], ["y"],
                   _ld(5, _str(1, "mode") + _str(4, "constant")))]
    inits = [_tensor("pads", pads),
             _tensor("cv", np.array(5.0, dtype=np.float32).reshape(()))]
    graph = parse_model(_model(nodes, inits, ["x"], ["y"]))
    out = run_graph(graph, {"x": x})[0]
    want = np.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)], constant_values=5.0)
    np.testing.assert_array_equal(out, want)

    # reflect / edge modes
    for mode in ("reflect", "edge"):
        nodes = [_node("Pad", ["x", "pads"], ["y"],
                       _ld(5, _str(1, "mode") + _str(4, mode)))]
        graph = parse_model(_model(nodes, [_tensor("pads", pads)],
                                   ["x"], ["y"]))
        out = run_graph(graph, {"x": x})[0]
        want = np.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)], mode=mode)
        np.testing.assert_array_equal(out, want)

    # unsupported mode must raise, not silently zero-pad
    nodes = [_node("Pad", ["x", "pads"], ["y"],
                   _ld(5, _str(1, "mode") + _str(4, "wrap")))]
    graph = parse_model(_model(nodes, [_tensor("pads", pads)], ["x"], ["y"]))
    with pytest.raises(NotImplementedError):
        run_graph(graph, {"x": x})


def test_reshape_zero_copies_input_dim():
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    nodes = [_node("Reshape", ["x", "shape"], ["y"])]
    inits = [_tensor("shape", np.array([0, -1], dtype=np.int64))]
    graph = parse_model(_model(nodes, inits, ["x"], ["y"]))
    out = run_graph(graph, {"x": x})[0]
    assert out.shape == (2, 12)
    np.testing.assert_array_equal(out, x.reshape(2, 12))


def test_nude_classifier_empty_batch_guard():
    from safe_denoiser_tpu.evals.nudenet import NudeClassifier

    clf = NudeClassifier.__new__(NudeClassifier)  # no model needed
    clf.classify = lambda **kw: {}
    unsafe, pred = clf([])
    assert unsafe is False and pred == 0.0


def test_same_upper_auto_pad_and_sigmoid():
    torch.manual_seed(2)
    conv = torch.nn.Conv2d(2, 3, 3, stride=2).eval()
    x = torch.randn(1, 2, 9, 9)
    with torch.no_grad():
        # SAME_UPPER for 9/2 -> out 5, total pad = (5-1)*2+3-9 = 2 -> (1,1)
        want = torch.sigmoid(torch.nn.functional.conv2d(
            torch.nn.functional.pad(x, (1, 1, 1, 1)), conv.weight, conv.bias,
            stride=2)).numpy()
    auto = _ld(5, _str(1, "auto_pad") + _str(4, "SAME_UPPER"))
    nodes = [
        _node("Conv", ["x", "w", "b"], ["c"],
              _attr_ints("strides", [2, 2]) + auto
              + _attr_ints("kernel_shape", [3, 3])),
        _node("Sigmoid", ["c"], ["y"]),
    ]
    inits = [_tensor("w", conv.weight.detach().numpy()),
             _tensor("b", conv.bias.detach().numpy())]
    graph = parse_model(_model(nodes, inits, ["x"], ["y"]))
    out = run_graph(graph, {"x": x.numpy()})[0]
    np.testing.assert_allclose(out, want, atol=1e-5)


# ---------------------------------------------------------------------------
# detector-graph op set (TopK / NMS / Slice / box-decode elementwise) —
# the ops the real keras-retinanet NudeNet detector export needs
# ---------------------------------------------------------------------------


def _run_single(op, inputs, feeds, attrs=b"", n_outputs=1):
    outs = [f"o{k}" for k in range(n_outputs)]
    graph = parse_model(_model([_node(op, list(inputs), outs, attrs)],
                               [], [k for k in feeds], outs))
    return run_graph(graph, feeds, outs)


def test_elementwise_and_slice_ops():
    x = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    np.testing.assert_allclose(
        _run_single("Exp", ["x"], {"x": x})[0], np.exp(x), rtol=1e-6)
    np.testing.assert_allclose(
        _run_single("Log", ["x"], {"x": x})[0], np.log(x), rtol=1e-6)
    np.testing.assert_allclose(
        _run_single("Sqrt", ["x"], {"x": x})[0], np.sqrt(x), rtol=1e-6)
    np.testing.assert_allclose(
        _run_single("Pow", ["x", "y"], {"x": x, "y": np.float32(2.0)})[0],
        x ** 2, rtol=1e-6)
    got = _run_single("Where", ["c", "a", "b"],
                      {"c": x > 2, "a": x, "b": -x})[0]
    np.testing.assert_array_equal(got, np.where(x > 2, x, -x))
    got = _run_single("Greater", ["x", "y"],
                      {"x": x, "y": np.float32(2.5)})[0]
    np.testing.assert_array_equal(got, x > 2.5)

    # Slice: opset-10 input form with axes/steps (box-coordinate columns)
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    got = _run_single("Slice", ["x", "st", "en", "ax", "sp"],
                      {"x": data, "st": np.array([1], dtype=np.int64),
                       "en": np.array([4], dtype=np.int64),
                       "ax": np.array([2], dtype=np.int64),
                       "sp": np.array([2], dtype=np.int64)})[0]
    np.testing.assert_array_equal(got, data[:, :, 1:4:2])


def test_topk_matches_torch():
    torch.manual_seed(9)
    x = torch.randn(3, 17)
    want_v, want_i = torch.topk(x, 5, dim=1)
    vals, = _run_single("TopK", ["x", "k"],
                        {"x": x.numpy(), "k": np.array([5], dtype=np.int64)},
                        _attr_int("axis", 1), n_outputs=1)
    np.testing.assert_allclose(vals, want_v.numpy(), rtol=1e-6)
    # two-output form (values + indices)
    graph = parse_model(_model(
        [_node("TopK", ["x", "k"], ["v", "idx"], _attr_int("axis", 1))],
        [_tensor("k", np.array([5], dtype=np.int64))], ["x"], ["v", "idx"]))
    v, idx = run_graph(graph, {"x": x.numpy()}, ["v", "idx"])
    np.testing.assert_allclose(v, want_v.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(idx, want_i.numpy())


def _ref_nms(boxes, scores, iou_thr):
    """Plain greedy NMS on [S,4] y1x1y2x2 corners + [S] scores."""
    y1, x1, y2, x2 = boxes.T
    areas = (y2 - y1) * (x2 - x1)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size:
        b = order[0]
        keep.append(int(b))
        rest = order[1:]
        inter = (np.clip(np.minimum(y2[b], y2[rest])
                         - np.maximum(y1[b], y1[rest]), 0, None)
                 * np.clip(np.minimum(x2[b], x2[rest])
                           - np.maximum(x1[b], x1[rest]), 0, None))
        iou = inter / (areas[b] + areas[rest] - inter + 1e-12)
        order = rest[iou <= iou_thr]
    return keep


def test_non_max_suppression():
    rs = np.random.RandomState(2)
    n_boxes = 40
    centers = rs.rand(n_boxes, 2) * 10
    sizes = rs.rand(n_boxes, 2) * 3 + 0.5
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1).astype(np.float32)  # y1x1y2x2
    scores = rs.rand(1, 1, n_boxes).astype(np.float32)
    iou_thr = 0.4

    sel, = _run_single(
        "NonMaxSuppression",
        ["boxes", "scores", "maxout", "iou", "sthr"],
        {"boxes": boxes[None], "scores": scores,
         "maxout": np.array([n_boxes], dtype=np.int64),
         "iou": np.array([iou_thr], dtype=np.float32),
         "sthr": np.array([0.05], dtype=np.float32)})
    want = [b for b in _ref_nms(boxes, scores[0, 0], iou_thr)
            if scores[0, 0, b] > 0.05]
    assert sel.shape[1] == 3
    np.testing.assert_array_equal(sel[:, 2], want)
    assert (sel[:, 0] == 0).all() and (sel[:, 1] == 0).all()

    # max_output caps per class
    sel2, = _run_single(
        "NonMaxSuppression",
        ["boxes", "scores", "maxout"],
        {"boxes": boxes[None], "scores": scores,
         "maxout": np.array([3], dtype=np.int64)})
    assert sel2.shape[0] == 3


def test_gather_nd():
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    idx = np.array([[0, 1], [1, 2]], dtype=np.int64)
    got, = _run_single("GatherND", ["x", "i"], {"x": data, "i": idx})
    np.testing.assert_array_equal(got, data[[0, 1], [1, 2]])


def test_nms_max_out_zero_selects_nothing():
    # ONNX spec: max_output_boxes_per_class=0 (the default) selects NO boxes
    boxes = np.array([[[0, 0, 1, 1], [0, 0, 1, 1.1]]], dtype=np.float32)
    scores = np.array([[[0.9, 0.8]]], dtype=np.float32)
    sel, = _run_single("NonMaxSuppression", ["b", "s", "m"],
                       {"b": boxes, "s": scores,
                        "m": np.array([0], dtype=np.int64)})
    assert sel.shape == (0, 3)


def test_gather_nd_batch_dims_unsupported():
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    idx = np.array([[0, 1], [1, 2]], dtype=np.int64)
    with pytest.raises(NotImplementedError):
        _run_single("GatherND", ["x", "i"], {"x": data, "i": idx},
                    attrs=_attr_int("batch_dims", 1))


def test_reduce_axes_as_input():
    # opset-18 moved ReduceMean/ReduceMax axes to input 1
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    got, = _run_single("ReduceMean", ["x", "ax"],
                       {"x": x, "ax": np.array([1], dtype=np.int64)})
    np.testing.assert_allclose(got, x.mean(axis=1, keepdims=True))
    got, = _run_single("ReduceMax", ["x", "ax"],
                       {"x": x, "ax": np.array([0, 2], dtype=np.int64)})
    np.testing.assert_allclose(got, x.max(axis=(0, 2), keepdims=True))


def _attr_tensor(name: str, arr: np.ndarray) -> bytes:
    # AttributeProto.t = field 5 (parse_attribute reads it via parse_tensor)
    return _ld(5, _str(1, name) + _ld(5, _tensor("", arr)))


def test_variadic_and_reduce_ops():
    a = np.array([[1.0, -2.0], [3.0, 4.0]], dtype=np.float32)
    b = np.array([[0.5, 5.0], [-1.0, 2.0]], dtype=np.float32)
    c = np.array([[2.0, 0.0], [9.0, -3.0]], dtype=np.float32)
    feeds = {"a": a, "b": b, "c": c}
    np.testing.assert_array_equal(
        _run_single("Min", ["a", "b", "c"], feeds)[0],
        np.minimum(np.minimum(a, b), c))
    np.testing.assert_array_equal(
        _run_single("Max", ["a", "b", "c"], feeds)[0],
        np.maximum(np.maximum(a, b), c))
    np.testing.assert_allclose(
        _run_single("Sum", ["a", "b", "c"], feeds)[0], a + b + c, rtol=1e-6)

    np.testing.assert_allclose(
        _run_single("ReduceSum", ["a"], {"a": a},
                    attrs=_attr_ints("axes", [1]) + _attr_int("keepdims", 0)
                    )[0], a.sum(axis=1), rtol=1e-6)
    np.testing.assert_array_equal(
        _run_single("ReduceMin", ["a"], {"a": a})[0],
        a.min(keepdims=True))
    # opset-18 form: axes as input 2
    np.testing.assert_allclose(
        _run_single("ReduceProd", ["a", "ax"],
                    {"a": a, "ax": np.array([0], dtype=np.int64)})[0],
        a.prod(axis=0, keepdims=True), rtol=1e-6)

    got = _run_single("ArgMax", ["a"], {"a": a}, attrs=_attr_int("axis", 1))[0]
    np.testing.assert_array_equal(got, a.argmax(axis=1)[:, None])
    got = _run_single("ArgMin", ["a"], {"a": a},
                      attrs=_attr_int("keepdims", 0))[0]
    np.testing.assert_array_equal(got, a.argmin(axis=0))


def test_activation_ops_match_torch():
    x = np.linspace(-4.0, 4.0, 17, dtype=np.float32).reshape(1, 17)
    t = torch.from_numpy(x)
    cases = [
        ("LeakyRelu", _attr_float("alpha", 0.1),
         torch.nn.functional.leaky_relu(t, 0.1)),
        ("LeakyRelu", b"", torch.nn.functional.leaky_relu(t, 0.01)),
        ("Elu", b"", torch.nn.functional.elu(t)),
        ("HardSigmoid", _attr_float("alpha", 1 / 6) +
         _attr_float("beta", 0.5), torch.nn.functional.hardsigmoid(t)),
        ("Softplus", b"", torch.nn.functional.softplus(t)),
        ("Erf", b"", torch.erf(t)),
    ]
    for op, attrs, want in cases:
        got = _run_single(op, ["x"], {"x": x}, attrs=attrs)[0]
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)
    slope = np.array([0.25], dtype=np.float32)
    got = _run_single("PRelu", ["x", "s"], {"x": x, "s": slope})[0]
    np.testing.assert_allclose(
        got, torch.nn.functional.prelu(t, torch.from_numpy(slope)).numpy(),
        rtol=1e-6)


def test_rounding_logic_shape_ops():
    x = np.array([-1.5, -0.5, 0.5, 1.5, 2.5], dtype=np.float32)
    np.testing.assert_array_equal(
        _run_single("Floor", ["x"], {"x": x})[0], np.floor(x))
    np.testing.assert_array_equal(
        _run_single("Ceil", ["x"], {"x": x})[0], np.ceil(x))
    # ONNX Round is half-to-even: 0.5 -> 0, 1.5 -> 2, 2.5 -> 2
    np.testing.assert_array_equal(
        _run_single("Round", ["x"], {"x": x})[0],
        np.array([-2.0, -0.0, 0.0, 2.0, 2.0], dtype=np.float32))
    np.testing.assert_allclose(
        _run_single("Reciprocal", ["x"], {"x": x + 10})[0], 1 / (x + 10),
        rtol=1e-6)

    p = np.array([True, True, False, False])
    q = np.array([True, False, True, False])
    np.testing.assert_array_equal(
        _run_single("Not", ["p"], {"p": p})[0], ~p)
    np.testing.assert_array_equal(
        _run_single("And", ["p", "q"], {"p": p, "q": q})[0], p & q)
    np.testing.assert_array_equal(
        _run_single("Or", ["p", "q"], {"p": p, "q": q})[0], p | q)
    np.testing.assert_array_equal(
        _run_single("Xor", ["p", "q"], {"p": p, "q": q})[0], p ^ q)

    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_array_equal(
        _run_single("Expand", ["x", "s"],
                    {"x": data[:, :1], "s": np.array([2, 3, 4], np.int64)})[0],
        np.broadcast_to(data[:, :1], (2, 3, 4)))
    np.testing.assert_array_equal(
        _run_single("Tile", ["x", "r"],
                    {"x": data, "r": np.array([2, 1], np.int64)})[0],
        np.tile(data, (2, 1)))
    np.testing.assert_array_equal(
        _run_single("Range", ["s", "l", "d"],
                    {"s": np.float32(1.0), "l": np.float32(6.0),
                     "d": np.float32(2.0)})[0],
        np.arange(1.0, 6.0, 2.0, dtype=np.float32))
    np.testing.assert_array_equal(
        _run_single("ConstantOfShape", ["s"],
                    {"s": np.array([2, 3], np.int64)})[0],
        np.zeros((2, 3), np.float32))
    got = _run_single(
        "ConstantOfShape", ["s"], {"s": np.array([2], np.int64)},
        attrs=_attr_tensor("value", np.array([7.5], np.float32)))[0]
    np.testing.assert_array_equal(got, np.full((2,), 7.5, np.float32))


def test_split_forms():
    data = np.arange(14, dtype=np.float32).reshape(2, 7)
    # explicit split attr
    got = _run_single("Split", ["x"], {"x": data},
                      attrs=_attr_int("axis", 1) + _attr_ints("split", [3, 4]),
                      n_outputs=2)
    np.testing.assert_array_equal(got[0], data[:, :3])
    np.testing.assert_array_equal(got[1], data[:, 3:])
    # split sizes as input 2 (opset 13)
    got = _run_single("Split", ["x", "sp"],
                      {"x": data, "sp": np.array([5, 2], np.int64)},
                      attrs=_attr_int("axis", 1), n_outputs=2)
    np.testing.assert_array_equal(got[1], data[:, 5:])
    # equal parts from output arity: 7 over 3 -> ceil chunks [3, 3, 1]
    got = _run_single("Split", ["x"], {"x": data},
                      attrs=_attr_int("axis", 1), n_outputs=3)
    assert [g.shape[1] for g in got] == [3, 3, 1]
    np.testing.assert_array_equal(got[2], data[:, 6:])
    # ceil chunks that already cover the dim still yield n outputs
    # (6 over 4 -> [2, 2, 2, 0]); the node declares 4 output names and a
    # missing one would KeyError (or alias a stale value) downstream
    data6 = np.arange(12, dtype=np.float32).reshape(2, 6)
    got = _run_single("Split", ["x"], {"x": data6},
                      attrs=_attr_int("axis", 1), n_outputs=4)
    assert [g.shape[1] for g in got] == [2, 2, 2, 0]
    np.testing.assert_array_equal(got[1], data6[:, 2:4])


def test_resize_tf_half_pixel_for_nn():
    """tf2onnx emits tf_half_pixel_for_nn for TF nearest resizes with
    half_pixel_centers (the keras-retinanet/NudeNet detector family): the
    coordinate is (i+0.5)/scale with NO trailing -0.5 — lumping it with
    half_pixel shifts every row/column by one source pixel."""
    x = np.arange(4, dtype=np.float32).reshape(1, 1, 1, 4)
    attrs = (_attr_str("mode", "nearest")
             + _attr_str("coordinate_transformation_mode",
                         "tf_half_pixel_for_nn")
             + _attr_str("nearest_mode", "round_prefer_floor"))
    got = _run_single(
        "Resize", ["x", "roi", "scales"],
        {"x": x, "roi": np.array([], np.float32),
         "scales": np.array([1, 1, 1, 2], np.float32)}, attrs=attrs)[0]
    # spec indices ceil((i+0.5)/2 - 0.5) = [0,1,1,2,2,3,3,3]
    np.testing.assert_array_equal(
        got.reshape(-1), np.array([0, 1, 1, 2, 2, 3, 3, 3], np.float32))
    # and plain half_pixel keeps the -0.5 form: [0,0,1,1,2,2,3,3]
    attrs_hp = (_attr_str("mode", "nearest")
                + _attr_str("coordinate_transformation_mode", "half_pixel")
                + _attr_str("nearest_mode", "round_prefer_floor"))
    got_hp = _run_single(
        "Resize", ["x", "roi", "scales"],
        {"x": x, "roi": np.array([], np.float32),
         "scales": np.array([1, 1, 1, 2], np.float32)}, attrs=attrs_hp)[0]
    np.testing.assert_array_equal(
        got_hp.reshape(-1), np.array([0, 0, 1, 1, 2, 2, 3, 3], np.float32))


def test_instance_normalization_matches_torch():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 4, 5).astype(np.float32)
    scale = rs.rand(3).astype(np.float32) + 0.5
    bias = rs.randn(3).astype(np.float32)
    got = _run_single("InstanceNormalization", ["x", "s", "b"],
                      {"x": x, "s": scale, "b": bias},
                      attrs=_attr_float("epsilon", 1e-5))[0]
    want = torch.nn.functional.instance_norm(
        torch.from_numpy(x), weight=torch.from_numpy(scale),
        bias=torch.from_numpy(bias), eps=1e-5)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)


def _attr_floats(name: str, vals) -> bytes:
    return _ld(5, _str(1, name) +
               b"".join(_field(7, 5, struct.pack("<f", v)) for v in vals))


def test_upsample_deprecated_op():
    x = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    # opset-7 form: scales attribute
    got = _run_single("Upsample", ["x"], {"x": x},
                      attrs=_attr_floats("scales", [1, 1, 2, 2]))[0]
    np.testing.assert_array_equal(got, want)
    # opset-9 form: scales as input 1
    got = _run_single("Upsample", ["x", "sc"],
                      {"x": x, "sc": np.array([1, 1, 2, 2], np.float32)})[0]
    np.testing.assert_array_equal(got, want)


def test_parser_rejects_garbage_cleanly():
    """Malformed files must raise (any exception), never hang or segfault —
    the loader's first contact with a real download can be a truncated or
    corrupted file."""
    rs = np.random.RandomState(0)
    x = np.zeros((1, 2), np.float32)
    # a valid model, then truncations of it at every prefix length band
    good = _model([_node("Relu", ["x"], ["y"])], [], ["x"], ["y"])
    for cut in range(1, len(good)):
        try:
            g = parse_model(good[:cut])
            run_graph(g, {"x": x}, ["y"])
        except Exception:
            pass
    # random garbage
    for n in (1, 16, 256, 4096):
        for _ in range(8):
            try:
                g = parse_model(rs.bytes(n))
                run_graph(g, {"x": x}, g.outputs or ["y"])
            except Exception:
                pass
