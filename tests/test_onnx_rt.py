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
    return _ld(7, _str(1, name) +
               b"".join(_field(8, 0, _varint(v)) for v in vals))


def _attr_int(name: str, v: int) -> bytes:
    return _ld(7, _str(1, name) + _field(3, 0, _varint(v)))


def _attr_float(name: str, v: float) -> bytes:
    return _ld(7, _str(1, name) + _field(2, 5, struct.pack("<f", v)))


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
                   _ld(7, _str(1, "mode") + _str(4, "constant")))]
    inits = [_tensor("pads", pads),
             _tensor("cv", np.array(5.0, dtype=np.float32).reshape(()))]
    graph = parse_model(_model(nodes, inits, ["x"], ["y"]))
    out = run_graph(graph, {"x": x})[0]
    want = np.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)], constant_values=5.0)
    np.testing.assert_array_equal(out, want)

    # reflect / edge modes
    for mode in ("reflect", "edge"):
        nodes = [_node("Pad", ["x", "pads"], ["y"],
                       _ld(7, _str(1, "mode") + _str(4, mode)))]
        graph = parse_model(_model(nodes, [_tensor("pads", pads)],
                                   ["x"], ["y"]))
        out = run_graph(graph, {"x": x})[0]
        want = np.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)], mode=mode)
        np.testing.assert_array_equal(out, want)

    # unsupported mode must raise, not silently zero-pad
    nodes = [_node("Pad", ["x", "pads"], ["y"],
                   _ld(7, _str(1, "mode") + _str(4, "wrap")))]
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
    auto = _ld(7, _str(1, "auto_pad") + _str(4, "SAME_UPPER"))
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
