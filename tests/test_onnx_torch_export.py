"""ONNX runtime vs REAL torch.onnx-exported graphs.

The other ONNX tests (test_onnx_rt.py, test_nudenet_graph.py) hand-encode
the protobuf wire format, so a self-consistent encode/decode mistake passes
them while failing on real files — exactly what happened with
NodeProto.attribute being read from field 7 (`domain`) instead of 5: every
attribute of a real exporter graph silently vanished (a depthwise conv ran
with group=1). This module is the guard: it exports small torch models with
the stock TorchScript ONNX exporter (real attribute idioms, initializer
encodings, opset-13 inputs-not-attrs forms, negative-int two's-complement
varints) and runs the serialized bytes through evals/onnx_rt.py against the
torch module's own outputs.

The reference consumes real exporter-produced ONNX through onnxruntime
(/root/reference/nudenet/classify_pil.py:37-96, nudenet/detector.py); these
graphs are the closest in-environment stand-in for that first contact.

The `onnx` python package is absent here; the exporter only needs it for
the final onnxscript-function merge, which is a no-op passthrough for plain
nn.Modules — monkeypatched below.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from safe_denoiser_tpu.evals.onnx_rt import InferenceSession, parse_model


def _export(model, args, path, opset=13, **kw):
    """torch.onnx.export without the `onnx` package installed."""
    try:
        from torch.onnx._internal.torchscript_exporter import onnx_proto_utils
    except ImportError:
        pytest.skip("torch internals moved; exporter shim unavailable")
    orig = onnx_proto_utils._add_onnxscript_fn
    # passthrough: plain nn.Modules register no onnxscript functions, and the
    # serialized ModelProto bytes are already complete at this point
    onnx_proto_utils._add_onnxscript_fn = lambda b, custom_opsets: b
    try:
        torch.onnx.export(model, args, path, dynamo=False,
                          opset_version=opset, **kw)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def _run(path, feeds, outputs):
    return InferenceSession(str(path)).run(outputs, feeds)


class SepConvNet(nn.Module):
    """Xception-style classifier shape (the NudeNet classifier family):
    strided conv + BN + depthwise/pointwise separable conv + GAP + dense."""

    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(3, 16, 3, stride=2, padding=1)
        self.bn = nn.BatchNorm2d(16)
        self.dw = nn.Conv2d(16, 16, 3, padding=1, groups=16)
        self.pw = nn.Conv2d(16, 32, 1)
        self.fc = nn.Linear(32, 2)

    def forward(self, x):
        x = torch.relu(self.bn(self.conv(x)))
        x = torch.relu(self.pw(self.dw(x)))
        x = x.mean(dim=(2, 3))
        return torch.softmax(self.fc(x), dim=1)


def test_sepconv_classifier(tmp_path):
    torch.manual_seed(0)
    m = SepConvNet().eval()
    with torch.no_grad():
        m.bn.running_mean.normal_()
        m.bn.running_var.uniform_(0.5, 2.0)
    x = torch.randn(2, 3, 32, 32)
    p = tmp_path / "sepconv.onnx"
    _export(m, (x,), p, input_names=["input"], output_names=["prob"])
    # the exporter must have produced real attributes (group=16 on the
    # depthwise conv) — this is the regression the module exists for
    g = parse_model(p.read_bytes())
    groups = [n.attrs.get("group") for n in g.nodes if n.op_type == "Conv"]
    assert 16 in groups
    (got,) = _run(p, {"input": x.numpy()}, ["prob"])
    want = m(x).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


class PoolMathNet(nn.Module):
    """Pooling + elementwise + shape ops with exporter-idiom attributes."""

    def forward(self, x):
        a = F.max_pool2d(x, 2)
        b = F.avg_pool2d(x, 2)                      # count_include_pad form
        h = torch.cat([a, b], dim=1)
        h = h.permute(0, 2, 3, 1)                   # Transpose perm attr
        h = torch.clamp(h, -0.5, 0.5)               # Clip min/max as inputs
        h = h + h.sigmoid() * 0.25 - h.tanh() / 3.0
        h = torch.sqrt(h.abs() + 1.0) ** 2          # Sqrt + Pow
        return h.flatten(1)                          # Reshape/Flatten


def test_pool_math_ops(tmp_path):
    m = PoolMathNet().eval()
    x = torch.randn(2, 4, 8, 8)
    p = tmp_path / "poolmath.onnx"
    _export(m, (x,), p, input_names=["x"], output_names=["y"])
    (got,) = _run(p, {"x": x.numpy()}, ["y"])
    np.testing.assert_allclose(got, m(x).numpy(), atol=1e-5)


class SliceTopkNet(nn.Module):
    """Detector-style ops: Slice with negative ends, TopK, Where, Exp,
    Unsqueeze/Squeeze in their opset-13 axes-as-input form."""

    def forward(self, scores):
        s = scores[:, 1:-1]                          # Slice, negative end
        top, _ = torch.topk(s, k=3, dim=1)           # TopK (k as input)
        gated = torch.where(top > 0, torch.exp(top), -top)
        return (gated.unsqueeze(-1) * 2.0).squeeze(-1)


def test_slice_topk_where(tmp_path):
    m = SliceTopkNet().eval()
    x = torch.randn(2, 9)
    p = tmp_path / "slicetopk.onnx"
    _export(m, (x,), p, input_names=["scores"], output_names=["y"])
    (got,) = _run(p, {"scores": x.numpy()}, ["y"])
    np.testing.assert_allclose(got, m(x).numpy(), atol=1e-5)


class NormMatmulNet(nn.Module):
    """BatchNormalization kept as a standalone node (not folded — no conv
    precedes it), MatMul, negative Softmax axis (two's-complement varint)."""

    def __init__(self):
        super().__init__()
        self.bn = nn.BatchNorm2d(4)
        self.w = nn.Parameter(torch.randn(8, 8))

    def forward(self, x):
        h = self.bn(x)
        h = h.reshape(2, 4 * 8, 8) @ self.w
        return torch.softmax(h, dim=-1)


def test_batchnorm_matmul_negative_axis(tmp_path):
    torch.manual_seed(1)
    m = NormMatmulNet().eval()
    with torch.no_grad():
        m.bn.running_mean.normal_()
        m.bn.running_var.uniform_(0.5, 2.0)
        m.bn.weight.normal_()
        m.bn.bias.normal_()
    x = torch.randn(2, 4, 8, 8)
    p = tmp_path / "bnmm.onnx"
    _export(m, (x,), p, input_names=["x"], output_names=["y"])
    g = parse_model(p.read_bytes())
    ops = {n.op_type for n in g.nodes}
    assert "BatchNormalization" in ops
    # dim=-1 must survive as a real negative int, not a 2^64-ish varint
    sm = [n for n in g.nodes if n.op_type == "Softmax"]
    assert sm and sm[0].attrs["axis"] == -1
    (got,) = _run(p, {"x": x.numpy()}, ["y"])
    np.testing.assert_allclose(got, m(x).detach().numpy(), atol=1e-5)


class ResizeNet(nn.Module):
    """F.interpolate → Resize: nearest/asymmetric/floor and
    bilinear/pytorch_half_pixel plus align_corners — the coordinate modes
    the keras-retinanet detector export (UpsampleLike) also uses."""

    def forward(self, x):
        a = F.interpolate(x, scale_factor=2, mode="nearest")
        b = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=False)
        c = F.interpolate(x, size=(5, 7), mode="bilinear", align_corners=True)
        return a + b, c


def test_resize_modes(tmp_path):
    m = ResizeNet().eval()
    x = torch.randn(2, 3, 4, 6)
    p = tmp_path / "resize.onnx"
    _export(m, (x,), p, input_names=["x"], output_names=["ab", "c"])
    ab, c = _run(p, {"x": x.numpy()}, ["ab", "c"])
    wab, wc = m(x)
    np.testing.assert_allclose(ab, wab.numpy(), atol=1e-5)
    np.testing.assert_allclose(c, wc.numpy(), atol=1e-5)


def test_unsupported_op_fails_loudly(tmp_path):
    class AtanNet(nn.Module):
        def forward(self, x):
            return torch.atan(x)

    p = tmp_path / "atan.onnx"
    _export(AtanNet().eval(), (torch.randn(2, 3),), p,
            input_names=["x"], output_names=["y"])
    with pytest.raises(NotImplementedError):
        _run(p, {"x": np.zeros((2, 3), np.float32)}, ["y"])
