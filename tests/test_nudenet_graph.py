"""NudeNet-structure ONNX graph executed end-to-end on the interpreter.

Round-1 VERDICT item 3: the real `classifier_model.onnx` the reference runs
(reference nudenet/classify_pil.py:39-96) is a TF/Keras-converted
Xception-style CNN: NHWC input + Transpose to NCHW, SAME_UPPER convs,
depthwise-separable blocks (Conv with group=C followed by 1x1 pointwise),
BatchNormalization, MaxPool SAME residual blocks with 1x1 strided shortcuts,
GlobalAveragePool -> Reshape(0,-1) -> MatMul+Add -> Softmax over
[unsafe, safe]. The real weights are not downloadable here (zero egress), so
this test builds a faithfully-structured scale model with that exact
op/attribute inventory, hand-encodes it in ONNX wire format, and goldens the
full NudeClassifier PIL path against a torch reimplementation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from PIL import Image  # noqa: E402

from safe_denoiser_tpu.evals.nudenet import NudeClassifier  # noqa: E402
from tests.test_onnx_rt import (  # noqa: E402
    _attr_int, _attr_ints, _ld, _model, _node, _str, _tensor)


def _attr_str(name, s):
    return _ld(5, _str(1, name) + _str(4, s))


def _same_pad(x, k, s, value=0.0):
    """TF SAME_UPPER padding for square kernels/strides."""
    ih, iw = x.shape[2:]
    pads = []
    for size in (ih, iw):
        out = -(-size // s)
        total = max(0, (out - 1) * s + k - size)
        pads.append((total // 2, total - total // 2))
    return F.pad(x, (pads[1][0], pads[1][1], pads[0][0], pads[0][1]),
                 value=value)


class _Rng:
    def __init__(self):
        self.rs = np.random.RandomState(0)

    def conv(self, cout, cin, k):
        return self.rs.randn(cout, cin, k, k).astype(np.float32) * 0.2

    def vec(self, c, lo=0.0, hi=1.0):
        return self.rs.uniform(lo, hi, c).astype(np.float32)


def _build_graph_and_torch():
    """Returns (onnx_model_bytes, torch_forward(NHWC float array) -> probs)."""
    r = _Rng()
    C0, C1, C2 = 8, 16, 24
    weights = {
        "w_conv1": r.conv(C0, 3, 3), "b_conv1": r.vec(C0, -0.1, 0.1),
        "bn1_s": r.vec(C0, 0.5, 1.5), "bn1_b": r.vec(C0, -0.2, 0.2),
        "bn1_m": r.vec(C0, -0.5, 0.5), "bn1_v": r.vec(C0, 0.5, 2.0),
        # separable block: depthwise(C0) + pointwise C0->C1
        "w_dw1": r.conv(C0, 1, 3), "w_pw1": r.conv(C1, C0, 1),
        "bn2_s": r.vec(C1, 0.5, 1.5), "bn2_b": r.vec(C1, -0.2, 0.2),
        "bn2_m": r.vec(C1, -0.5, 0.5), "bn2_v": r.vec(C1, 0.5, 2.0),
        # residual shortcut 1x1 stride-2
        "w_sc": r.conv(C1, C0, 1), "b_sc": r.vec(C1, -0.1, 0.1),
        # middle block depthwise+pointwise (relu-first, identity residual)
        "w_dw2": r.conv(C1, 1, 3), "w_pw2": r.conv(C1, C1, 1),
        "bn3_s": r.vec(C1, 0.5, 1.5), "bn3_b": r.vec(C1, -0.2, 0.2),
        "bn3_m": r.vec(C1, -0.5, 0.5), "bn3_v": r.vec(C1, 0.5, 2.0),
        # exit pointwise to C2 then head
        "w_pw3": r.conv(C2, C1, 1), "b_pw3": r.vec(C2, -0.1, 0.1),
        "fc_w": r.rs.randn(C2, 2).astype(np.float32) * 0.3,
        "fc_b": r.vec(2, -0.1, 0.1),
        "reshape_shape": np.array([0, -1], dtype=np.int64),
    }

    same = _attr_str("auto_pad", "SAME_UPPER")
    k3 = _attr_ints("kernel_shape", [3, 3])
    k1 = _attr_ints("kernel_shape", [1, 1])
    s2 = _attr_ints("strides", [2, 2])
    s1 = _attr_ints("strides", [1, 1])
    nodes = [
        # TF-converted graphs carry the NHWC input through a Transpose
        _node("Transpose", ["input_1"], ["x0"],
              _attr_ints("perm", [0, 3, 1, 2])),
        _node("Conv", ["x0", "w_conv1", "b_conv1"], ["c1"], k3 + s2 + same),
        _node("BatchNormalization",
              ["c1", "bn1_s", "bn1_b", "bn1_m", "bn1_v"], ["b1"]),
        _node("Relu", ["b1"], ["r1"]),
        # separable conv: depthwise (group=C) then pointwise, BN after
        _node("Conv", ["r1", "w_dw1"], ["d1"],
              k3 + s1 + same + _attr_int("group", C0)),
        _node("Conv", ["d1", "w_pw1"], ["p1"], k1 + s1),
        _node("BatchNormalization",
              ["p1", "bn2_s", "bn2_b", "bn2_m", "bn2_v"], ["b2"]),
        _node("MaxPool", ["b2"], ["mp1"], k3 + s2 + same),
        _node("Conv", ["r1", "w_sc", "b_sc"], ["sc"], k1 + s2),
        _node("Add", ["mp1", "sc"], ["res1"]),
        # middle block: relu-first separable, identity residual
        _node("Relu", ["res1"], ["r2"]),
        _node("Conv", ["r2", "w_dw2"], ["d2"],
              k3 + s1 + same + _attr_int("group", C1)),
        _node("Conv", ["d2", "w_pw2"], ["p2"], k1 + s1),
        _node("BatchNormalization",
              ["p2", "bn3_s", "bn3_b", "bn3_m", "bn3_v"], ["b3"]),
        _node("Add", ["res1", "b3"], ["res2"]),
        # exit
        _node("Relu", ["res2"], ["r3"]),
        _node("Conv", ["r3", "w_pw3", "b_pw3"], ["p3"], k1 + s1),
        _node("Relu", ["p3"], ["r4"]),
        _node("GlobalAveragePool", ["r4"], ["gap"]),
        _node("Reshape", ["gap", "reshape_shape"], ["flat"]),
        _node("MatMul", ["flat", "fc_w"], ["logits0"]),
        _node("Add", ["logits0", "fc_b"], ["logits"]),
        _node("Softmax", ["logits"], ["dense_out"], _attr_int("axis", 1)),
    ]
    inits = [_tensor(k, v) for k, v in weights.items()]
    model = _model(nodes, inits, ["input_1"], ["dense_out"])

    def bn(x, p):
        s, b, m, v = (torch.from_numpy(weights[f"{p}_{k}"])
                      for k in ("s", "b", "m", "v"))
        shape = [1, -1, 1, 1]
        return ((x - m.view(shape)) / torch.sqrt(v.view(shape) + 1e-5)
                * s.view(shape) + b.view(shape))

    def tconv(x, wname, bname=None, stride=1, groups=1, same_pad=True):
        w = torch.from_numpy(weights[wname])
        b = torch.from_numpy(weights[bname]) if bname else None
        if same_pad and w.shape[-1] > 1:
            x = _same_pad(x, w.shape[-1], stride)
        return F.conv2d(x, w, b, stride=stride, groups=groups)

    def torch_forward(arr_nhwc: np.ndarray) -> np.ndarray:
        x = torch.from_numpy(arr_nhwc).permute(0, 3, 1, 2).float()
        x = F.relu(bn(tconv(x, "w_conv1", "b_conv1", 2), "bn1"))
        r1 = x
        x = tconv(x, "w_dw1", groups=C0)
        x = bn(tconv(x, "w_pw1"), "bn2")
        x = F.max_pool2d(_same_pad(x, 3, 2, value=-torch.inf), 3, 2)
        res1 = x + tconv(r1, "w_sc", "b_sc", 2, same_pad=False)
        x = F.relu(res1)
        x = tconv(x, "w_dw2", groups=C1)
        x = bn(tconv(x, "w_pw2"), "bn3")
        res2 = res1 + x
        x = F.relu(tconv(F.relu(res2), "w_pw3", "b_pw3"))
        x = x.mean(dim=(2, 3))
        logits = x @ torch.from_numpy(weights["fc_w"]) + \
            torch.from_numpy(weights["fc_b"])
        return torch.softmax(logits, dim=1).numpy()

    return model, torch_forward


def test_nudenet_structured_graph_end_to_end(tmp_path):
    model_bytes, torch_forward = _build_graph_and_torch()
    path = tmp_path / "classifier_model.onnx"
    path.write_bytes(model_bytes)

    rs = np.random.RandomState(7)
    pil_images = [Image.fromarray(rs.randint(0, 255, (300, 200, 3),
                                             dtype=np.uint8))
                  for _ in range(3)]

    clf = NudeClassifier(str(path))
    preds = clf.classify(images=pil_images,
                         image_names=[f"{i}.png" for i in range(3)],
                         batch_size=2)

    # golden: replicate the PIL preprocessing (256x256 NEAREST, /255)
    batch = np.stack([
        np.asarray(im.resize((256, 256), Image.NEAREST).convert("RGB"),
                   dtype=np.float32) / 255.0
        for im in pil_images])
    want = torch_forward(batch)

    for i in range(3):
        got = preds[f"{i}.png"]
        assert set(got) == {"unsafe", "safe"}
        np.testing.assert_allclose([got["unsafe"], got["safe"]],
                                   [want[i, 0], want[i, 1]], atol=1e-5)

    # the gate itself
    unsafe, pred = clf(pil_images, threshold=0.0)
    np.testing.assert_allclose(pred, want[:, 0].max(), atol=1e-5)
    assert unsafe  # threshold 0 -> always unsafe


def test_depthwise_conv_same_upper_matches_torch():
    """Isolated depthwise fast-path check at an odd spatial size."""
    from safe_denoiser_tpu.evals.onnx_rt import _conv

    rs = np.random.RandomState(1)
    x = rs.randn(2, 6, 17, 13).astype(np.float32)
    w = rs.randn(6, 1, 3, 3).astype(np.float32)
    got = _conv(x, w, None, {"strides": [2, 2], "group": 6,
                             "auto_pad": "SAME_UPPER"})
    xt = _same_pad(torch.from_numpy(x), 3, 2)
    want = F.conv2d(xt, torch.from_numpy(w), stride=2, groups=6).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
