"""Bit-compat tests for the pure-Python .pt codec against real torch."""

import numpy as np
import pytest

from safe_denoiser_tpu.io import load_pt, save_pt

torch = pytest.importorskip("torch")


def test_read_torch_tensor(tmp_path):
    t = torch.randn(5, 4, 8, 8)
    p = str(tmp_path / "proj_ref.pt")
    torch.save(t, p)
    arr = load_pt(p)
    assert arr.dtype == np.float32
    np.testing.assert_array_equal(arr, t.numpy())


def test_read_torch_dict_of_tensors(tmp_path):
    # The noisy-ref beta cache layout: {timestep:int -> [M,C,H,W] tensor}
    d = {981: torch.randn(3, 4, 8, 8), 1: torch.randn(3, 4, 8, 8).half()}
    p = str(tmp_path / "noisy.pt")
    torch.save(d, p)
    out = load_pt(p)
    assert set(out.keys()) == {981, 1}
    np.testing.assert_array_equal(out[981], d[981].numpy())
    np.testing.assert_array_equal(out[1], d[1].numpy())
    assert out[1].dtype == np.float16


def test_write_then_torch_load(tmp_path):
    arr = np.random.randn(7, 4, 8, 8).astype(np.float32)
    p = str(tmp_path / "ours.pt")
    save_pt(arr, p)
    back = torch.load(p, map_location="cpu", weights_only=False)
    np.testing.assert_array_equal(back.numpy(), arr)


def test_write_dict_then_torch_load(tmp_path):
    d = {
        981: np.random.randn(2, 4, 4, 4).astype(np.float32),
        "meta": [1, 2.5, "x"],
        1: np.arange(6, dtype=np.int64).reshape(2, 3),
    }
    p = str(tmp_path / "ours_dict.pt")
    save_pt(d, p)
    back = torch.load(p, map_location="cpu", weights_only=False)
    np.testing.assert_array_equal(back[981].numpy(), d[981])
    np.testing.assert_array_equal(back[1].numpy(), d[1])
    assert back["meta"] == [1, 2.5, "x"]


def test_roundtrip_no_torch(tmp_path):
    obj = {"a": np.random.rand(3, 5).astype(np.float32), "b": {"c": np.float32(2.0)}}
    p = str(tmp_path / "rt.pt")
    save_pt(obj, p)
    out = load_pt(p)
    np.testing.assert_array_equal(out["a"], obj["a"])


def test_bitwise_value_preservation(tmp_path):
    # fp32 values must survive a torch->ours->torch round trip untouched.
    t = torch.randn(16, 4, 8, 8)
    p1, p2 = str(tmp_path / "a.pt"), str(tmp_path / "b.pt")
    torch.save(t, p1)
    save_pt(load_pt(p1), p2)
    back = torch.load(p2, weights_only=False)
    assert torch.equal(back, t)


def test_set_with_tensor_roundtrip(tmp_path):
    import torch

    path = str(tmp_path / "s.pt")
    torch.save({"items": {("k", torch.ones(2, 2))}}, path)
    out = load_pt(path)
    # numpy arrays are unhashable, so the set degrades to a list of its
    # materialized members (torch tensors hash by identity; numpy can't)
    (tup,) = list(out["items"])
    assert tup[0] == "k"
    np.testing.assert_array_equal(np.asarray(tup[1]), np.ones((2, 2)))


def test_bf16_tensor_both_directions(tmp_path):
    """BF16 .pt files must load as NUMBERS (ml_dtypes.bfloat16), not raw
    uint16 bits — a finetuned UNet saved in bf16 is a realistic first
    contact. And save_pt(bf16) must torch.load back as torch.bfloat16."""
    import ml_dtypes

    from safe_denoiser_tpu.io import load_pt, save_pt

    t = torch.randn(3, 4, dtype=torch.float32).to(torch.bfloat16)
    p = tmp_path / "bf16.pt"
    torch.save({"w": t}, str(p))
    out = load_pt(str(p))
    assert out["w"].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(out["w"], np.float32), t.to(torch.float32).numpy())

    p2 = tmp_path / "bf16_out.pt"
    save_pt({"w": np.asarray(out["w"])}, str(p2))
    back = torch.load(str(p2), weights_only=True)
    assert back["w"].dtype == torch.bfloat16
    assert torch.equal(back["w"], t)
