"""Evaluation-stack tests: metric math golden vs. inline torch, tower shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_denoiser_tpu.evals import (
    frechet_distance,
    inception_score_from_logits,
    kid_from_features,
    stats_from_features,
)
from safe_denoiser_tpu.evals.clip_metrics import (
    AestheticMLP,
    Q16Classifier,
    aes_score,
    clip_score,
    convert_aes_mlp,
)
from safe_denoiser_tpu.evals.inception import InceptionV3, convert_inception

torch = pytest.importorskip("torch")


def test_frechet_distance_analytic():
    # identical Gaussians -> 0; mean shift only -> ||Δμ||²
    mu = np.zeros(8)
    sigma = np.eye(8)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8
    mu2 = np.full(8, 0.5)
    got = frechet_distance(mu, sigma, mu2, sigma)
    np.testing.assert_allclose(got, 8 * 0.25, atol=1e-8)


def test_frechet_distance_vs_torch_reference_math():
    rng = np.random.RandomState(0)
    f1 = rng.randn(200, 16)
    f2 = rng.randn(180, 16) * 1.3 + 0.2
    mu1, s1 = stats_from_features(f1)
    mu2, s2 = stats_from_features(f2)
    got = frechet_distance(mu1, s1, mu2, s2)

    # torch/scipy cross-check of tr-sqrtm term (reference utils/fid.py:132-168)
    from scipy import linalg
    covmean = linalg.sqrtm(s1 @ s2).real
    want = float((mu1 - mu2) @ (mu1 - mu2) + np.trace(s1) + np.trace(s2)
                 - 2 * np.trace(covmean))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_kid_identical_near_zero_and_shifted_positive():
    rng = np.random.RandomState(1)
    feats = rng.randn(120, 32)
    mean_same, _ = kid_from_features(feats, feats + 0.0, subsets=50,
                                     subset_size=100)
    mean_shift, _ = kid_from_features(feats, feats + 1.0, subsets=50,
                                      subset_size=100)
    # unbiased estimator: ~0 in expectation on identical sets (sampling noise
    # bounded), clearly positive under a mean shift
    assert abs(mean_same) < 0.2
    assert mean_shift > abs(mean_same) + 0.5


def test_inception_score_uniform_is_one():
    logits = np.zeros((50, 10))
    mean, _ = inception_score_from_logits(logits, splits=5)
    np.testing.assert_allclose(mean, 1.0, atol=1e-6)


def test_clip_score_formula():
    a = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
    b = jnp.asarray([[1.0, 0.0], [1.0, 0.0], [1.0, 0.0]])
    got = np.asarray(clip_score(a, b))
    np.testing.assert_allclose(got, [100.0, 0.0, 0.0], atol=1e-5)


def test_q16_classifier():
    prompts = np.stack([np.array([1.0, 0.0]), np.array([0.0, 1.0])])
    q16 = Q16Classifier(prompts)
    embeds = jnp.asarray([[5.0, 0.1], [0.1, 5.0]])
    unsafe, pred = q16(embeds)
    assert list(np.asarray(unsafe)) == [False, True]
    assert np.asarray(pred).shape == (2,)


def test_aes_mlp_conversion_vs_torch():
    torch.manual_seed(0)
    seq = torch.nn.Sequential(
        torch.nn.Linear(768, 1024), torch.nn.Dropout(0.2),
        torch.nn.Linear(1024, 128), torch.nn.Dropout(0.2),
        torch.nn.Linear(128, 64), torch.nn.Dropout(0.1),
        torch.nn.Linear(64, 16), torch.nn.Linear(16, 1)).eval()
    sd = {f"layers.{k}": v for k, v in
          {str(i): None for i in range(8)}.items()}
    sd = {f"layers.{name}": p.detach().numpy()
          for name, p in seq.state_dict().items()}
    params = convert_aes_mlp(sd)

    rng = np.random.RandomState(2)
    emb = rng.randn(4, 768).astype(np.float32)
    emb_n = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    with torch.no_grad():
        want = seq(torch.tensor(emb_n)).numpy()[:, 0]
    got = np.asarray(aes_score(params, jnp.asarray(emb)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_inception_v3_shapes():
    model = InceptionV3()
    x = jnp.ones((1, 299, 299, 3)) * 0.5
    params = model.init(jax.random.PRNGKey(0), x)
    pool3, logits = model.apply(params, x)
    assert pool3.shape == (1, 2048)
    assert logits.shape == (1, 1008)
    # converter round-trips the param structure from a synthetic state dict
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    # build a torch-style state dict from the flax tree and re-convert
    for path, val in flat:
        keys = [p.key for p in path]
        if keys[-1] == "kernel" and keys[-2] == "conv":
            sd[".".join(keys[:-1]) + ".weight"] = np.transpose(
                np.asarray(val), (3, 2, 0, 1))
        elif keys[-1] == "kernel":  # fc
            sd[".".join(keys[:-1]) + ".weight"] = np.asarray(val).T
        elif keys[-1] == "bias" and keys[-2] == "fc":
            sd["fc.bias"] = np.asarray(val)
        else:
            name = {"bn_scale": "bn.weight", "bn_bias": "bn.bias",
                    "bn_mean": "bn.running_mean",
                    "bn_var": "bn.running_var"}[keys[-1]]
            sd[".".join(keys[:-1]) + "." + name] = np.asarray(val)
    params2 = convert_inception(sd)
    pool3b, _ = model.apply(params2, x)
    np.testing.assert_allclose(np.asarray(pool3b), np.asarray(pool3),
                               atol=1e-5)


def test_nudenet_eval_many_matches_per_case(tmp_path):
    """NudeClassifier.eval_many (the runners' grouped-gate drain) must give
    per-group results identical to per-case __call__."""
    from tests.test_nudenet_graph import _build_graph_and_torch

    from safe_denoiser_tpu.evals.nudenet import NudeClassifier

    model_bytes, _ = _build_graph_and_torch()
    p = tmp_path / "n.onnx"
    p.write_bytes(model_bytes)
    clf = NudeClassifier(str(p))

    rs = np.random.RandomState(0)
    groups = [[rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)]
              for _ in range(5)]
    batched = clf.eval_many(groups, threshold=0.6)
    solo = [clf(g, threshold=0.6) for g in groups]
    assert len(batched) == 5
    for (bu, bp), (su, sp) in zip(batched, solo):
        assert bu == su
        np.testing.assert_allclose(bp, sp, rtol=1e-6)
    assert clf.eval_many([], threshold=0.6) == []


def test_q16_eval_many_and_config_inference(tmp_path):
    """Q16Eval.eval_many == per-case __call__; infer_clip_vision_config
    reconstructs a non-ViT-L tower's config from state-dict shapes."""
    import pickle

    import torch
    import transformers
    from safetensors.numpy import save_file

    from safe_denoiser_tpu.evals.q16 import Q16Eval, infer_clip_vision_config

    hf_cfg = transformers.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=1, intermediate_size=64,
        hidden_act="quick_gelu", projection_dim=16)
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    w = tmp_path / "clip_vision.safetensors"
    save_file(sd, str(w))

    cfg = infer_clip_vision_config(sd)
    assert (cfg.image_size, cfg.patch_size, cfg.hidden_size,
            cfg.num_layers, cfg.intermediate_size,
            cfg.projection_dim) == (32, 8, 32, 2, 64, 16)
    assert cfg.num_heads == 1          # head_dim-64 convention, floor 1

    rs = np.random.RandomState(1)
    pp = tmp_path / "q16.p"
    pp.write_bytes(pickle.dumps(rs.randn(2, 16).astype(np.float32)))
    ev = Q16Eval(str(pp), clip_weights_path=str(w))

    groups = [[rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)]
              for _ in range(4)]
    batched = ev.eval_many(groups)
    solo = [ev(g) for g in groups]
    for (bu, bp), (su, sp) in zip(batched, solo):
        assert bu == su
        np.testing.assert_allclose(bp, sp, rtol=1e-5, atol=1e-6)
