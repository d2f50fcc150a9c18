"""OpenCLIP factory compat surface (models/openclip_factory.py) — the
reference's `open_clip.create_model_and_transforms` calling convention
(reference run_coco30k.py:174) on the Flax towers, golden-tested by
re-packing an HF torch CLIP vision tower into the OpenCLIP state-dict key
layout (visual.* with packed qkv in_proj)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from safe_denoiser_tpu.models import clip_vision as CV  # noqa: E402
from safe_denoiser_tpu.models import openclip_factory as F  # noqa: E402
from safe_denoiser_tpu.models.clip_text import CLIPTextConfig  # noqa: E402


def _hf_to_openclip_visual(hf_sd: dict, n_layers: int) -> dict:
    """HF CLIPVisionModel keys -> open_clip `visual.*` layout."""
    g = lambda k: hf_sd[k].numpy()
    out = {
        "visual.class_embedding": g("vision_model.embeddings.class_embedding"),
        "visual.positional_embedding":
            g("vision_model.embeddings.position_embedding.weight"),
        "visual.conv1.weight":
            g("vision_model.embeddings.patch_embedding.weight"),
        "visual.ln_pre.weight": g("vision_model.pre_layrnorm.weight"),
        "visual.ln_pre.bias": g("vision_model.pre_layrnorm.bias"),
        "visual.ln_post.weight": g("vision_model.post_layernorm.weight"),
        "visual.ln_post.bias": g("vision_model.post_layernorm.bias"),
    }
    for i in range(n_layers):
        hf = f"vision_model.encoder.layers.{i}"
        oc = f"visual.transformer.resblocks.{i}"
        out[f"{oc}.ln_1.weight"] = g(f"{hf}.layer_norm1.weight")
        out[f"{oc}.ln_1.bias"] = g(f"{hf}.layer_norm1.bias")
        out[f"{oc}.ln_2.weight"] = g(f"{hf}.layer_norm2.weight")
        out[f"{oc}.ln_2.bias"] = g(f"{hf}.layer_norm2.bias")
        out[f"{oc}.attn.in_proj_weight"] = np.concatenate(
            [g(f"{hf}.self_attn.q_proj.weight"),
             g(f"{hf}.self_attn.k_proj.weight"),
             g(f"{hf}.self_attn.v_proj.weight")], axis=0)
        out[f"{oc}.attn.in_proj_bias"] = np.concatenate(
            [g(f"{hf}.self_attn.q_proj.bias"),
             g(f"{hf}.self_attn.k_proj.bias"),
             g(f"{hf}.self_attn.v_proj.bias")], axis=0)
        out[f"{oc}.attn.out_proj.weight"] = g(f"{hf}.self_attn.out_proj.weight")
        out[f"{oc}.attn.out_proj.bias"] = g(f"{hf}.self_attn.out_proj.bias")
        out[f"{oc}.mlp.c_fc.weight"] = g(f"{hf}.mlp.fc1.weight")
        out[f"{oc}.mlp.c_fc.bias"] = g(f"{hf}.mlp.fc1.bias")
        out[f"{oc}.mlp.c_proj.weight"] = g(f"{hf}.mlp.fc2.weight")
        out[f"{oc}.mlp.c_proj.bias"] = g(f"{hf}.mlp.fc2.bias")
    return out


@pytest.fixture()
def tiny_factory(monkeypatch, tmp_path):
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        projection_dim=24, hidden_act="gelu")
    torch.manual_seed(3)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    sd = _hf_to_openclip_visual(hf.state_dict(), 2)
    # open_clip stores visual.proj as [width, out]; contiguous copy — a
    # transposed VIEW would be serialized with the base array's bytes
    sd["visual.proj"] = np.ascontiguousarray(
        hf.state_dict()["visual_projection.weight"].numpy().T)

    from safetensors.numpy import save_file
    path = tmp_path / "openclip.safetensors"
    save_file(sd, str(path))

    vcfg = CV.CLIPVisionConfig(
        image_size=32, patch_size=16, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, hidden_act="gelu",
        projection_dim=24)
    monkeypatch.setitem(F.MODEL_CONFIGS, "test-tiny",
                        (vcfg, CLIPTextConfig()))
    return hf, str(path)


def test_factory_encode_image_matches_hf(tiny_factory):
    hf, path = tiny_factory
    model, _, preprocess = F.create_model_and_transforms(
        "test-tiny", pretrained=path, device="ignored")

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (48, 40, 3), dtype=np.uint8)
    px = preprocess(img)                        # [3, 32, 32] torch convention
    assert px.shape == (3, 32, 32)

    batch = np.stack([px, px * 0.5])            # torch.stack analogue (NCHW)
    got = model.encode_image(batch)
    with torch.no_grad():
        want = hf(pixel_values=torch.from_numpy(batch)).image_embeds.numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # NHWC input accepted too
    got2 = model.encode_image(batch.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(got2, got, atol=1e-6)

    # the reference's image-image cosine flow (run_coco30k.py:190-215)
    f = got / np.linalg.norm(got, axis=1, keepdims=True)
    sim = f @ f.T
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-5)


def test_factory_error_paths(tiny_factory):
    with pytest.raises(KeyError):
        F.create_model_and_transforms("ViT-Nope-99")
    with pytest.raises(FileNotFoundError):
        F.create_model_and_transforms("ViT-H-14",
                                      pretrained="laion2b_s32b_b79k")
    # no pretrained: model built, encode raises a clear error
    model, _, _ = F.create_model_and_transforms("test-tiny")
    with pytest.raises(ValueError):
        model.encode_image(np.zeros((1, 3, 32, 32), np.float32))
    _, path = tiny_factory
    model2, _, _ = F.create_model_and_transforms("test-tiny", pretrained=path)
    with pytest.raises(ValueError):  # visual-only checkpoint: no text tower
        model2.encode_text(np.zeros((1, 5), np.int64))
