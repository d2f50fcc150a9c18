"""OpenCLIP factory compatibility surface.

The reference vendors the full OpenCLIP library (open_clip/factory.py:192
``create_model_and_transforms``) but its code paths only ever call it for the
ViT-H-14 laion2b image-image scorer (reference run_coco30k.py:174) via:

    model, _, preprocess = open_clip.create_model_and_transforms(
        "ViT-H-14", pretrained="laion2b_s32b_b79k", device=...)
    feats = model.encode_image(torch.stack([preprocess(img), ...]))

This module supplies that calling convention on the Flax towers
(models/clip_text.py / clip_vision.py) with the OpenCLIP state-dict
converters (models/weights.py::convert_open_clip_{vision,text}).

Zero-egress adaptation: ``pretrained`` may be a LOCAL state-dict path; the
upstream pretrained-tag database is a download index and is deliberately not
ported — passing a bare tag raises with instructions instead of silently
running random weights.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .clip_text import CLIPTextConfig, CLIPTextModel
from .clip_vision import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    CLIP_VISION_VIT_B_32,
    CLIP_VISION_VIT_H_14,
    CLIP_VISION_VIT_L_14,
    CLIPVisionModel,
)

# (vision cfg, text cfg) per OpenCLIP model name — the towers the reference
# repo's vendored config JSONs describe for these names
_TEXT_VIT_H_14 = CLIPTextConfig(hidden_size=1024, num_layers=24,
                                num_heads=16, intermediate_size=4096,
                                hidden_act="gelu", projection_dim=1024)
_TEXT_VIT_L_14 = CLIPTextConfig(hidden_act="gelu")
_TEXT_VIT_B_32 = CLIPTextConfig(hidden_size=512, num_layers=12, num_heads=8,
                                intermediate_size=2048, hidden_act="gelu",
                                projection_dim=512)

MODEL_CONFIGS = {
    "ViT-H-14": (CLIP_VISION_VIT_H_14, _TEXT_VIT_H_14),
    "ViT-L-14": (CLIP_VISION_VIT_L_14, _TEXT_VIT_L_14),
    "ViT-B-32": (CLIP_VISION_VIT_B_32, _TEXT_VIT_B_32),
}

@dataclass
class OpenCLIPModel:
    """``encode_image``/``encode_text`` over the Flax towers.

    Accepts numpy/jax arrays; images may be NCHW (the torch convention the
    reference stacks preprocess outputs into) or NHWC.
    """

    vision_cfg: object
    text_cfg: CLIPTextConfig
    vision_params: dict | None
    text_params: dict | None

    def __post_init__(self):
        self._vision = CLIPVisionModel(self.vision_cfg)
        self._text = CLIPTextModel(self.text_cfg)
        self._encode_image = jax.jit(
            lambda p, px: self._vision.apply(p, px)[2])
        self._encode_text = jax.jit(
            lambda p, ids: self._text.apply(p, ids)[3])

    def encode_image(self, pixel_values) -> np.ndarray:
        px = jnp.asarray(np.asarray(pixel_values), dtype=jnp.float32)
        if px.ndim == 3:
            px = px[None]
        if px.shape[1] == 3 and px.shape[-1] != 3:   # NCHW -> NHWC
            px = jnp.transpose(px, (0, 2, 3, 1))
        if self.vision_params is None:
            raise ValueError("no vision weights loaded")
        return np.asarray(self._encode_image(self.vision_params, px))

    def encode_text(self, input_ids) -> np.ndarray:
        ids = jnp.asarray(np.asarray(input_ids), dtype=jnp.int32)
        if self.text_params is None:
            raise ValueError(
                "this checkpoint had no text tower (visual.* keys only)")
        return np.asarray(self._encode_text(self.text_params, ids))


def _preprocess(image, size: int) -> np.ndarray:
    """PIL/array -> CLIP-normalized [3, size, size] float32 (torch CHW
    convention, so ``np.stack`` of outputs feeds encode_image like the
    reference's ``torch.stack``)."""
    from PIL import Image

    if not isinstance(image, Image.Image):
        image = Image.fromarray(np.asarray(image))
    # open_clip eval transform: resize shortest side (bicubic) + center crop
    w, h = image.size
    scale = size / min(w, h)
    image = image.resize((max(size, round(w * scale)),
                          max(size, round(h * scale))), Image.BICUBIC)
    w, h = image.size
    left, top = (w - size) // 2, (h - size) // 2
    image = image.convert("RGB").crop((left, top, left + size, top + size))
    arr = np.asarray(image, dtype=np.float32) / 255.0
    arr = (arr - np.asarray(CLIP_IMAGE_MEAN, np.float32)) \
        / np.asarray(CLIP_IMAGE_STD, np.float32)
    return arr.transpose(2, 0, 1).astype(np.float32)


def create_model_and_transforms(model_name: str, pretrained: str | None = None,
                                device=None, weights_path: str | None = None,
                                **_unused):
    """(model, preprocess_train, preprocess_val) — reference factory surface
    (open_clip/factory.py:192). ``device`` is accepted and ignored (JAX
    manages placement)."""
    if model_name not in MODEL_CONFIGS:
        raise KeyError(
            f"unknown OpenCLIP model {model_name!r}; ported names: "
            f"{sorted(MODEL_CONFIGS)} (the reference only exercises "
            f"ViT-H-14 — run_coco30k.py:174)")
    vision_cfg, text_cfg = MODEL_CONFIGS[model_name]

    path = weights_path or pretrained
    vision_params = text_params = None
    if path and os.path.exists(path):
        from .weights import (
            convert_open_clip_text, convert_open_clip_vision, load_state_dict)

        sd = load_state_dict(path)
        vision_params = convert_open_clip_vision(sd, vision_cfg)
        if "token_embedding.weight" in sd:
            text_params = convert_open_clip_text(sd, text_cfg)
    elif pretrained:
        raise FileNotFoundError(
            f"pretrained tag/path {pretrained!r} is not a local file; this "
            "environment has no egress — download the OpenCLIP checkpoint "
            "elsewhere and pass its path as pretrained= or weights_path=")

    model = OpenCLIPModel(vision_cfg, text_cfg, vision_params, text_params)

    def preprocess(img):
        return _preprocess(img, vision_cfg.image_size)

    return model, preprocess, preprocess
