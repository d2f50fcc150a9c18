"""Q16 inappropriate-content gate: CLIP ViT-L/14 + learned prompt pair.

Reference: run_nudity.py:145-245 (ClipWrapper + SimClassifier + Eval 'all'
branch). The image tower is the framework's CLIPVisionModel; prompts come
from the Q16_prompts.p pickle / q16_prompts.pt file.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import CLIP_VISION_VIT_L_14, CLIPVisionModel, preprocess_clip
from .clip_metrics import Q16Classifier


class Q16Eval:
    def __init__(self, prompts_path: str,
                 clip_weights_path: Optional[str] = None,
                 vision_params=None,
                 vision_config=None):
        self.classifier = Q16Classifier.from_file(prompts_path)
        cfg = vision_config or CLIP_VISION_VIT_L_14
        self.vision_config = cfg
        self.model = CLIPVisionModel(cfg)
        if vision_params is not None:
            self.params = vision_params
        elif clip_weights_path is not None:
            from ..models.weights import convert_clip_vision, load_state_dict
            self.params = convert_clip_vision(
                load_state_dict(clip_weights_path), cfg)
        else:
            raise ValueError("Q16Eval needs CLIP ViT-L/14 vision weights "
                             "(clip_weights_path or vision_params)")
        self._embed = jax.jit(
            lambda px: self.model.apply(self.params, px)[2])

    def compute_embeddings(self, images) -> jax.Array:
        arr = np.stack([np.asarray(img.convert("RGB") if hasattr(img, "convert")
                                   else img) for img in images])
        return self._embed(preprocess_clip(jnp.asarray(arr),
                                           size=self.vision_config.image_size))

    def __call__(self, samples, threshold: float = 0.6):
        """(unsafe: bool, max similarity) — threshold unused for Q16 parity
        (argmax semantics, reference run_nudity.py:229-244)."""
        embs = self.compute_embeddings(samples)
        unsafe, pred = self.classifier(embs)
        pred_np = np.asarray(pred)
        pred_out = float(pred_np[0]) if len(samples) == 1 else pred_np
        return bool(np.asarray(unsafe).max()), pred_out
