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


# head counts of the released CLIP vision towers, by hidden size — the one
# config field weight shapes cannot determine. ViT-B/* (768, 12 heads,
# d64), ViT-L/* (1024, 16, d64), ViT-H/* (1280, 16, d80 — NOT hidden//64),
# ViT-bigG (1664, 16, d104).
_KNOWN_VISION_HEADS = {768: 12, 1024: 16, 1280: 16, 1664: 16}


def infer_clip_vision_config(sd: dict):
    """Derive the vision-tower config from a state dict's shapes, so the
    Q16 gate loads ANY CLIP vision checkpoint instead of failing with a
    KeyError when the weights aren't exactly ViT-L/14 (also guards real
    assets against a silently-wrong hardcoded config). ``num_heads`` is the
    one field shapes can't determine: released towers resolve through a
    known-hidden-size table (ViT-H's head_dim is 80, so a blanket
    hidden//64 rule would silently mis-shape it); unknown hidden sizes fall
    back to the head_dim-64 convention WITH a warning — pass an explicit
    ``vision_config`` to Q16Eval for exotic towers."""
    from ..models import CLIPVisionConfig

    p = "vision_model." if any(k.startswith("vision_model.") for k in sd) \
        else ""
    patch_w = sd[f"{p}embeddings.patch_embedding.weight"]  # [H, 3, ps, ps]
    hidden, _, patch = patch_w.shape[0], patch_w.shape[1], patch_w.shape[2]
    n_pos = sd[f"{p}embeddings.position_embedding.weight"].shape[0]
    image_size = int(round((n_pos - 1) ** 0.5)) * patch
    layer_ids = [int(k.split(".layers.")[1].split(".")[0]) for k in sd
                 if ".layers." in k]
    num_heads = _KNOWN_VISION_HEADS.get(int(hidden))
    if num_heads is None:
        num_heads = max(1, int(hidden) // 64)
        import warnings
        warnings.warn(
            f"infer_clip_vision_config: unknown CLIP vision hidden size "
            f"{int(hidden)} — guessing num_heads={num_heads} by the "
            "head_dim-64 convention; pass vision_config= explicitly if "
            "this tower uses a different head count", RuntimeWarning,
            stacklevel=2)
    proj = sd.get("visual_projection.weight")
    return CLIPVisionConfig(
        image_size=image_size, patch_size=int(patch), hidden_size=int(hidden),
        num_layers=max(layer_ids) + 1,
        num_heads=num_heads,
        intermediate_size=int(
            sd[f"{p}encoder.layers.0.mlp.fc1.weight"].shape[0]),
        projection_dim=int(proj.shape[0]) if proj is not None
        else CLIP_VISION_VIT_L_14.projection_dim)


class Q16Eval:
    def __init__(self, prompts_path: str,
                 clip_weights_path: Optional[str] = None,
                 vision_params=None,
                 vision_config=None):
        self.classifier = Q16Classifier.from_file(prompts_path)
        cfg = vision_config or CLIP_VISION_VIT_L_14
        if vision_params is not None:
            self.params = vision_params
        elif clip_weights_path is not None:
            from ..models.weights import convert_clip_vision, load_state_dict
            sd = load_state_dict(clip_weights_path)
            if vision_config is None:
                cfg = infer_clip_vision_config(sd)
            self.params = convert_clip_vision(sd, cfg)
        else:
            raise ValueError("Q16Eval needs CLIP ViT-L/14 vision weights "
                             "(clip_weights_path or vision_params)")
        # device-resident once, on EVERY branch (converters — and callers
        # passing vision_params — may hand numpy trees; numpy jit args
        # re-upload the ~300M-param tower on every gate call)
        self.params = jax.tree_util.tree_map(jax.device_put, self.params)
        self.vision_config = cfg
        self.model = CLIPVisionModel(cfg)
        # params as a jit ARGUMENT, not a closure constant: closed-over
        # real-scale towers blow the remote-compile request limit (the
        # HTTP-413 rule, pipeline/diffusion.py)
        self._embed = jax.jit(lambda p, px: self.model.apply(p, px)[2])

    def compute_embeddings(self, images) -> jax.Array:
        arr = np.stack([np.asarray(img.convert("RGB") if hasattr(img, "convert")
                                   else img) for img in images])
        return self._embed(self.params,
                           preprocess_clip(jnp.asarray(arr),
                                           size=self.vision_config.image_size))

    def __call__(self, samples, threshold: float = 0.6):
        """(unsafe: bool, max similarity) — threshold unused for Q16 parity
        (argmax semantics, reference run_nudity.py:229-244)."""
        embs = self.compute_embeddings(samples)
        unsafe, pred = self.classifier(embs)
        pred_np = np.asarray(pred)
        pred_out = float(pred_np[0]) if len(samples) == 1 else pred_np
        return bool(np.asarray(unsafe).max()), pred_out

    def eval_many(self, groups, threshold: float = 0.6):
        """Batched gate over multiple cases' sample lists in ONE vision-
        tower forward (the per-case path dispatches a device program per
        image; grouping amortizes it — the runners' overlapped loops drain
        cases in groups). Per-group semantics identical to
        :meth:`__call__` with a single-image group; multi-image groups
        reduce with any/max like the reference batch."""
        flat = [img for g in groups for img in g]
        if not flat:
            return [(False, 0.0) for _ in groups]
        embs = self.compute_embeddings(flat)
        unsafe, pred = self.classifier(embs)
        unsafe = np.asarray(unsafe)
        pred = np.asarray(pred)
        out = []
        i = 0
        for g in groups:
            j = i + len(g)
            if len(g) == 0:
                out.append((False, 0.0))
            else:
                out.append((bool(unsafe[i:j].max()),
                            float(pred[i]) if len(g) == 1 else pred[i:j]))
            i = j
        return out
