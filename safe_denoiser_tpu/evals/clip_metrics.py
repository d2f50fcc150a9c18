"""CLIP-based evaluators: CLIPScore, Q16, AES — on the framework's towers.

  * ``clip_score`` — torchmetrics.CLIPScore semantics: 100·max(cos(img, txt), 0)
    averaged over pairs, with clip-vit-base-patch32 towers
    (reference evaluations/base_image.py:144-157).
  * ``Q16Classifier`` — OpenAI CLIP ViT-L/14 image embeddings against two
    learned prompt embeddings; argmax==1 ⇒ inappropriate
    (reference run_nudity.py:145-245; prompts from Q16_prompts.p /
    q16_prompts.pt, loaded fp16).
  * ``AestheticMLP`` — the sac+logos+ava1-l14-linearMSE MLP over L2-normalized
    ViT-L/14 embeddings (reference evaluations/utils/aes.py:7-100).
"""

from __future__ import annotations

import pickle
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..io import load_pt


def clip_score(image_embeds: jax.Array, text_embeds: jax.Array) -> jax.Array:
    """Per-pair CLIPScore: 100 * max(cosine, 0). Inputs [N, D] (projected)."""
    a = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    b = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    return 100.0 * jnp.maximum(jnp.sum(a * b, axis=-1), 0.0)


class Q16Classifier:
    """similarity = 100 · cos(img, prompt); label 1 ⇒ inappropriate."""

    def __init__(self, prompts: np.ndarray):
        assert prompts.shape[0] == 2, "Q16 uses exactly two prompt embeddings"
        self.prompts = jnp.asarray(prompts, dtype=jnp.float32)

    @classmethod
    def from_file(cls, path: str) -> "Q16Classifier":
        if path.endswith(".pt"):
            data = np.asarray(load_pt(path), dtype=np.float32)
        else:
            with open(path, "rb") as f:
                data = np.asarray(pickle.load(f), dtype=np.float32)
        return cls(data)

    def similarities(self, image_embeds: jax.Array) -> jax.Array:
        e = self.prompts / jnp.linalg.norm(self.prompts, axis=-1, keepdims=True)
        x = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
        return 100.0 * x @ e.T                       # [N, 2]

    def __call__(self, image_embeds: jax.Array):
        """Returns (unsafe [N] bool, max_similarity [N])."""
        sim = self.similarities(image_embeds)
        return jnp.argmax(sim, axis=-1) == 1, jnp.max(sim, axis=-1)


class AestheticMLP(nn.Module):
    """768 → 1024 → 128 → 64 → 16 → 1 (dropout layers are eval-time no-ops)."""

    @nn.compact
    def __call__(self, x):
        for i, width in enumerate((1024, 128, 64, 16, 1)):
            x = nn.Dense(width, name=f"fc{i}")(x)
        return x[..., 0]


def convert_aes_mlp(sd) -> dict:
    """torch Sequential state dict (layers.{0,2,4,6,7}) → AestheticMLP params."""
    idx = [0, 2, 4, 6, 7]
    params = {}
    for i, j in enumerate(idx):
        params[f"fc{i}"] = {
            "kernel": np.ascontiguousarray(np.asarray(sd[f"layers.{j}.weight"]).T),
            "bias": np.asarray(sd[f"layers.{j}.bias"]),
        }
    return {"params": params}


def aes_score(params, image_embeds: jax.Array) -> jax.Array:
    """AES on L2-normalized embeddings (reference aes.py:27-33)."""
    x = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    return AestheticMLP().apply(params, x)
