"""CLIP vision transformer (Flax) — the image tower behind the eval stack.

The reference uses CLIP image encoders in three places: the Q16 classifier
(ViT-L/14 embeddings vs learned prompts, run_nudity.py:145-245), CLIPScore
(clip-vit-base-patch32, evaluations/base_image.py:144-157), and the AES
aesthetic MLP (ViT-L/14, evaluations/utils/aes.py). One configurable tower
covers all three plus the open_clip ViT-H-14 image-image scorer
(run_coco30k.py:172-215).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from .clip_text import CLIPEncoderLayer, CLIPTextConfig
from .layers import LayerNormFp32


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    hidden_act: str = "quick_gelu"
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


CLIP_VISION_VIT_L_14 = CLIPVisionConfig()            # Q16 / AES tower
CLIP_VISION_VIT_B_32 = CLIPVisionConfig(
    patch_size=32, hidden_size=768, num_layers=12, num_heads=12,
    intermediate_size=3072, projection_dim=512)      # CLIPScore tower
CLIP_VISION_VIT_H_14 = CLIPVisionConfig(
    hidden_size=1280, num_layers=32, num_heads=16, intermediate_size=5120,
    hidden_act="gelu", projection_dim=1024)          # open_clip coco scorer


class CLIPVisionModel(nn.Module):
    """Returns (last_hidden_state, pooled(post-LN CLS), projected)."""

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array):
        """pixel_values: [B, H, W, 3], already CLIP-normalized."""
        cfg = self.config
        b = pixel_values.shape[0]
        # reuse the text encoder-layer stack; only embeddings differ
        text_like = CLIPTextConfig(
            hidden_size=cfg.hidden_size, num_layers=cfg.num_layers,
            num_heads=cfg.num_heads, intermediate_size=cfg.intermediate_size,
            hidden_act=cfg.hidden_act, layer_norm_eps=cfg.layer_norm_eps)

        patches = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          use_bias=False, dtype=self.dtype,
                          name="patch_embedding")(
            pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, cfg.hidden_size)

        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)

        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.num_patches + 1, cfg.hidden_size), jnp.float32)
        x = x + pos[None].astype(self.dtype)
        x = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="pre_layernorm")(x)

        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(text_like, dtype=self.dtype,
                                 name=f"layers_{i}")(x, None)

        pooled = LayerNormFp32(epsilon=cfg.layer_norm_eps,
                               name="post_layernorm")(x[:, 0])
        projected = nn.Dense(cfg.projection_dim, use_bias=False,
                             dtype=self.dtype, name="visual_projection")(pooled)
        return x, pooled, projected


CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_clip(images: jax.Array, size: int = 224) -> jax.Array:
    """[B, H, W, 3] uint8/float [0,255] or [0,1] → CLIP-normalized [B,size,size,3].

    Bicubic resize like HF CLIPImageProcessor (shortest-side resize +
    center-crop are equivalent here because eval images are square).
    """
    x = images.astype(jnp.float32)
    x = jnp.where(jnp.max(x) > 2.0, x / 255.0, x)
    b, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), method="bicubic")
        x = jnp.clip(x, 0.0, 1.0)
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std
