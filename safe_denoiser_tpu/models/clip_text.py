"""CLIP text encoder (Flax), configurable for every tower the reference uses.

Covers:
  * SD-v1.4's CLIP ViT-L/14 text encoder (quick_gelu, 12×768) — the encoder
    behind ``pipe.text_encoder`` in the reference
    (models/textuals_visual/modified_safree_diffusion_pipeline_threshold_time.py
    `_new_encode_prompt`).
  * SD3's CLIP-L ("text_encoder") and OpenCLIP bigG ("text_encoder_2",
    32×1280, gelu) towers (reference models/sdv3/sdv3_pipeline.py:346-399),
    including the ``clip_skip``-style penultimate hidden state and the pooled
    projection output.

TPU-first: single jitted forward, causal mask built at trace time, fp32
layer norms, bf16 matmuls.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ACT2FN, Attention, LayerNormFp32


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    intermediate_size: int = 3072
    hidden_act: str = "quick_gelu"
    projection_dim: int = 768
    eos_token_id: int = 49407
    layer_norm_eps: float = 1e-5


# Presets matching the reference's checkpoints.
CLIP_VIT_L_14 = CLIPTextConfig()  # SD-v1.4 / SD3 text_encoder
CLIP_BIG_G = CLIPTextConfig(hidden_size=1280, num_layers=32, num_heads=20,
                            intermediate_size=5120, hidden_act="gelu",
                            projection_dim=1280)  # SD3 text_encoder_2


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        h = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="layer_norm1")(x)
        h = Attention(num_heads=cfg.num_heads,
                      head_dim=cfg.hidden_size // cfg.num_heads,
                      use_qkv_bias=True, dtype=self.dtype, name="self_attn")(
            h, mask=mask)
        x = x + h
        h = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = ACT2FN[cfg.hidden_act](h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (last_hidden_state, penultimate_hidden_state, pooled, projected).

    ``pooled`` is the EOS-token hidden state after final LN (HF CLIP pooled
    output); ``projected`` applies the text projection head (needed for the
    bigG tower and Q16/CLIPScore eval paths).
    """

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array):
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         jnp.float32)
        x = tok + pos[None, :s].astype(self.dtype)

        causal = jnp.tril(jnp.ones((s, s), dtype=bool))[None, None]
        penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(
                x, causal)
        x = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="final_layer_norm")(x)

        # HF semantics: pool at the first EOS token (argmax over the eos match).
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32),
                             axis=-1)
        pooled = x[jnp.arange(b), eos_pos]
        projected = nn.Dense(cfg.projection_dim, use_bias=False,
                             dtype=self.dtype, name="text_projection")(pooled)
        return x, penultimate, pooled, projected
