"""T5 encoder stack (Flax) — SD3's third text tower (T5-XXL).

Parity target: the ``text_encoder_3`` consumed by the reference's SD3
pipelines (models/sdv3/sdv3_pipeline.py:290-344, `_get_t5_prompt_embeds`,
max 256 tokens). Encoder-only: relative-position-bias attention (no q
scaling, per T5), RMSNorm pre-norm, gated-GeLU FF.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import RMSNormFp32


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


T5_XXL = T5Config()
T5_SMALL_TEST = T5Config(d_model=64, d_kv=8, d_ff=128, num_layers=2,
                         num_heads=8)


def _relative_position_bucket(relative_position: np.ndarray, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """Bidirectional bucketing (HF T5 semantics)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


class T5SelfAttention(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        b, s, _ = x.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)
        q = q.reshape(b, s, cfg.num_heads, cfg.d_kv)
        k = k.reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = v.reshape(b, s, cfg.num_heads, cfg.d_kv)
        # T5: no 1/sqrt(d) scaling
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + position_bias
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.reshape(b, s, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                        name="o")(out)


class T5Block(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.config
        h = RMSNormFp32(epsilon=cfg.layer_norm_epsilon, name="ln_attn")(x)
        x = x + T5SelfAttention(cfg, dtype=self.dtype, name="attn")(
            h, position_bias)
        h = RMSNormFp32(epsilon=cfg.layer_norm_epsilon, name="ln_ff")(x)
        wi0 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype,
                       name="wi_0")(h)
        wi1 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype,
                       name="wi_1")(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        return x + nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                            name="wo")(h)


class T5Encoder(nn.Module):
    config: T5Config = field(default_factory=T5Config)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        cfg = self.config
        s = input_ids.shape[1]
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                     name="token_embedding")(input_ids)

        # Relative position bias, shared across layers (layer-0 table in HF).
        pos = np.arange(s, dtype=np.int64)
        rel = pos[None, :] - pos[:, None]
        buckets = _relative_position_bucket(
            rel, cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance)
        bias_table = self.param(
            "relative_attention_bias", nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.float32)
        # static numpy bucket indices into a (possibly numpy-backed) param:
        # cast the table to jnp first so converted checkpoints work under jit
        position_bias = jnp.asarray(bias_table)[buckets]          # [S, S, H]
        position_bias = jnp.transpose(position_bias, (2, 0, 1))[None]

        for i in range(cfg.num_layers):
            x = T5Block(cfg, dtype=self.dtype, name=f"blocks_{i}")(
                x, position_bias)
        return RMSNormFp32(epsilon=cfg.layer_norm_epsilon,
                           name="final_layer_norm")(x)
