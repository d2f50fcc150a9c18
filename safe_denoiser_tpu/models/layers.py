"""Shared neural-net building blocks (Flax linen), TPU-first.

Conventions (differ deliberately from the torch reference):
  * Convolutions are NHWC — the TPU-native layout (the reference's diffusers
    stack is NCHW; layout conversion happens only at the .pt cache / image IO
    boundary).
  * Mixed precision: ``dtype`` is the compute dtype (bf16 on TPU),
    ``param_dtype`` the storage dtype; normalizations and softmax always
    accumulate in fp32.
  * Attention is a single batched einsum formulation so XLA can tile it onto
    the MXU; no per-head Python loops.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def timestep_embedding(timesteps: jax.Array, dim: int,
                       max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       scale: float = 1.0) -> jax.Array:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding semantics;
    reference consumes it via diffusers Timesteps — e.g. models/unet.py usage)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = scale * emb
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class _GNParams(nn.Module):
    """Parameter holder matching flax nn.GroupNorm's tree (scale/bias)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


class _DenseParams(nn.Module):
    """Parameter holder matching flax nn.Dense's tree (kernel[/bias])."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        return kernel, bias


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics; optional fused activation.

    On TPU this lowers to the fused single-pass Pallas kernel
    (ops/group_norm.py) — measured ~25% of UNet device time goes to XLA's
    norm convert+reduce fusions otherwise. The param tree stays identical to
    flax nn.GroupNorm (child 'GroupNorm_0' with scale/bias) so checkpoint
    converters are unaffected.
    """

    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x, coefs_only: bool = False):
        from ..ops.group_norm import gn_affine_coefs, group_norm

        scale, bias = _GNParams(x.shape[-1], name="GroupNorm_0")()
        shape = x.shape
        if coefs_only:
            # f32 (a_c, b_c) [B, C] for the fused Pallas conv prologue
            # (ops/conv3x3.py) — the affine apply (+ the trailing act) then
            # happens inside the consumer's halo band instead of here
            return gn_affine_coefs(x.reshape(shape[0], -1, shape[-1]),
                                   scale, bias, self.num_groups, self.epsilon)
        y = group_norm(x.reshape(shape[0], -1, shape[-1]), scale, bias,
                       self.num_groups, self.epsilon, self.act)
        return y.reshape(shape)


class LayerNormFp32(nn.Module):
    """LayerNorm with fp32 statistics. Under bf16 compute the scale/bias
    application happens at bf16 (the output is cast to bf16 regardless, so
    this differs by ~1 ulp while halving the elementwise bandwidth — same
    argument as ops/group_norm._fast_act_ok). SDT_FAST_SILU=0 opts out."""

    epsilon: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        from ..ops.group_norm import _fast_act_ok
        apply_dtype = orig_dtype if _fast_act_ok(orig_dtype) else jnp.float32
        x = nn.LayerNorm(epsilon=self.epsilon, use_bias=self.use_bias,
                         use_scale=self.use_scale,
                         dtype=apply_dtype, param_dtype=jnp.float32)(
            x.astype(jnp.float32))
        return x.astype(orig_dtype)


class RMSNormFp32(nn.Module):
    epsilon: float = 1e-6
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                               jnp.float32)
            x = x * scale
        return x.astype(orig_dtype)


# Attention implementation switch: 'einsum' | 'flash' | 'flash2'.
#   flash2 (default): custom head_dim<=128 self-attention kernel
#     (ops/attention.py) — 3.04 ms vs stock 4.13 ms per [8,8,4096,40]
#     CFG-folded layer on v5e (92% of the padded-head-dim roofline).
#   flash: stock jax.experimental.pallas flash_attention (fallback for
#     shapes flash2 doesn't take).
#   einsum: XLA path; the [S, S] logits materialize, used for masked /
#     cross-attention (77-token KV) and on CPU.
ATTENTION_IMPL = os.environ.get("SDT_ATTENTION", "flash2")
_FLASH_MIN_SEQ = 512


def _flash_available() -> bool:
    return jax.default_backend() == "tpu"


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          mask: Optional[jax.Array] = None) -> jax.Array:
    """[B, S, H, D] attention with fp32 softmax accumulation."""
    depth = q.shape[-1]
    s_q, s_kv = q.shape[1], k.shape[1]
    if (ATTENTION_IMPL == "flash2" and mask is None and _flash_available()):
        from ..ops import attention as attn_ops
        if attn_ops.supports(s_q, s_kv, depth):
            return attn_ops.self_attention(q, k, v, float(depth) ** -0.5)
    if (ATTENTION_IMPL in ("flash", "flash2") and mask is None and s_q == s_kv
            and s_q >= _FLASH_MIN_SEQ and s_q % 512 == 0
            and _flash_available()):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention)
        # whole-KV tiles: k/v stay resident per q-block (2 MB each at padded
        # head_dim 128), removing the online-softmax rescale passes
        bq = min(512, s_q)
        bk = min(2048, s_kv)
        bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                        block_q_major_dkv=bq, block_k_major_dkv=bk,
                        block_k_dkv=bk, block_q_dkv=bq,
                        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
        # bf16 q/k/v feed the MXU directly; the kernel accumulates fp32
        flash_dtype = jnp.bfloat16 if v.dtype == jnp.bfloat16 else jnp.float32
        out = flash_attention(
            jnp.transpose(q, (0, 2, 1, 3)).astype(flash_dtype),
            jnp.transpose(k, (0, 2, 1, 3)).astype(flash_dtype),
            jnp.transpose(v, (0, 2, 1, 3)).astype(flash_dtype),
            sm_scale=float(depth) ** -0.5, block_sizes=bs)
        return jnp.transpose(out, (0, 2, 1, 3)).astype(v.dtype)

    q = q * (depth ** -0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


class Attention(nn.Module):
    """Multi-head attention over [B, S, C] with optional cross-attention
    context [B, S_kv, C_kv]."""

    num_heads: int
    head_dim: int
    out_dim: Optional[int] = None
    context_dim: Optional[int] = None
    use_qkv_bias: bool = False
    use_out_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        is_self = context is None
        context = x if context is None else context
        inner = self.num_heads * self.head_dim
        # QDense == nn.Dense bit-for-bit on f32/bf16 kernels; it only takes
        # the int8 path when quantize_unet_params pre-quantized this kernel
        dense = lambda feats, bias, name: QDense(
            feats, use_bias=bias, dtype=self.dtype, name=name)
        if os.environ.get("SDT_FUSED_QKV", "0") == "1":
            # Fused projections: one [C, 3*inner] (self) / [C_kv, 2*inner]
            # (cross k/v) dot instead of three/two [*, inner] dots. On the
            # 128-lane MXU this amortizes the output-lane padding the SD-v1
            # widths suffer (inner=320 pads to 384 = +20% per dot; 960 pads
            # to 1024 = +6.7%, 640 pads to exactly 5x128 = 0). Param tree is
            # unchanged (to_q/to_k/to_v kernels, converter-compatible); the
            # concat of loop-invariant weights is hoisted out of the scan by
            # XLA's LICM. Numerics: each output element is the same dot
            # product, so this is bit-identical to the unfused path.
            # MEASURED A LOSS on v5e (2026-08-18 same-session ABA, 50-step
            # headline: fused 1.5268 vs controls 1.5451/1.5448 = -1.18%,
            # drift -0.02%) — the padding saved on the projection dots is
            # outweighed downstream (the 3-way output split breaks XLA's
            # dot+epilogue fusions). Default stays OFF; kept as a
            # documented negative result. Do not re-flip without a new
            # mechanism.
            wq, bq = _DenseParams(inner, self.use_qkv_bias,
                                  name="to_q")(x.shape[-1])
            wk, bk = _DenseParams(inner, self.use_qkv_bias,
                                  name="to_k")(context.shape[-1])
            wv, bv = _DenseParams(inner, self.use_qkv_bias,
                                  name="to_v")(context.shape[-1])
            if wq.dtype == jnp.int8:
                raise ValueError(
                    "SDT_FUSED_QKV=1 cannot run on int8-quantized kernels "
                    "(the fused concat has no per-column dequant path); "
                    "unset SDT_FUSED_QKV or skip quantize_unet_params")

            def dot(inp, w, bs):
                y = jnp.dot(inp.astype(self.dtype), w.astype(self.dtype))
                return y if bs is None else y + bs.astype(self.dtype)

            if is_self:
                qkv = dot(x, jnp.concatenate([wq, wk, wv], axis=1),
                          jnp.concatenate([bq, bk, bv])
                          if self.use_qkv_bias else None)
                q = qkv[..., :inner]
                k = qkv[..., inner:2 * inner]
                v = qkv[..., 2 * inner:]
            else:
                q = dot(x, wq, bq)
                kv = dot(context, jnp.concatenate([wk, wv], axis=1),
                         jnp.concatenate([bk, bv])
                         if self.use_qkv_bias else None)
                k = kv[..., :inner]
                v = kv[..., inner:]
        else:
            q = dense(inner, self.use_qkv_bias, "to_q")(x)
            k = dense(inner, self.use_qkv_bias, "to_k")(context)
            v = dense(inner, self.use_qkv_bias, "to_v")(context)
        b, s, _ = q.shape
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, context.shape[1], self.num_heads, self.head_dim)
        v = v.reshape(b, context.shape[1], self.num_heads, self.head_dim)
        out = dot_product_attention(q, k, v, mask=mask)
        out = out.reshape(b, s, inner)
        return dense(self.out_dim or x.shape[-1], self.use_out_bias, "to_out")(out)


class QDense(nn.Module):
    """Drop-in ``nn.Dense`` that runs the dot in int8 when its kernel arrives
    pre-quantized (W8A8, ``ops/quant.py``).

    Param tree and default initializers are identical to ``nn.Dense``
    (kernel[/bias]) so converters and checkpoints are unaffected. With an f32
    /bf16 kernel the math is bit-identical to ``nn.Dense`` (same
    promote_dtype + dot_general + bias broadcast). With an int8 kernel (from
    ``quantize_mmdit_params``) it reads the per-column scale from the
    ``quant`` collection and runs the dynamic-activation int8 dot — measured
    1.3-1.76x the bf16 dot at SD3 MMDiT shapes on v5e (tools_int8_probe.py).
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        if kernel.dtype == jnp.int8:
            if not self.has_variable("quant", "kernel_scale"):
                raise ValueError(
                    f"{self.name}: int8 kernel but no 'quant' collection — "
                    "pass the quant tree from quantize_mmdit_params as "
                    "apply({'params': ..., 'quant': ...})")
            sw = self.get_variable("quant", "kernel_scale")
            from ..ops.quant import int8_dense
            return int8_dense(x, kernel, sw, bias, self.dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        y = jax.lax.dot_general(x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y


def _gelu_for(dtype) -> Callable:
    """Exact-erf gelu for f32; tanh-form for bf16 compute.

    Measured on v5e (r3 microbench, [32768, 1280] GEGLU gate): XLA's f32 erf
    polynomial costs +0.48 ms per level-0 transformer layer — 77% of the
    layer's entire matmul bill — while the tanh form is free (+0.01 ms).
    max|gelu_erf - gelu_tanh| = 4.8e-4 absolute over all x, below the bf16
    resolution of the activations it feeds (ulp(1.0)=3.9e-3), so under bf16
    compute the two are within quantization noise of each other. f32 compute
    (CPU tests, parity harnesses) keeps the exact erf the torch reference
    uses. Opt out with SDT_FAST_GELU=0."""
    if dtype == jnp.bfloat16 and os.environ.get("SDT_FAST_GELU", "1") == "1":
        return lambda x: nn.gelu(x, approximate=True)
    return lambda x: nn.gelu(x, approximate=False)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = QDense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * _gelu_for(self.dtype)(gate)


class FeedForward(nn.Module):
    dim_out: Optional[int] = None
    mult: int = 4
    activation: str = "geglu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = x.shape[-1] * self.mult
        dim_out = self.dim_out or x.shape[-1]
        if self.activation == "geglu":
            h = GEGLU(inner, dtype=self.dtype, name="net_0")(x)
        elif self.activation == "gelu":
            h = _gelu_for(self.dtype)(
                QDense(inner, dtype=self.dtype, name="net_0")(x))
        elif self.activation == "gelu-approximate":
            h = nn.gelu(QDense(inner, dtype=self.dtype, name="net_0")(x),
                        approximate=True)
        else:
            raise ValueError(self.activation)
        return QDense(dim_out, dtype=self.dtype, name="net_2")(h)


ACT2FN: dict[str, Callable] = {
    "silu": nn.silu,
    "swish": nn.silu,
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
    "quick_gelu": lambda x: x * nn.sigmoid(1.702 * x),
    "relu": nn.relu,
    "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
}
