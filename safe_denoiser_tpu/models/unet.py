"""SD-v1.x UNet2DCondition (Flax, NHWC), built TPU-first.

Architectural parity with the diffusers UNet the reference samples through
(CompVis/stable-diffusion-v1-4 `unet/config.json`; the reference forks it at
models/unet.py but never uses the fork — SURVEY.md §2.2). The FreeU /
SafeGuard up-block filters (reference free_lunch_utils.py) are first-class
config here instead of runtime monkey-patches.

TPU-first choices:
  * NHWC convs; channels-last keeps the lane dimension dense for the MXU.
  * bf16 compute / fp32 GroupNorm+softmax.
  * All blocks unrolled at trace time (static architecture) — one XLA program.
  * Self/cross attention as batched einsums (models/layers.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .fourier import FreeUConfig, apply_skip_filter
from .layers import Attention, FeedForward, GroupNorm32, LayerNormFp32, timestep_embedding


@dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # SD-v1 configs store `attention_head_dim=8` which diffusers interprets as
    # the *number of heads* for this architecture.
    num_attention_heads: int = 8
    norm_num_groups: int = 32
    # diffusers norm_eps: applies to the resnet GroupNorms and conv_norm_out
    # (reference models/unet.py:169,434,540); the Transformer2D spatial
    # GroupNorm is hardcoded 1e-6 there (transformer_2d.py:507)
    norm_eps: float = 1e-5
    transformer_layers: int = 1
    freq_shift: int = 0
    flip_sin_to_cos: bool = True


SD14_UNET = UNetConfig()


class ResnetBlockTime(nn.Module):
    out_channels: int
    groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = GroupNorm32(self.groups, epsilon=self.epsilon, act="silu",
                        name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = GroupNorm32(self.groups, epsilon=self.epsilon, act="silu",
                        name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class BasicTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # NOTE(perf, settled round 3 — see tools_block_trace.py): the round-1
        # "flash2 anchors a seq-minor layout that slows the ff/qkv matmuls"
        # theory is REFUTED. A 4-variant same-session block-level trace A/B
        # (bhsd 5.013 ms / nt 5.092 / nt+repack-with-zero-HLO-transposes
        # 5.096 / Pallas layout anchors 5.120) shows identical matmul-fusion
        # times in every variant; the matmuls sit at their intrinsic
        # lane-padding ceiling (C=320 -> 384 on both contraction and output:
        # ~69-83%). The real round-2 gap was the f32 erf gelu + f32 sigmoid
        # (see _gelu_for / ops.group_norm._fast_act_ok). The layout-anchor
        # module was deleted after losing its re-run.
        h = LayerNormFp32(name="norm1")(x)
        x = x + Attention(self.num_heads, self.head_dim, dtype=self.dtype,
                          name="attn1")(h)
        h = LayerNormFp32(name="norm2")(x)
        x = x + Attention(self.num_heads, self.head_dim,
                          context_dim=self.context_dim, dtype=self.dtype,
                          name="attn2")(h, context=context)
        h = LayerNormFp32(name="norm3")(x)
        return x + FeedForward(dtype=self.dtype, name="ff")(h)


class Transformer2D(nn.Module):
    num_heads: int
    head_dim: int
    context_dim: int
    num_layers: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        x = GroupNorm32(self.groups, name="norm")(x)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        for i in range(self.num_layers):
            x = BasicTransformerBlock(self.num_heads, self.head_dim,
                                      self.context_dim, dtype=self.dtype,
                                      name=f"blocks_{i}")(x, context)
        x = x.reshape(b, h, w, c)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + res


class DownsampleT(nn.Module):
    """Stride-2 conv with SYMMETRIC padding=1 — the SD UNet's
    downsample_padding=1 (unlike the VAE's asymmetric (0,1) pad)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv")(x)


class UpsampleT(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os

        from ..ops import conv3x3 as _c3
        from .vae import Conv3x3

        b, h, w, c = x.shape
        # default ON since the 2026-08-18 same-session ABA: headline
        # 1.5452 vs 1.5357/1.5363 controls = +0.58% (kernel itself measured
        # 1.31x vs XLA at [8,32,32,640]); CPU/f32 paths are ungated below
        flag = os.environ.get("SDT_PALLAS_UPCONV", "1")
        if (flag in ("1", "interpret") and x.dtype == jnp.bfloat16
                and _c3.supports_up(x.shape, c, self.out_channels)
                and (flag == "interpret"
                     or jax.default_backend() == "tpu")):
            # factored upsample conv (ops/conv3x3.py::_up_kernel_planar):
            # 4/9 the MACs and no materialized 2x tensor. Planar form — the
            # 640-channel weight block only fits VMEM per-parity. Conv3x3
            # keeps the nn.Conv param tree (child 'conv' with kernel/bias).
            return Conv3x3(self.out_channels, dtype=self.dtype,
                           name="conv")(x, upsample=True, form="planar")
        # r2 note said resize's gather fusion beat reshape+broadcast in the
        # scan; the r3 fusion landscape (fast gelu/silu) changed the
        # neighbors, so the choice is env-switchable for same-session A/Bs
        # (the VAE decoder measured rbroad clearly better and uses it
        # unconditionally)
        if os.environ.get("SDT_UPSAMPLE", "resize") == "rbroad":
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (b, h, 2, w, 2, c)).reshape(b, h * 2,
                                                             w * 2, c)
        else:
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class UNet2DCondition(nn.Module):
    config: UNetConfig = field(default_factory=UNetConfig)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array, timesteps: jax.Array,
                 encoder_hidden_states: jax.Array,
                 freeu: Optional[FreeUConfig] = None) -> jax.Array:
        """sample: [B, H, W, C_lat]; timesteps: [] or [B]; context: [B, S, D].

        ``freeu`` enables the FreeU/SafeGuard skip filters on the two
        highest-channel up stages (reference free_lunch_utils.py:151-225;
        requires the 3-way CFG batch layout when mode != 'freeu')."""
        cfg = self.config
        heads = cfg.num_attention_heads
        n_blocks = len(cfg.block_out_channels)

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0],
                                  flip_sin_to_cos=cfg.flip_sin_to_cos,
                                  downscale_freq_shift=cfg.freq_shift)
        time_dim = cfg.block_out_channels[0] * 4
        temb = nn.Dense(time_dim, dtype=self.dtype, name="time_emb_1")(
            temb.astype(self.dtype))
        temb = nn.Dense(time_dim, dtype=self.dtype, name="time_emb_2")(
            nn.silu(temb))

        ctx = encoder_hidden_states.astype(self.dtype)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))

        # ---- down: CrossAttnDownBlock2D ×(n-1) + DownBlock2D --------------
        skips = [x]
        for i, ch in enumerate(cfg.block_out_channels):
            has_attn = i < n_blocks - 1
            for j in range(cfg.layers_per_block):
                x = ResnetBlockTime(ch, cfg.norm_num_groups, cfg.norm_eps,
                                    dtype=self.dtype,
                                    name=f"down_{i}_resnets_{j}")(x, temb)
                if has_attn:
                    x = Transformer2D(heads, ch // heads,
                                      cfg.cross_attention_dim,
                                      cfg.transformer_layers,
                                      cfg.norm_num_groups, dtype=self.dtype,
                                      name=f"down_{i}_attentions_{j}")(x, ctx)
                skips.append(x)
            if i < n_blocks - 1:
                x = DownsampleT(ch, dtype=self.dtype,
                                name=f"down_{i}_downsample")(x)
                skips.append(x)

        # ---- mid ----------------------------------------------------------
        mid_ch = cfg.block_out_channels[-1]
        x = ResnetBlockTime(mid_ch, cfg.norm_num_groups, cfg.norm_eps,
                            dtype=self.dtype,
                            name="mid_resnets_0")(x, temb)
        x = Transformer2D(heads, mid_ch // heads, cfg.cross_attention_dim,
                          cfg.transformer_layers, cfg.norm_num_groups,
                          dtype=self.dtype, name="mid_attentions_0")(x, ctx)
        x = ResnetBlockTime(mid_ch, cfg.norm_num_groups, cfg.norm_eps,
                            dtype=self.dtype,
                            name="mid_resnets_1")(x, temb)

        # ---- up: UpBlock2D + CrossAttnUpBlock2D ×(n-1) --------------------
        rev = list(reversed(cfg.block_out_channels))
        # FreeU stage channels: the two highest DISTINCT counts (reference
        # keys on hidden channels 1280 -> b1/s1, 640 -> b2/s2)
        distinct = sorted(set(cfg.block_out_channels))
        ch_hi = distinct[-1]
        ch_lo = distinct[-2] if len(distinct) > 1 else -1
        for i, ch in enumerate(rev):
            has_attn = i > 0
            for j in range(cfg.layers_per_block + 1):
                res = skips.pop()
                if freeu is not None and x.shape[-1] in (ch_hi, ch_lo):
                    if x.shape[-1] == ch_hi:
                        b_scale, s_scale = freeu.b1, freeu.s1
                    else:
                        b_scale, s_scale = freeu.b2, freeu.s2
                    half = x.shape[-1] // 2
                    x = x.at[..., :half].multiply(b_scale)
                    res = apply_skip_filter(res, freeu, s_scale)
                x = jnp.concatenate([x, res], axis=-1)
                x = ResnetBlockTime(ch, cfg.norm_num_groups, cfg.norm_eps,
                                    dtype=self.dtype,
                                    name=f"up_{i}_resnets_{j}")(x, temb)
                if has_attn:
                    x = Transformer2D(heads, ch // heads,
                                      cfg.cross_attention_dim,
                                      cfg.transformer_layers,
                                      cfg.norm_num_groups, dtype=self.dtype,
                                      name=f"up_{i}_attentions_{j}")(x, ctx)
            if i < n_blocks - 1:
                x = UpsampleT(ch, dtype=self.dtype, name=f"up_{i}_upsample")(x)

        x = GroupNorm32(cfg.norm_num_groups, epsilon=cfg.norm_eps,
                        act="silu", name="conv_norm_out")(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return x.astype(jnp.float32)
