"""AutoencoderKL VAE (Flax, NHWC), SD-v1.x / SD3 configurable.

The reference consumes the VAE through two hooks:
  * ``embed_fn = vae.encode(x).latent_dist.sample() * scaling_factor``
    (run_nudity.py:308) — builds the negative-latent bank;
  * ``vae.decode(latents / scaling_factor)`` at the end of sampling
    (decode_latents in every pipeline; SD3 additionally applies shift_factor,
    models/sdv3/sdv3_pipeline.py:1146-1148).

TPU-first: NHWC convolutions, bf16 compute with fp32 GroupNorm, attention in
the mid-block as one fused einsum over the flattened spatial axis.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import conv3x3 as _c3
from .layers import Attention, GroupNorm32


def _pallas_conv_mode(x, ci: int, co: int) -> str | None:
    """SDT_PALLAS_CONV gate for the fused halo-DMA conv (ops/conv3x3.py):
    '1' (the default since the 2026-08-18 in-situ A/B: decode 103.87 ->
    89.84 ms/batch4, 1.156x) routes bf16 TPU inputs at the VAE's shapes
    through the kernel, '0' opts out, 'interpret' forces the kernel in
    Pallas interpreter mode on any backend (CPU numerics tests). f32 and
    CPU paths are unaffected either way. Returns 'tpu'|'interpret'|None."""
    flag = os.environ.get("SDT_PALLAS_CONV", "1")
    if (flag not in ("1", "interpret") or x.dtype != jnp.bfloat16
            or not _c3.supports(x.shape, ci, co)):
        return None
    if flag == "interpret":
        return "interpret"
    return "tpu" if jax.default_backend() == "tpu" else None


class Conv3x3(nn.Module):
    """Drop-in for ``nn.Conv(out, (3, 3), padding=1)`` — identical param
    names/shapes/initializers, so checkpoints and the weight converters see
    no difference. SDT_PALLAS_CONV=1 routes bf16 TPU inputs at the VAE's
    shapes through the fused Pallas halo-DMA conv (ops/conv3x3.py), which
    also absorbs the GroupNorm affine+SiLU prologue and residual epilogue
    the callers pass in (``pre``/``act``/``residual``) — the r3 in-situ
    trace showed the unfused kernel's win was exactly cancelled by XLA
    emitting those as standalone passes (102.1 vs 101.6 ms decode). All
    other paths (f32 parity, CPU tests, unsupported shapes) run the same
    lax.conv_general_dilated composition that nn.Conv lowers to, with the
    prologue applied at x.dtype exactly like group_norm_ref's fast path."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pre=None, act=None, residual=None,
                 upsample: bool = False, form: str = "planar"):
        ci = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, ci, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.out_channels,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        if upsample:
            # callers (vae.Upsample / unet.UpsampleT) gate on supports_up;
            # x is the HALF-res input and the fallback inside conv3x3_up
            # reproduces the broadcast + conv composition
            interp = "interpret" in (os.environ.get("SDT_PALLAS_CONV", "0"),
                                     os.environ.get("SDT_PALLAS_UPCONV", "0"))
            return _c3.conv3x3_up(x, kernel, bias, form=form,
                                  interpret=interp)
        mode = _pallas_conv_mode(x, ci, self.out_channels)
        ps, pb = pre if pre is not None else (None, None)
        if mode is not None:
            return _c3.conv3x3(x, kernel, bias, ps, pb, act, residual,
                               interpret=(mode == "interpret"))
        if pre is not None:
            x = (x * ps.astype(x.dtype)[:, None, None, :]
                 + pb.astype(x.dtype)[:, None, None, :])
        if act == "silu":
            x = x * jax.nn.sigmoid(x)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(x, kernel, (1, 1), "SAME",
                                           dimension_numbers=dn)
        out = out + bias
        if residual is not None:
            out = out + residual
        return out


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0
    sample_size: int = 512
    # the SD3 VAE drops the (post_)quant convs (use_quant_conv: false)
    use_quant_conv: bool = True
    use_post_quant_conv: bool = True


SD14_VAE = VAEConfig()
SD3_VAE = VAEConfig(latent_channels=16, scaling_factor=1.5305,
                    shift_factor=0.0609, sample_size=1024,
                    use_quant_conv=False, use_post_quant_conv=False)


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.group_norm import _fast_act_ok

        norm1 = GroupNorm32(self.groups, act="silu", name="norm1")
        conv1 = Conv3x3(self.out_channels, dtype=self.dtype, name="conv1")
        norm2 = GroupNorm32(self.groups, act="silu", name="norm2")
        conv2 = Conv3x3(self.out_channels, dtype=self.dtype, name="conv2")
        b, hh, ww, ci = x.shape
        co = self.out_channels
        shortcut = x
        if ci != co:
            shortcut = nn.Conv(co, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(x)
        # fused path: GN stats stay a one-pass kernel, but the affine+silu
        # apply, the SAME-pad and the residual add all move inside the conv
        # kernel's halo band (see ops/conv3x3.py header for the in-situ
        # trace that motivated this)
        if (_pallas_conv_mode(x, ci, co) is not None
                and _c3.supports((b, hh, ww, co), co, co)
                and _fast_act_ok(x.dtype)):
            a1, b1 = norm1(x, coefs_only=True)
            h = conv1(x, pre=(a1, b1), act="silu")
            a2, b2 = norm2(h, coefs_only=True)
            return conv2(h, pre=(a2, b2), act="silu", residual=shortcut)
        h = conv1(norm1(x))
        h = conv2(norm2(h))
        return shortcut + h


class AttnBlock(nn.Module):
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = GroupNorm32(self.groups, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        x = Attention(num_heads=1, head_dim=c, use_qkv_bias=True,
                      dtype=self.dtype, name="attention")(x)
        return res + x.reshape(b, h, w, c)


class Downsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # diffusers pads (0,1,0,1) then uses stride-2 VALID conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding="VALID", dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        conv = Conv3x3(self.out_channels, dtype=self.dtype, name="conv")
        # Gate on SDT_PALLAS_UPCONV + supports_up only — the upsample kernel
        # has its own tiling predicate; the full-res kernel's supports() and
        # SDT_PALLAS_CONV are irrelevant here (same control surface as
        # unet.UpsampleT, so one switch governs all upsample-conv A/Bs).
        up_flag = os.environ.get("SDT_PALLAS_UPCONV", "1")
        if (up_flag in ("1", "interpret") and x.dtype == jnp.bfloat16
                and _c3.supports_up(x.shape, c, self.out_channels)
                and (up_flag == "interpret"
                     or jax.default_backend() == "tpu")):
            # upsample-fused kernel: never materializes the 2x tensor and
            # does 4/9 the MACs (ops/conv3x3.py::_up_kernel factorization).
            # planar is the default: the interleave form's in-kernel column
            # interleave fails the Mosaic compile on v5e (2026-08-18 A/B),
            # while planar measured 1.73-3.01x vs XLA at the VAE upsamples
            return conv(x, upsample=True,
                        form=os.environ.get("SDT_UP_FORM", "planar"))
        # broadcast-reshape nearest-2x: r3 probe at [4,256,256,512] bf16
        # measured 0.20 ms vs jax.image.resize's gather lowering at 0.69 ms
        # (select fusions + copies); decode-level trace confirmed the win
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (b, h, 2, w, 2, c)).reshape(b, h * 2, w * 2, c)
        return conv(x)


class MidBlock(nn.Module):
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = ResnetBlock(c, self.groups, dtype=self.dtype, name="resnets_0")(x)
        x = AttnBlock(self.groups, dtype=self.dtype, name="attentions_0")(x)
        return ResnetBlock(c, self.groups, dtype=self.dtype, name="resnets_1")(x)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                name=f"down_{i}_resnets_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                x = Downsample(ch, dtype=self.dtype,
                               name=f"down_{i}_downsample")(x)
        x = MidBlock(cfg.norm_num_groups, dtype=self.dtype, name="mid_block")(x)
        x = GroupNorm32(cfg.norm_num_groups, act="silu",
                        name="conv_norm_out")(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        chans = list(reversed(cfg.block_out_channels))
        x = nn.Conv(chans[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        x = MidBlock(cfg.norm_num_groups, dtype=self.dtype, name="mid_block")(x)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                name=f"up_{i}_resnets_{j}")(x)
            if i < len(chans) - 1:
                x = Upsample(ch, dtype=self.dtype, name=f"up_{i}_upsample")(x)
        x = GroupNorm32(cfg.norm_num_groups, act="silu",
                        name="conv_norm_out")(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """``method``-dispatched so one param tree serves encode and decode."""

    config: VAEConfig = field(default_factory=VAEConfig)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        if self.config.use_quant_conv:
            self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                      dtype=self.dtype)
        if self.config.use_post_quant_conv:
            self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                           dtype=self.dtype)

    def encode(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """NHWC image in [-1, 1] → (mean, logvar) of the latent Gaussian."""
        moments = self.encoder(x)
        if self.config.use_quant_conv:
            moments = self.quant_conv(moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def sample_latent(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        """latent_dist.sample() — used by the reference ``embed_fn``."""
        mean, logvar = self.encode(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)

    def decode(self, z: jax.Array) -> jax.Array:
        if self.config.use_post_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(self, x, rng):
        return self.decode(self.sample_latent(x, rng))
