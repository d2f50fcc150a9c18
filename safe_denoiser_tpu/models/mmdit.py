"""SD3 MMDiT transformer (Flax, patches-last), TPU-first.

Architectural parity with the SD3Transformer2DModel the reference's SD3
pipelines sample through (models/sdv3/sdv3_pipeline.py — forked diffusers
StableDiffusion3Pipeline; transformer config = stable-diffusion-3-medium).

TPU-first: the whole 24-block stack is one traced program; joint attention is
a single [image ; text]-sequence einsum attention so the MXU sees one big
batched matmul per block, bf16 compute with fp32 norms/softmax.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (LayerNormFp32, QDense, RMSNormFp32,
                     dot_product_attention, timestep_embedding)


@dataclass(frozen=True)
class MMDiTConfig:
    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    num_heads: int = 24
    head_dim: int = 64
    joint_attention_dim: int = 4096     # T5 / projected-CLIP context width
    caption_projection_dim: int = 1536  # = num_heads * head_dim
    pooled_projection_dim: int = 2048   # CLIP-L(768) + bigG(1280) pooled
    pos_embed_max_size: int = 192
    qk_norm: Optional[str] = None       # None (SD3-medium) | "rms_norm" (SD3.5)


SD3_MEDIUM = MMDiTConfig()


class AdaLayerNormZero(nn.Module):
    """LN with 6-way (shift/scale/gate ×2) modulation from the time+text emb."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        mod = nn.Dense(6 * self.dim, dtype=self.dtype, name="linear")(
            nn.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            jnp.split(mod, 6, axis=-1))
        h = LayerNormFp32(epsilon=1e-6, use_bias=False, use_scale=False,
                          name="norm")(x)
        h = h * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return h, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormContinuous(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        mod = nn.Dense(2 * self.dim, dtype=self.dtype, name="linear")(
            nn.silu(emb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        h = LayerNormFp32(epsilon=1e-6, use_bias=False, use_scale=False,
                          name="norm")(x)
        return h * (1 + scale[:, None]) + shift[:, None]


class MLP(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = QDense(self.dim * 4, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=True)
        return QDense(self.dim, dtype=self.dtype, name="fc2")(h)


class JointBlock(nn.Module):
    config: MMDiTConfig
    context_pre_only: bool = False
    dtype: jnp.dtype = jnp.float32
    # sequence parallelism (parallel/sp.py): mesh with (data, seq) axes; the
    # image-token S dim is sharded over 'seq', context stays replicated
    sp_mesh: Optional[object] = None
    sp_axes: tuple = ("data", "seq")

    @nn.compact
    def __call__(self, x, context, emb):
        cfg = self.config
        dim = cfg.num_heads * cfg.head_dim

        xh, x_gate, x_shift_mlp, x_scale_mlp, x_gate_mlp = AdaLayerNormZero(
            dim, dtype=self.dtype, name="norm1")(x, emb)
        if self.context_pre_only:
            ch = AdaLayerNormContinuous(dim, dtype=self.dtype,
                                        name="norm1_context")(context, emb)
        else:
            ch, c_gate, c_shift_mlp, c_scale_mlp, c_gate_mlp = AdaLayerNormZero(
                dim, dtype=self.dtype, name="norm1_context")(context, emb)

        def qkv(h, prefix):
            q = QDense(dim, dtype=self.dtype, name=f"{prefix}q")(h)
            k = QDense(dim, dtype=self.dtype, name=f"{prefix}k")(h)
            v = QDense(dim, dtype=self.dtype, name=f"{prefix}v")(h)
            b, s, _ = h.shape
            shp = (b, s, cfg.num_heads, cfg.head_dim)
            q, k, v = q.reshape(shp), k.reshape(shp), v.reshape(shp)
            if cfg.qk_norm == "rms_norm":
                q = RMSNormFp32(name=f"{prefix}norm_q")(q)
                k = RMSNormFp32(name=f"{prefix}norm_k")(k)
            return q, k, v

        xq, xk, xv = qkv(xh, "attn_")
        cq, ck, cv = qkv(ch, "attn_add_")
        if self.sp_mesh is not None:
            # sequence-parallel joint attention: Q stays local, image K/V
            # all-gather over the 'seq' ICI axis (parallel/sp.py)
            from ..parallel.sp import sp_joint_attention
            x_out, c_out = sp_joint_attention(
                xq, xk, xv, cq, ck, cv, self.sp_mesh,
                seq_axis=self.sp_axes[1], data_axis=self.sp_axes[0])
            x_out = x_out.reshape(x_out.shape[0], x_out.shape[1], dim)
            c_out = c_out.reshape(c_out.shape[0], c_out.shape[1], dim)
        else:
            s_img = x.shape[1]
            q = jnp.concatenate([xq, cq], axis=1)
            k = jnp.concatenate([xk, ck], axis=1)
            v = jnp.concatenate([xv, cv], axis=1)
            out = dot_product_attention(q, k, v)
            out = out.reshape(out.shape[0], out.shape[1], dim)
            x_out, c_out = out[:, :s_img], out[:, s_img:]

        x_out = QDense(dim, dtype=self.dtype, name="attn_to_out")(x_out)
        x = x + x_gate[:, None] * x_out
        xh = LayerNormFp32(epsilon=1e-6, use_bias=False, use_scale=False,
                           name="norm2")(x)
        xh = xh * (1 + x_scale_mlp[:, None]) + x_shift_mlp[:, None]
        x = x + x_gate_mlp[:, None] * MLP(dim, dtype=self.dtype, name="ff")(xh)

        if self.context_pre_only:
            return x, None
        c_out = QDense(dim, dtype=self.dtype, name="attn_to_add_out")(c_out)
        context = context + c_gate[:, None] * c_out
        ch = LayerNormFp32(epsilon=1e-6, use_bias=False, use_scale=False,
                           name="norm2_context")(context)
        ch = ch * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        context = context + c_gate_mlp[:, None] * MLP(
            dim, dtype=self.dtype, name="ff_context")(ch)
        return x, context


def _pos_embed_2d(embed_dim: int, grid_size: int,
                  base_size: int) -> jnp.ndarray:
    """Fixed 2D sin-cos table [grid², D], diffusers get_2d_sincos_pos_embed
    semantics: positions are scaled by grid_size/base_size (base_size =
    sample_size // patch_size — SD3-medium trains with idx/3 frequencies for
    its 192-max table), and the FIRST embedding half comes from the
    column-varying (w) meshgrid output, matching diffusers' grid ordering."""
    import numpy as np

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid = np.arange(grid_size, dtype=np.float64) / (grid_size / base_size)
    gw, gh = np.meshgrid(grid, grid)  # gw varies along columns (w axis)
    first = _1d(embed_dim // 2, gw)   # diffusers' "emb_h" uses grid[0] (w)
    second = _1d(embed_dim // 2, gh)
    return jnp.asarray(np.concatenate([first, second], axis=1),
                       dtype=jnp.float32)


class MMDiT(nn.Module):
    config: MMDiTConfig = field(default_factory=MMDiTConfig)
    dtype: jnp.dtype = jnp.float32
    # sequence parallelism over a (data, seq) mesh (parallel/sp.py): image
    # tokens are S-sharded through every block (AdaLN/projections/MLP run on
    # local slices under GSPMD); joint attention all-gathers K/V per block
    sp_mesh: Optional[object] = None
    sp_axes: tuple = ("data", "seq")
    # pipeline parallelism over a mesh with a 'pipe' axis (parallel/pp.py):
    # blocks 0..L-2 run as a GPipe microbatch pipeline from externally
    # stacked params (pass pp_params= to __call__); the context_pre_only
    # last block + head stay outside the pipeline
    pp_mesh: Optional[object] = None
    pp_axes: tuple = ("data", "pipe")
    pp_microbatches: int = 2

    @nn.compact
    def __call__(self, sample: jax.Array, timesteps: jax.Array,
                 encoder_hidden_states: jax.Array,
                 pooled_projections: jax.Array,
                 pp_params=None) -> jax.Array:
        """sample: [B, H, W, C]; context: [B, S, joint_dim]; pooled: [B, P]."""
        cfg = self.config
        dim = cfg.num_heads * cfg.head_dim
        b, h, w, c = sample.shape
        p = cfg.patch_size

        # Patchify + cropped fixed sincos position embedding
        x = nn.Conv(dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="pos_embed_proj")(sample.astype(self.dtype))
        gh, gw = h // p, w // p
        x = x.reshape(b, gh * gw, dim)
        table = _pos_embed_2d(dim, cfg.pos_embed_max_size,
                              cfg.sample_size // cfg.patch_size)
        table = table.reshape(cfg.pos_embed_max_size, cfg.pos_embed_max_size, dim)
        top = (cfg.pos_embed_max_size - gh) // 2
        left = (cfg.pos_embed_max_size - gw) // 2
        pos = table[top:top + gh, left:left + gw].reshape(gh * gw, dim)
        x = x + pos[None].astype(self.dtype)
        if self.sp_mesh is not None:
            from ..parallel.sp import constrain_seq
            x = constrain_seq(x, self.sp_mesh, seq_axis=self.sp_axes[1],
                              data_axis=self.sp_axes[0])

        # Combined timestep + pooled-text embedding
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (b,))
        temb = timestep_embedding(timesteps, 256).astype(self.dtype)
        temb = nn.Dense(dim, dtype=self.dtype, name="time_embed_1")(temb)
        temb = nn.Dense(dim, dtype=self.dtype, name="time_embed_2")(nn.silu(temb))
        pemb = nn.Dense(dim, dtype=self.dtype, name="text_embed_1")(
            pooled_projections.astype(self.dtype))
        pemb = nn.Dense(dim, dtype=self.dtype, name="text_embed_2")(nn.silu(pemb))
        emb = temb + pemb

        context = nn.Dense(cfg.caption_projection_dim, dtype=self.dtype,
                           name="context_embedder")(
            encoder_hidden_states.astype(self.dtype))

        if self.pp_mesh is not None and pp_params is not None:
            from ..parallel.pp import pp_blocks
            data_ax = (self.pp_axes[0]
                       if self.pp_axes[0] in self.pp_mesh.axis_names else None)
            x, context = pp_blocks(
                cfg, pp_params, x, context, emb, self.pp_mesh,
                n_micro=self.pp_microbatches, dtype=self.dtype,
                pipe_axis=self.pp_axes[1], data_axis=data_ax)
            x, context = JointBlock(cfg, context_pre_only=True,
                                    dtype=self.dtype,
                                    name=f"blocks_{cfg.num_layers - 1}")(
                x, context, emb)
        else:
            for i in range(cfg.num_layers):
                x, context = JointBlock(
                    cfg, context_pre_only=(i == cfg.num_layers - 1),
                    dtype=self.dtype,
                    sp_mesh=self.sp_mesh, sp_axes=self.sp_axes,
                    name=f"blocks_{i}")(x, context, emb)

        x = AdaLayerNormContinuous(dim, dtype=self.dtype, name="norm_out")(x, emb)
        x = nn.Dense(p * p * cfg.out_channels, dtype=self.dtype,
                     name="proj_out")(x)
        # Unpatchify back to NHWC
        x = x.reshape(b, gh, gw, p, p, cfg.out_channels)
        x = jnp.einsum("bhwpqc->bhpwqc", x).reshape(b, gh * p, gw * p,
                                                    cfg.out_channels)
        return x.astype(jnp.float32)
