"""Layout anchor: a Pallas identity copy that pins a [B, S, C] activation to
the default (channel-minor) TPU layout.

Why this exists: the flash2 attention kernel's custom-call constrains its
operands to row-major [B*H, S, D]; XLA's layout assignment then propagates a
seq-minor layout backward through the whole transformer block to make the
feeding transposes free, which pushes the block's ff/projection matmuls onto
a batch-in-lanes conv emitter measured ~10x off the MXU roofline (see git
history / VERDICT round-1). Anchoring the block outputs forces the residual
chain and the matmuls back to canonical layouts; the relayout for the
attention operands stays confined to the explicit transposes.

Cost: one full HBM read+write of the activation (~0.05 ms for the 21 MB
seq-4096 blocks at v5e bandwidth).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _anchor_3d(x: jax.Array, interpret: bool = False) -> jax.Array:
    b, s, c = x.shape
    blk = s if s <= 512 else 512
    if s % blk:
        blk = s
    return pl.pallas_call(
        _copy_kernel,
        grid=(b, s // blk),
        in_specs=[pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


def layout_anchor(x: jax.Array) -> jax.Array:
    """Identity on [B, S, C]; pins the value to the default layout on TPU.
    No-op off-TPU and for shapes the block tiling doesn't fit."""
    if jax.default_backend() != "tpu" or x.ndim != 3:
        return x
    b, s, c = x.shape
    # the block keeps the full channel dim (always legal); seq must tile
    if s > 512 and s % 512:
        return x
    return _anchor_3d(x)
