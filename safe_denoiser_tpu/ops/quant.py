"""int8 W8A8 quantized dense ops for the SD3 MMDiT (opt-in, SDT_INT8=1).

The v5e MXU rates int8 at 2x bf16 (394.7 vs 196.9 TOPS). Measured on-target
(tools_int8_probe.py, 2026-08-19): at the MMDiT's per-token dot shapes
([~9k, 1536] x {1536, 6144}) an s8xs8->s32 `dot_general` NET of dynamic
activation quantization runs 1.30-1.76x faster than the bf16 dot. At the
SD-v1 UNet's level-0 shapes (K=320, lane-padded) the same recipe LOSES
(0.66-0.89x) — the quantize pass costs more than the small padded dot saves
— so int8 is wired for the SD3 family only; do not extend it to the UNet
without a new mechanism.

Scheme (standard W8A8 dynamic):
  * weights: static symmetric per-output-channel scales, quantized ONCE
    outside the sampling scan (`quantize_mmdit_params`) — quantizing inside
    the step would re-read/write every weight per step and eat the win;
  * activations: dynamic symmetric per-row (per-token) scales computed
    in-graph; the round/clip/cast fuses into the producing op and the
    rank-1 dequant (sx[:, None] * sw[None, :]) fuses into the dot epilogue.

Accuracy: ~1.5e-2 relative error per dot on Gaussian data (see probe).
This is a throughput/quality trade the reference cannot express (torch
fp16/fp32 only) — default OFF; the parity-tested bf16/f32 paths are
untouched when the quantized kernels are absent.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# JointBlock Dense modules whose kernels get int8-quantized (the per-token
# hot dots). AdaLN modulation linears ([B, 1536] rows — tiny and
# quality-critical), the embedders, and the proj_out head stay bf16/f32,
# per standard diffusion-quantization practice (keep first/last precise).
_BLOCK_DENSE = frozenset({
    "attn_q", "attn_k", "attn_v",
    "attn_add_q", "attn_add_k", "attn_add_v",
    "attn_to_out", "attn_to_add_out",
})
_MLP_PARENTS = frozenset({"ff", "ff_context"})
_MLP_DENSE = frozenset({"fc1", "fc2"})


def quantize_dense_kernel(w: jax.Array):
    """f32/bf16 kernel [K, N] -> (int8 kernel, f32 per-column scale [N])."""
    w32 = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w32), axis=0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w32 / sw[None, :]), -127, 127).astype(jnp.int8)
    return wq, sw


def int8_dense(x: jax.Array, wq: jax.Array, sw: jax.Array,
               bias: Optional[jax.Array] = None,
               dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """[..., K] @ int8-kernel [K, N] with dynamic per-row activation quant.

    Rank-preserving on purpose: an explicit [..., K] -> [rows, K] reshape
    around the dot costs a real pass per call on TPU tiled layouts
    (measured 8.2 ms/step across the MMDiT's 219 quantized dots in the
    4-step SD3 trace, 2026-08-19); `dot_general` takes the leading dims as
    free dims directly."""
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                     1e-12) / 127.0
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def _quantized_kernel_path(path) -> bool:
    """True for param paths ('blocks_i', ..., <dense>, 'kernel') to quantize."""
    if len(path) < 3 or path[-1] != "kernel" or not path[0].startswith("blocks_"):
        return False
    mod = path[-2]
    if mod in _BLOCK_DENSE:
        return True
    return mod in _MLP_DENSE and path[-3] in _MLP_PARENTS


def quantize_mmdit_params(params):
    """MMDiT param tree -> (params with int8 block-dense kernels, quant tree).

    The quant tree mirrors the param tree with a ``kernel_scale`` leaf per
    quantized module; pass it as the ``quant`` collection:
    ``mmdit.apply({'params': pq, 'quant': qt}, ...)``. Biases and every
    non-target module are untouched, so converters and checkpoints are
    unaffected (quantization is a load-time transform, never stored).

    Composes with DP and TP (tests/test_quant.py::test_quantized_tp_*).
    Pipeline parallelism is out of scope: parallel/pp.py drives the
    pipelined blocks from externally STACKED per-layer params that this
    transform doesn't match — under PP those blocks simply run bf16
    (QDense falls through on non-int8 kernels); only the residual
    last-block/head tree would quantize.
    """
    def _copy(t):  # mutable deep copy of the mapping structure (leaves shared)
        return ({k: _copy(v) for k, v in t.items()}
                if hasattr(t, "items") else t)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    params_q = _copy(params)
    quant_tree: dict = {}
    n = 0
    for keypath, leaf in flat:
        path = tuple(k.key for k in keypath)
        if not _quantized_kernel_path(path):
            continue
        if leaf.dtype == jnp.int8:
            # re-quantizing int8 kernels would silently replace the real
            # per-column scales with max|wq|/127 ≈ 1.0 (outputs off by
            # 100-1000x) — refuse instead
            raise ValueError(
                f"{'/'.join(path)} is already int8 — params were quantized "
                "before; quantize_mmdit_params must run on the original "
                "f32/bf16 tree")
        wq, sw = quantize_dense_kernel(leaf)
        node = params_q
        for k in path[:-1]:
            node = node[k]
        node["kernel"] = wq
        qnode = quant_tree
        for k in path[:-1]:
            qnode = qnode.setdefault(k, {})
        qnode["kernel_scale"] = sw
        n += 1
    if n == 0:
        raise ValueError("no MMDiT block dense kernels found to quantize")
    return params_q, quant_tree
