"""int8 W8A8 quantized dense ops for the SD3 MMDiT and the SD-v1 UNet's
wide transformer blocks (opt-in, SDT_INT8=1 / --int8 / enable_int8()).

The v5e MXU rates int8 at 2x bf16 (394.7 vs 196.9 TOPS). Measured on-target
(tools_int8_probe.py, 2026-08-19, shipped per-row recipe): at the MMDiT's
per-token dot shapes ([~9k, 1536] x {1536, 6144}) an s8xs8->s32
`dot_general` NET of dynamic activation quantization runs 1.30-1.76x faster
than the bf16 dot. The SD-v1 UNet is mixed: level-0 (K=320, lane-padded)
LOSES (0.66-0.77x — the quantize pass costs more than the small padded dot
saves), level-1 (C=640) is noise (1.01-1.14x), level-2/mid (C=1280) WINS
(qkv/out 1.33x, fc1 1.70x, fc2 1.42x). The UNet transform is therefore
SELECTIVE: only kernels whose min dim >= ``min_dim`` (default 1280, i.e.
level-2 + mid blocks) are quantized — which also auto-excludes the
cross-attention k/v dots ([768, 1280], 77 context rows, nothing to win).

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
    return _quantize_tree(params, lambda p, leaf: _quantized_kernel_path(p),
                          what="MMDiT block dense")


# UNet BasicTransformerBlock Dense modules eligible for int8 (subject to the
# min_dim shape gate): attention projections and the ff MLP. norms, convs
# (proj_in/proj_out are 1x1 convs), resnets, and time embeddings stay bf16.
_UNET_ATTN_DENSE = frozenset({"to_q", "to_k", "to_v", "to_out"})


def _unet_kernel_path(path) -> bool:
    """('<x>_attentions_<y>', 'blocks_i', <attn|ff>, ..., 'kernel') paths."""
    if len(path) < 4 or path[-1] != "kernel":
        return False
    if "_attentions_" not in path[0]:  # covers mid_attentions_0 too
        return False
    if not path[1].startswith("blocks_"):
        return False
    if path[2] in ("attn1", "attn2") and path[-2] in _UNET_ATTN_DENSE:
        return True
    return path[2] == "ff" and (path[-2] == "net_2" or
                                (path[-2] == "proj" and path[-3] == "net_0") or
                                path[-2] == "net_0")


def quantize_unet_params(params, min_dim: int = 1280):
    """SD-v1 UNet param tree -> (params with int8 wide-block kernels, quant
    tree), selective by shape: only transformer-block dense kernels with
    ``min(K, N) >= min_dim`` quantize (level-2/mid at the default — the only
    shapes where int8 wins on v5e; see module docstring). Same contract as
    ``quantize_mmdit_params``: pass the quant tree as the ``quant``
    collection; converters/checkpoints unaffected (load-time transform)."""
    return _quantize_tree(
        params,
        lambda p, leaf: (_unet_kernel_path(p) and min(leaf.shape) >= min_dim),
        what=f"UNet transformer dense (min_dim={min_dim})")


def _quantize_tree(params, select, what: str):
    def _copy(t):  # mutable deep copy of the mapping structure (leaves shared)
        return ({k: _copy(v) for k, v in t.items()}
                if hasattr(t, "items") else t)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    params_q = _copy(params)
    quant_tree: dict = {}
    n = 0
    for keypath, leaf in flat:
        path = tuple(k.key for k in keypath)
        if not select(path, leaf):
            continue
        if leaf.dtype == jnp.int8:
            # re-quantizing int8 kernels would silently replace the real
            # per-column scales with max|wq|/127 ≈ 1.0 (outputs off by
            # 100-1000x) — refuse instead
            raise ValueError(
                f"{'/'.join(path)} is already int8 — params were quantized "
                "before; the quantize transform must run on the original "
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
        raise ValueError(f"no {what} kernels found to quantize")
    return params_q, quant_tree
