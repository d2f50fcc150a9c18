"""Tensor-parallel param sharding (2-D ``(data, model)`` mesh).

The reference has no distributed layer at all (SURVEY.md §2.4); this module
supplies the TPU-native one beyond plain data parallelism: GSPMD-style
``NamedSharding`` annotations over the param tree, letting XLA insert the
all-gathers/reduce-scatters over ICI. Intended for the SD3 MMDiT, whose
1536-wide attention/FF projections shard cleanly across a model axis
(megatron layout: qkv column-parallel, output row-parallel, ff fc1 column /
fc2 row); anything unmatched stays replicated.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec factory) — matched against '/'.join(path).
# Dense kernels are [in, out]: column-parallel = shard out (axis 1),
# row-parallel = shard in (axis 0).
MMDIT_TP_RULES: list[tuple[str, P]] = [
    (r"blocks_\d+/attn_(add_)?(q|k|v)/kernel$", P(None, "model")),
    (r"blocks_\d+/attn_(add_)?(q|k|v)/bias$", P("model")),
    (r"blocks_\d+/attn_to_(add_)?out/kernel$", P("model", None)),
    (r"blocks_\d+/ff(_context)?/fc1/kernel$", P(None, "model")),
    (r"blocks_\d+/ff(_context)?/fc1/bias$", P("model")),
    (r"blocks_\d+/ff(_context)?/fc2/kernel$", P("model", None)),
]

# SD-v1 UNet Transformer2D blocks (self/cross attention + GEGLU ff) in the
# same megatron layout; the resnet convs stay replicated — a GroupNorm sits
# between conv1/conv2, so channel-sharding them would force an all-gather per
# norm. head_dim 40 x 8 heads = 320-wide projections: clean over model axes
# dividing 8 heads.
UNET_TP_RULES: list[tuple[str, P]] = [
    (r"attentions_\d+/blocks_\d+/attn\d/to_(q|k|v)/kernel$", P(None, "model")),
    (r"attentions_\d+/blocks_\d+/attn\d/to_out/kernel$", P("model", None)),
    (r"attentions_\d+/blocks_\d+/ff/net_0/proj/kernel$", P(None, "model")),
    (r"attentions_\d+/blocks_\d+/ff/net_0/proj/bias$", P("model")),
    (r"attentions_\d+/blocks_\d+/ff/net_2/kernel$", P("model", None)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def shard_params_tp(params: Any, mesh: Mesh,
                    rules: list[tuple[str, P]] = MMDIT_TP_RULES) -> Any:
    """Place params per the TP rules; unmatched leaves are replicated."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def place(path, x):
        p = _path_str(path)
        for pat, spec in compiled:
            if pat.search(p):
                # only shard when the axis divides evenly
                axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
                ok = True
                for dim, name in enumerate(spec):
                    if name is not None and x.shape[dim] % axis_sizes[name]:
                        ok = False
                if ok:
                    return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)
