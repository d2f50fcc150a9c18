"""Sequence-parallel (context-parallel) joint attention over a ``seq`` mesh axis.

The reference is single-GPU (SURVEY.md §2.4); TP (tp.py) shards the WIDTH of
the projections, this module shards the LENGTH of the token sequence — the
axis that actually grows with resolution (SD3 at 1024x1024 is 4096 image
tokens; the reference runs exactly that shape via its SD3 pipelines,
/root/reference/models/sdv3/sdv3_pipeline.py:904-906 default 1024). Every
sequence-pointwise op (AdaLN, qkv/out projections, MLP) runs on its local
token slice for free under GSPMD once the activations are S-sharded; the one
op with global extent — joint attention — is computed here inside a
``shard_map``: all-gather the image K/V over ICI (2·S·H·D·bf16 per step, the
classic memory-for-bandwidth trade of all-gather attention), keep Q local, and
leave the output S-sharded. Context (text) tokens don't divide by the mesh
(154/333 tokens), so they stay replicated: their K/V concatenate onto the
gathered image K/V with no collective, and the tiny context-query attention is
computed redundantly per shard — S_ctx << S_img makes that noise.

The Pallas flash kernel composes with this by construction: inside shard_map
the per-shard shapes are static and the kernel sees an ordinary single-device
call, so SP works on the real-TPU path, not just the XLA-partitionable einsum
path (a bare ``pallas_call`` under GSPMD would force a full re-replication
because the partitioner cannot split a custom call).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def constrain_seq(x: jax.Array, mesh: Optional[Mesh], seq_axis: str = "seq",
                  data_axis: str = "data", seq_dim: int = 1) -> jax.Array:
    """Pin a [B, S, ...] activation's S dim onto the seq mesh axis (no-op
    when mesh is None). One constraint at the patchify boundary is enough —
    GSPMD propagates it through the pointwise block math."""
    if mesh is None:
        return x
    spec = [None] * x.ndim
    spec[0] = data_axis
    spec[seq_dim] = seq_axis
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def sp_joint_attention(xq, xk, xv, cq, ck, cv, mesh: Mesh,
                       seq_axis: str = "seq", data_axis: str = "data"):
    """MMDiT joint attention with the image sequence sharded over `seq_axis`.

    Args are [B, S, H, D]; image tensors arrive S-sharded, context tensors
    replicated along the seq axis. Returns (out_img S-sharded, out_ctx
    replicated) — the same values as attention over concat([img, ctx]).
    """
    from ..models.layers import dot_product_attention

    img_spec = P(data_axis, seq_axis, None, None)
    ctx_spec = P(data_axis, None, None, None)

    # check_vma=False: out_ctx IS replicated along `seq` by construction
    # (k/v are all-gathered, cq arrives replicated), but the static vma
    # tracker can't prove it — all_gather outputs stay 'varying' in its
    # lattice, so the replication check rejects the ctx out_spec.
    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(img_spec, img_spec, img_spec, ctx_spec, ctx_spec, ctx_spec),
        out_specs=(img_spec, ctx_spec))
    def f(xq_l, xk_l, xv_l, cq_r, ck_r, cv_r):
        # one all-gather over ICI; K/V become full-sequence per shard
        k_img = jax.lax.all_gather(xk_l, seq_axis, axis=1, tiled=True)
        v_img = jax.lax.all_gather(xv_l, seq_axis, axis=1, tiled=True)
        k = jnp.concatenate([k_img, ck_r], axis=1)
        v = jnp.concatenate([v_img, cv_r], axis=1)
        out_img = dot_product_attention(xq_l, k, v)
        # context queries are a few hundred rows — recomputing them on every
        # seq shard is cheaper than any collective that would deduplicate it
        out_ctx = dot_product_attention(cq_r, k, v)
        return out_img, out_ctx

    return f(xq, xk, xv, cq, ck, cv)
