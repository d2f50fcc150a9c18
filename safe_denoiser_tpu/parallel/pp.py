"""Pipeline-parallel MMDiT block stack over a ``pipe`` mesh axis (GPipe).

The reference is single-GPU (SURVEY.md §2.4) — this is the fourth axis of
the TPU-native scale-out story: dp shards the batch (mesh.py), tp the weight
WIDTH (tp.py), sp the token LENGTH (sp.py), and pp the model DEPTH. The
24-block MMDiT stack is cut into `pipe` contiguous stages; each device holds
1/S of the block weights, and microbatches stream through the stages with
one ``lax.ppermute`` hop over ICI per pipeline tick (the classic GPipe
schedule: M + S - 1 ticks, bubble fraction (S-1)/(M+S-1)).

Stacking trick: MMDiT blocks 0..L-2 are homogeneous — only the final block
is ``context_pre_only`` with a different param tree — so their params stack
into ``[L-1, ...]`` leaves, zero-padded up to a multiple of the stage count.
A zero-parameter JointBlock is an EXACT identity: every residual branch is
scaled by an AdaLN-zero gate that is itself the output of a zero Dense, so
padding blocks cost one wasted block of FLOPs and change no bits. The
special last block, the patchify prelude, and the unpatchify head run
outside the pipeline (replicated / data-parallel), keeping the checkpoint
param tree and the weight converters (models/weights.py) untouched: pp
consumes the STANDARD tree, restacked at dispatch time by
``stack_block_params``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_block_params(variables, num_layers: int, n_stages: int):
    """Stack the homogeneous blocks 0..num_layers-2 of a standard MMDiT param
    tree into [Lpad, ...] leaves, zero-padded so n_stages divides Lpad."""
    p = variables["params"] if "params" in variables else variables
    trees = [p[f"blocks_{i}"] for i in range(num_layers - 1)]
    pad = (-len(trees)) % n_stages
    if pad:
        zero = jax.tree.map(jnp.zeros_like, trees[0])
        trees = trees + [zero] * pad
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def shard_stacked_pp(stacked, mesh: Mesh, pipe_axis: str = "pipe"):
    """Place the stacked block params with the layer dim over the pipe axis."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(pipe_axis, *([None] * (x.ndim - 1))))),
        stacked)


def pp_blocks(cfg, stacked, x, context, emb, mesh: Mesh, n_micro: int,
              dtype=jnp.float32, pipe_axis: str = "pipe",
              data_axis: Optional[str] = None):
    """Run the stacked homogeneous JointBlocks as a GPipe pipeline.

    x: [B, S, D] image tokens, context: [B, Sc, D], emb: [B, D]; B must be
    divisible by n_micro. Returns (x, context) — the same values as applying
    the blocks sequentially (bubble-step compute is masked out by the
    inject/emit selects, so numerics are identical per microbatch).
    """
    from ..models.mmdit import JointBlock

    n_stages = mesh.shape[pipe_axis]
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by {n_micro} microbatches")
    mb = b // n_micro
    xm = x.reshape(n_micro, mb, *x.shape[1:])
    cm = context.reshape(n_micro, mb, *context.shape[1:])
    em = emb.reshape(n_micro, mb, *emb.shape[1:])

    def _dspec(nd):
        spec = [None] * nd
        spec[1] = data_axis  # microbatch rows ride the data axis if present
        return P(*spec)

    block = JointBlock(cfg, dtype=dtype)

    # check_vma=False: the emitted outputs ARE pipe-replicated after the
    # masked psum, but the static vma tracker can't prove it through the
    # axis_index selects (same situation as sp.py's all-gathered K/V).
    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(pipe_axis), _dspec(xm.ndim), _dspec(cm.ndim),
                  _dspec(em.ndim)),
        out_specs=(_dspec(xm.ndim), _dspec(cm.ndim)))
    def run(bp_local, xm, cm, em):
        stage = jax.lax.axis_index(pipe_axis)
        last = n_stages - 1

        def stage_fn(state):
            xs, cs, es = state

            def body(carry, p1):
                xc, cc = carry
                xc, cc = block.apply({"params": p1}, xc, cc, es)
                return (xc, cc), None

            (xs, cs), _ = jax.lax.scan(body, (xs, cs), bp_local)
            return (xs, cs, es)

        state = (jnp.zeros_like(xm[0]), jnp.zeros_like(cm[0]),
                 jnp.zeros_like(em[0]))
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        outs_x, outs_c = [], []
        for t in range(n_micro + n_stages - 1):
            # stage 0 injects microbatch t (clamped: drain ticks recompute
            # the last microbatch; the junk never reaches an emit slot)
            inj = min(t, n_micro - 1)
            state = jax.tree.map(
                lambda i_, s_: jnp.where(stage == 0, i_, s_),
                (xm[inj], cm[inj], em[inj]), state)
            state = stage_fn(state)
            if t >= last:  # stage S-1 now holds finished microbatch t-(S-1)
                outs_x.append(state[0])
                outs_c.append(state[1])
            if t < n_micro + n_stages - 2:
                state = jax.tree.map(
                    lambda a: jax.lax.ppermute(a, pipe_axis, perm), state)
        # results are valid only on the last stage: mask + psum broadcasts
        # them to every stage (tiny vs the block compute; keeps callers
        # mesh-agnostic downstream, same contract as sp.py)
        mask = stage == last
        ox = jax.lax.psum(jnp.where(mask, jnp.stack(outs_x), 0), pipe_axis)
        oc = jax.lax.psum(jnp.where(mask, jnp.stack(outs_c), 0), pipe_axis)
        return ox, oc

    ox, oc = run(stacked, xm, cm, em)
    return (ox.reshape(b, *x.shape[1:]),
            oc.reshape(b, *context.shape[1:]))
