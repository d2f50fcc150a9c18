"""Bank-sharded repellency: shard the negative-latent bank's M axis over the
mesh and psum the Gram partial sums.

SURVEY.md §5 ("long-context / sequence parallelism"): the reference's scaling
axis is the negative-reference bank size M (515 → 3,000, capped 3,200 —
reference data/dataloader.py:64-65), and the TPU analogue of sequence
parallelism for this workload is sharding the M×D pairwise-distance
computation across chips. That is what this module does: each device holds
an M/n shard of the bank, computes its raw partials

    num_i^(k) = Σ_{j ∈ shard k} w_ij · r_j        beta_i^(k) = Σ_j w_ij

with the same fused Pallas kernel the replicated path uses
(ops/repellency_kernels.py, ``normalize=False``), and a single psum pair
over ICI produces the exact replicated-bank result. Besides cutting the
per-device bank read M/n-fold, this is the only way large SD3 banks fit at
all: one SD3 latent row is 1 MB (16·128·128 f32), so a 10k bank is ~10 GB —
more than a v5e's HBM alongside the MMDiT weights.

``ShardedBank`` is the in-scan handle: it carries the mesh/axis choice and
exposes ``score``/``sparse_force`` with the exact signatures of the
replicated kernels, so ``apply_repellency`` (repellency/methods.py) swaps it
in without touching the surrounding math. On a 2-D (data, model) mesh the
natural layout is batch over ``data`` (``batch_axis='data'``) and the bank
over ``model`` — the psum then rides only the model axis.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.repellency_kernels import rbf_negative_score, sparse_repellency_force

# Pad rows sit at distance ~1e10 from any real latent: exp(-1e10/2σ²)
# underflows to exactly 0.0 — and for the sparse method the pad row is far
# outside any radius, so its truncated weight is exactly 0.0 too. Either
# way padded rows contribute nothing to the partial sums. (A 0.0 pad would
# contribute w=exp(-||x||/2σ²)>0; a 1e30 pad overflows r² to inf and
# poisons num with 0·inf = NaN.)
PAD_VALUE = 1e10


def pad_bank(refs: jax.Array, n_shards: int) -> jax.Array:
    """Pad the bank's M axis to a multiple of ``n_shards`` with PAD_VALUE
    rows (exact no-ops in the score — see module docstring)."""
    m = refs.shape[0]
    m_pad = -(-m // n_shards) * n_shards
    if m_pad == m:
        return refs
    return jnp.concatenate(
        [refs, jnp.full((m_pad - m, *refs.shape[1:]), PAD_VALUE,
                        refs.dtype)], axis=0)


def shard_bank(refs: jax.Array, mesh: Mesh, axis: str = "data") -> jax.Array:
    """Pad + place the [M, ...] bank M-sharded over ``axis``."""
    refs = pad_bank(refs, mesh.shape[axis])
    spec = [axis] + [None] * (refs.ndim - 1)
    return jax.device_put(refs, NamedSharding(mesh, P(*spec)))


def sharded_negative_score(x: jax.Array, refs: jax.Array, sigma: float,
                           epsilon: float = 1e-8, *, mesh: Mesh,
                           axis: str = "data",
                           batch_axis: str | None = None):
    """Exact bank-sharded ``rbf_negative_score``. x: [N, D] (replicated, or
    batch-sharded over ``batch_axis``), refs: [M, D] with M a multiple of
    the axis size (see ``pad_bank``), sharded or to-be-sharded along M.
    Returns (score [N, D], beta [N]), laid out like x — numerically the
    all-on-one-device result up to f32 summation order."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(batch_axis), P(axis)),
        out_specs=(P(batch_axis), P(batch_axis)))
    def _score(x, refs_shard):
        num, beta = rbf_negative_score(x, refs_shard, sigma,
                                       normalize=False)
        num = jax.lax.psum(num, axis)
        beta = jax.lax.psum(beta, axis)
        return num, beta

    num, beta = _score(x, refs)
    beta = beta + epsilon
    return num / beta[:, None], beta


def sharded_sparse_force(x: jax.Array, refs: jax.Array, radius: float,
                         *, mesh: Mesh, axis: str = "data",
                         batch_axis: str | None = None):
    """Exact bank-sharded ``sparse_repellency_force`` via psum'd raw
    partials (Σ c·r, Σ c); force = x·Σc − Σc·r formed once afterwards."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(batch_axis), P(axis)),
        out_specs=(P(batch_axis), P(batch_axis)))
    def _partials(x, refs_shard):
        cr, c_sum = sparse_repellency_force(x, refs_shard, radius, raw=True)
        return jax.lax.psum(cr, axis), jax.lax.psum(c_sum, axis)

    cr, c_sum = _partials(x, refs)
    force = x.astype(jnp.float32) * c_sum[:, None] - cr
    return force, c_sum


@dataclasses.dataclass(frozen=True)
class ShardedBank:
    """Drop-in bank-sharded replacements for the repellency kernels,
    injected into ``apply_repellency(..., bank=...)`` and threaded through
    the samplers as ``rep_bank=``. Pass the bank through ``shard_bank``
    (same mesh/axis) before the scan so the M rows actually live sharded."""

    mesh: Mesh
    axis: str = "data"
    batch_axis: str | None = None

    def score(self, x, refs, sigma, epsilon=1e-8):
        return sharded_negative_score(
            x, refs, sigma, epsilon, mesh=self.mesh, axis=self.axis,
            batch_axis=self.batch_axis)

    def sparse_force(self, x, refs, radius):
        return sharded_sparse_force(
            x, refs, radius, mesh=self.mesh, axis=self.axis,
            batch_axis=self.batch_axis)
