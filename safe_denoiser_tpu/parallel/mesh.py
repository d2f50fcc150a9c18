"""Device mesh + sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.4) — this layer IS
the distributed design the TPU build adds: a 1-D ``data`` mesh over ICI;
prompts (and their CFG-folded branches) are sharded on the batch axis,
weights and the negative-latent bank are replicated. Collectives are
whatever XLA inserts for the jitted sampling step — no hand-written
NCCL/MPI analogue is needed for this workload; benchmark aggregation uses
``psum`` through the same mechanism.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(tree: Any, mesh: Mesh, axis: str = "data",
                batch_dim: int = 0) -> Any:
    """Place every array in the pytree with its batch dim sharded over the mesh."""
    def _put(x):
        spec = [None] * x.ndim
        spec[batch_dim] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree_util.tree_map(_put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (weights, ref bank, text tables)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
