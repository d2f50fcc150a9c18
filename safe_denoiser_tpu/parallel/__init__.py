"""Distribution layer: mesh construction + data-parallel prompt sharding."""

from .mesh import make_mesh, replicate, shard_batch

__all__ = ["make_mesh", "shard_batch", "replicate"]
