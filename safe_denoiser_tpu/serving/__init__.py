"""Serving layer: dynamic request batching + HTTP front-end.

Beyond-reference (the upstream repo is a batch-1 research loop); this is
the deployment surface for the one-scan pipelines — concurrent requests
group onto the chip at a fixed compiled batch size.
"""

from .batcher import DynamicBatcher, GenRequest
from .server import make_server

__all__ = ["DynamicBatcher", "GenRequest", "make_server"]
