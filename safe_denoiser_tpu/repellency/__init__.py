from .methods import (
    RepellencyConfig,
    RepellencyProcessor,
    apply_repellency,
    get_repellency_method,
    register_conditioning_method,
)
from . import lsh  # noqa: F401  (registers the 'lsh' method)

__all__ = [
    "RepellencyConfig",
    "RepellencyProcessor",
    "apply_repellency",
    "get_repellency_method",
    "register_conditioning_method",
]
