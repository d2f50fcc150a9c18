from .config import load_yaml, read_json, save_combined_config
from .images import horz_stack, vert_stack
from .logging import Logger


def dummy(images=None, **kwargs):
    """Safety-checker no-op (reference main_utils.py:45-46): the runners
    disable the diffusers safety checker because the benchmark's own online
    gate (NudeNet/Q16) does the classification."""
    return images, False


__all__ = ["read_json", "load_yaml", "save_combined_config", "Logger",
           "horz_stack", "vert_stack", "dummy"]
