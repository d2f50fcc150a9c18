from .torch_pt import load_pt, save_pt

__all__ = ["load_pt", "save_pt"]
