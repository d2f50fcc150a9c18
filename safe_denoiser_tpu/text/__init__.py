"""Text frontend: CLIP BPE tokenizer + prompt encoding helpers."""

from .clip_tokenizer import CLIPTokenizer

__all__ = ["CLIPTokenizer"]
