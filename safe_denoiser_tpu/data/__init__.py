"""Data layer: negative-image banks + benchmark prompt CSVs."""

from .images import (get_all_imgs, get_dataloader, get_dataset,
                     get_transform, load_image_bank)
from .prompts import (PromptCase, iter_prompt_cases,
                      load_hf_coco_dataset, load_prompt_csv, shard_cases)

__all__ = [
    "get_dataset", "get_dataloader", "get_transform", "get_all_imgs",
    "load_image_bank",
    "load_prompt_csv", "load_hf_coco_dataset", "iter_prompt_cases",
    "PromptCase", "shard_cases",
]
