"""Negative-image bank loading (reference data/dataloader.py).

Reproduces the reference's semantics — dataset registry with
nudity/inappropriate/artists entries, sorted png+jpg glob under
``root/class_info``, the hard 3,200-image VRAM cap, and the fixed transform
(resize 512², scale to [-1, 1]) — without torch/torchvision: PIL + numpy,
returning an NCHW fp32 array ready for the VAE ``embed_fn`` (the repellency
layer and the .pt caches stay in the reference's NCHW layout; models
transpose to NHWC internally).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Callable, Optional

import numpy as np

__DATASET__: dict[str, type] = {}


def register_dataset(name: str):
    def wrapper(cls):
        if __DATASET__.get(name) is not None:
            raise NameError(f"Name {name} is already registered!")
        __DATASET__[name] = cls
        return cls
    return wrapper


def get_dataset(name: str, root: str, **kwargs):
    if __DATASET__.get(name) is None:
        raise NameError(f"Dataset {name} is not defined.")
    return __DATASET__[name](root=root, **kwargs)


def get_transform(name: str = "", size: int = 512, **kwargs) -> Callable:
    """Resize to size² + map to [-1, 1] (reference get_transform :46-51)."""
    from PIL import Image

    def _tf(img) -> np.ndarray:
        img = img.convert("RGB").resize((size, size), Image.BILINEAR)
        arr = np.asarray(img, dtype=np.float32) / 255.0
        arr = (arr - 0.5) / 0.5
        return np.transpose(arr, (2, 0, 1))  # HWC -> CHW

    return _tf


class _GlobImageDataset:
    max_images: Optional[int] = None
    exts = ("png", "jpg")

    def __init__(self, root: str, class_info: str = "",
                 transforms: Optional[Callable] = None, **_ignored):
        root_path = os.path.join(root, class_info)
        fpaths: list[str] = []
        for ext in self.exts:
            fpaths += glob(f"{root_path}/*.{ext}", recursive=True)
        self.fpaths = sorted(fpaths)
        if self.max_images is not None and len(self.fpaths) > self.max_images:
            # reference: "VRAM out of memory" cap (data/dataloader.py:64-65)
            self.fpaths = self.fpaths[:self.max_images]
        assert len(self.fpaths) > 0, "File list is empty. Check the root."
        self.transforms = transforms or get_transform("")

    def __len__(self):
        return len(self.fpaths)

    def __getitem__(self, index: int) -> np.ndarray:
        from PIL import Image
        img = Image.open(self.fpaths[index])
        return self.transforms(img)


@register_dataset(name="nudity")
@register_dataset(name="inappropriate")
class NudityDataset(_GlobImageDataset):
    max_images = 3200


@register_dataset(name="artists")
class ArtistsDataset(_GlobImageDataset):
    max_images = None
    exts = ("png",)


def get_dataloader(dataset, batch_size: int, num_workers: int = 0,
                   train: bool = False):
    """Minimal batch iterator (reference get_dataloader :35-44). The bank is
    materialized whole anyway (get_all_imgs); this exists for API parity and
    chunked VAE encoding."""
    def _iter():
        order = range(len(dataset))
        batch = []
        for i in order:
            batch.append(dataset[i])
            if len(batch) == batch_size:
                yield np.stack(batch)
                batch = []
        if batch:
            yield np.stack(batch)
    return _iter()


def get_all_imgs(dataset, batch_size: int = 64) -> np.ndarray:
    """Materialize the whole bank as one [M, 3, H, W] fp32 array
    (reference get_all_imgs :28-33 — the bank is small enough by design).
    A thread-pooled variant measured exactly 1.0x here (single-vCPU host);
    keep the simple loop."""
    out = [dataset[i] for i in range(len(dataset))]
    return np.stack(out, axis=0)


def load_image_bank(name: str, root: str, class_info: str = "",
                    size: int = 512) -> np.ndarray:
    """One-call convenience: registry + transform + materialize."""
    ds = get_dataset(name, root=root, class_info=class_info,
                     transforms=get_transform("", size=size))
    return get_all_imgs(ds)
