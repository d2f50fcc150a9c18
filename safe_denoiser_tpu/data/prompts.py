"""Benchmark prompt-CSV loading with the reference's column-sniffing rules.

The reference iterates pandas rows and sniffs the schema per row
(run_nudity.py:377-412): MMA-Diffusion (``adv_prompt``), Ring-A-Bell
(``sensitive prompt``), I2P/UnlearnDiffAtk/COCO (``prompt`` +
``case_number``), per-row ``guidance``/``evaluation_seed``/``sd_seed`` with
fallbacks, ``categories`` split on ', ', and a broken-row skip. This module
reproduces those exact rules as one typed iterator.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import pandas as pd


@dataclass
class PromptCase:
    case_number: int | str
    prompt: str
    seed: int
    guidance: float
    categories: list[str]
    row_index: int


def load_prompt_csv(path: str) -> pd.DataFrame:
    return pd.read_csv(path)


def load_hf_coco_dataset(path: str, limit: int = 10000) -> pd.DataFrame:
    """Local HF-datasets branch of the COCO runner (reference
    run_coco30k.py:284-285 loads ``UCSC-VLAA/Recap-COCO-30K`` from the hub
    and ``.select(range(10000))``; zero egress here, so ``path`` must be a
    LOCAL ``datasets.save_to_disk`` dir, a parquet file, or a dir of
    parquet shards). Returns a DataFrame whose rows carry the HF schema
    (``caption``/``recaption``/``image_id``) so :func:`iter_prompt_cases`'s
    recaption branch applies; any ``image`` column (the original COCO
    pixels) is dropped — the prompt iterator never needs it.
    """
    import glob
    import os

    import datasets

    if os.path.isdir(path) and (
            os.path.exists(os.path.join(path, "dataset_info.json"))
            or os.path.exists(os.path.join(path, "dataset_dict.json"))):
        ds = datasets.load_from_disk(path)
        if isinstance(ds, datasets.DatasetDict):
            # a locally-materialized split is often keyed something other
            # than 'train' — take the only split when there is one, and
            # name the choices in the error otherwise
            if "train" in ds:
                ds = ds["train"]
            elif len(ds) == 1:
                ds = next(iter(ds.values()))
            else:
                raise ValueError(
                    f"{path} holds splits {sorted(ds.keys())} and none is "
                    "'train' — save the split you want with save_to_disk, "
                    "or point at its subdirectory")
    else:
        files = ([path] if path.endswith(".parquet")
                 else sorted(glob.glob(os.path.join(path, "*.parquet"))))
        if not files:
            raise FileNotFoundError(
                f"{path} is neither a datasets.save_to_disk dir nor a "
                "parquet file/dir")
        ds = datasets.load_dataset("parquet", data_files=files,
                                   split="train")
    ds = ds.select(range(min(limit, len(ds))))
    if "image" in ds.column_names:
        ds = ds.remove_columns(["image"])
    return ds.to_pandas()


def iter_prompt_cases(dataset: pd.DataFrame,
                      default_guidance: Optional[float] = None,
                      valid_case_numbers: Optional[str] = None,
                      logger=None) -> Iterator[PromptCase]:
    """Yield benchmark cases with the reference's sniffing/fallback semantics."""
    if valid_case_numbers:
        vstart, vend = valid_case_numbers.split(",")
        dataset = dataset[int(vstart):][:int(vend)]

    for _iter, data in dataset.iterrows():
        if "adv_prompt" in data:                       # MMA-Diffusion
            target_prompt = data["adv_prompt"]
            case_num = _iter
        elif "sensitive prompt" in data:               # Ring-A-Bell
            target_prompt = data["sensitive prompt"]
            case_num = _iter
        elif "prompt" in data:                         # I2P / COCO / nudity
            target_prompt = data["prompt"]
            case_num = data["case_number"] if "case_number" in data else _iter
        elif "unsafe_prompt" in data:                  # CoPro (run_copro.py:443)
            target_prompt = data["unsafe_prompt"]
            case_num = data["idx"] if "idx" in data else _iter
        elif "recaption" in data:                      # Recap-COCO-30K HF rows
            # the reference sniffs on "recaption" but generates from the
            # ORIGINAL caption (run_coco30k.py:410-414, recaption line
            # commented out there)
            target_prompt = data["caption"]
            case_num = data["image_id"] if "image_id" in data else _iter
        else:
            continue

        if hasattr(data, "guidance"):
            guidance = data.guidance
        elif default_guidance is not None:
            guidance = default_guidance
        else:
            guidance = 7.5

        try:
            seed = data.evaluation_seed if hasattr(data, "evaluation_seed") \
                else data.sd_seed
        except Exception:
            seed = 42

        if "categories" in data.keys():
            categories = str(data["categories"]).split(", ")
        else:
            categories = ["nudity"]

        if logger is not None:
            logger.log(f"Seed: {seed}, Iter: {_iter}, Case#: {case_num}: "
                       f"target prompt: {target_prompt}")

        # broken-row skip (reference run_nudity.py:410-412)
        if not isinstance(target_prompt, str) \
                or not isinstance(seed, (int,)) and not (
                    hasattr(seed, "item") and isinstance(seed.item(), int)) \
                or not isinstance(guidance, (int, float)):
            continue
        yield PromptCase(case_number=case_num, prompt=target_prompt,
                         seed=int(seed), guidance=float(guidance),
                         categories=categories, row_index=int(_iter))


def shard_cases(cases: Iterator[PromptCase], num_shards: int,
                shard_id: int) -> Iterator[PromptCase]:
    """Fleet mode: deterministic round-robin partition of a benchmark's
    cases across ``num_shards`` independent processes/hosts (the reference
    is single-process; SURVEY.md §5 notes the scaling axis of these
    benchmarks is the 10k-30k prompt count). Shard k yields cases whose
    enumeration order ``% num_shards == k`` — balanced, disjoint, and
    independent of case_number gaps or broken-row skips on other shards.

    Each shard writes its own --save-dir; merge the per-shard
    ``detect_dict.json`` files with ``tools/logs.py::merge_detect_dicts``.
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    if not 0 <= shard_id < num_shards:
        raise ValueError(
            f"shard_id {shard_id} out of range for num_shards {num_shards}")
    for i, case in enumerate(cases):
        if i % num_shards == shard_id:
            yield case
