"""Data-prep tooling (reference mics/process_data.py, mics/organize_data.py,
mics/sample_coco30k_10k.py, data/parse_CoPro*.py, data/word_count_i2p.py).

``generate_negative_bank`` closes the reference's data loop (SURVEY.md §3.5):
vanilla SD generates from I2P prompts, the online gate classifies, unsafe
outputs are filed into the negative-image bank that ``set_proj_ref`` later
VAE-encodes — the model's own unsafe outputs define the repelled region.
"""

from __future__ import annotations

import json
import os
import shutil
from glob import glob


def generate_negative_bank(pipe, prompts, eval_func, out_dir: str,
                           threshold: float = 0.6,
                           num_inference_steps: int = 50,
                           guidance_scale: float = 7.5,
                           seed: int = 0, logger=None) -> int:
    """Vanilla-generate → gate → save unsafe images (mics/process_data.py)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    n_unsafe = 0
    for i, prompt in enumerate(prompts):
        imgs = pipe(prompt, num_inference_steps=num_inference_steps,
                    guidance_scale=guidance_scale, seed=seed + i)
        is_unsafe, pred = eval_func(imgs, threshold=threshold)
        if is_unsafe:
            Image.fromarray(imgs[0]).save(
                os.path.join(out_dir, f"{i:06d}.png"))
            n_unsafe += 1
        if logger is not None:
            logger.log(f"[{i}] unsafe={is_unsafe} pred={pred:.3f}")
    return n_unsafe


def organize_by_category(src_dir: str, dst_root: str,
                         keywords: dict[str, list[str]]) -> dict[str, int]:
    """File results into per-category dirs by filename keyword
    (mics/organize_data.py)."""
    counts = {k: 0 for k in keywords}
    for path in sorted(glob(os.path.join(src_dir, "*.png"))):
        name = os.path.basename(path).lower()
        for category, words in keywords.items():
            if any(w in name for w in words):
                dst = os.path.join(dst_root, category)
                os.makedirs(dst, exist_ok=True)
                shutil.copy2(path, dst)
                counts[category] += 1
                break
    return counts


def sample_coco_subset(csv_in: str, csv_out: str, n: int = 10000,
                       seed: int = 42):
    """Random COCO-30k subset (mics/sample_coco30k_10k.py)."""
    import pandas as pd

    df = pd.read_csv(csv_in)
    sub = df.sample(n=min(n, len(df)), random_state=seed).reset_index(drop=True)
    sub.to_csv(csv_out, index=False)
    return sub


def parse_copro_json(json_path: str, csv_out: str):
    """CoPro JSON → benchmark CSV (data/parse_CoPro.py schema:
    idx,unsafe_prompt,safe_prompt,concept,category)."""
    import pandas as pd

    with open(json_path) as f:
        data = json.load(f)
    rows = []
    for i, item in enumerate(data if isinstance(data, list)
                             else data.values()):
        rows.append({
            "idx": item.get("idx", i),
            "unsafe_prompt": item.get("unsafe_prompt", item.get("prompt", "")),
            "safe_prompt": item.get("safe_prompt", ""),
            "concept": item.get("concept", ""),
            "category": item.get("category", ""),
        })
    df = pd.DataFrame(rows)
    df.to_csv(csv_out, index=False)
    return df


def prompt_word_stats(csv_path: str, column: str = "prompt") -> dict:
    """Prompt length statistics (data/word_count_i2p.py /
    select_longest_prompts_i2p.py)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    lengths = df[column].astype(str).str.split().str.len()
    return {"n": int(len(lengths)), "mean": float(lengths.mean()),
            "max": int(lengths.max()), "min": int(lengths.min()),
            "longest_idx": int(lengths.idxmax())}


def select_longest_prompts(csv_in: str, csv_out: str,
                           column: str = "prompt",
                           top_frac: float = 0.1):
    """Keep the rows whose prompt character-length is in the top
    ``top_frac`` quantile (data/select_longest_prompts_i2p.py: threshold =
    0.9-quantile of len(prompt), rows with length >= threshold kept)."""
    import pandas as pd

    df = pd.read_csv(csv_in)
    lengths = df[column].astype(str).str.len()
    threshold = lengths.quantile(1.0 - top_frac)
    sub = df[lengths >= threshold]
    sub.to_csv(csv_out, index=False)
    return sub


def make_image_grid(image_paths: list[str], out_path: str, cols: int = 4,
                    cell: int = 256, blur_radius: float = 0.0):
    """Stack images into a grid PNG; optional blur (mics/grid_image.py /
    grid_blurred_image.py — used for redacted figure grids)."""
    from PIL import Image, ImageFilter

    n = len(image_paths)
    rows = (n + cols - 1) // cols
    grid = Image.new("RGB", (cols * cell, rows * cell), "white")
    for i, path in enumerate(image_paths):
        img = Image.open(path).convert("RGB").resize((cell, cell))
        if blur_radius > 0:
            img = img.filter(ImageFilter.GaussianBlur(blur_radius))
        grid.paste(img, ((i % cols) * cell, (i // cols) * cell))
    grid.save(out_path)
    return grid
