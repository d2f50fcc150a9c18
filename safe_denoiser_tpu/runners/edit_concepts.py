"""Closed-form concept-editing CLI (UCE / RECE) — produces the edited UNet
checkpoints the reference's ``rece`` erase_id consumes
(/root/reference/run_nudity.py:124-130 loads such state dicts; the editing
itself lives in an external repo the reference depends on).

No training loop: every cross-attention K/V projection is solved in closed
form from the concept/target/preserve prompt encodings (training/uce.py),
then exported to the torch interchange layout.

Usage:
    python edit_concepts.py --model_dir <ckpt> --erase "nudity" \
        --method rece --preserve "a person" --save_path rece_nudity.pt
"""

from __future__ import annotations

import argparse
import os

from ..utils.config import read_json
from ..utils.logging import Logger
from .train_esd import export_unet


def _split(s: str | None) -> list[str]:
    return [p.strip() for p in s.split(",")] if s else []


def parse_args(argv=None) -> argparse.Namespace:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", type=str, default=None)
    pre_args, _ = pre.parse_known_args(argv)
    cfg = read_json(pre_args.config) if pre_args.config else {}
    g = cfg.get

    p = argparse.ArgumentParser(
        description="Safe-Denoiser TPU closed-form concept editor "
                    "(UCE / RECE)", parents=[pre])
    p.add_argument("--model_dir", type=str, default=g("model_dir", None))
    p.add_argument("--erase", type=str, default=g("erase", "nudity"),
                   help="comma-separated concepts to erase")
    p.add_argument("--targets", type=str, default=g("targets", None),
                   help="comma-separated remap targets (default: the empty "
                        "prompt for every concept)")
    p.add_argument("--preserve", type=str, default=g("preserve", None),
                   help="comma-separated concepts whose K/V images must "
                        "not move")
    p.add_argument("--method", type=str, default=g("method", "uce"),
                   choices=["uce", "rece"])
    p.add_argument("--lamb", type=float, default=g("lamb", 0.5),
                   help="ridge anchor toward the original weights")
    p.add_argument("--erase_scale", type=float, default=g("erase_scale", 1.0))
    p.add_argument("--preserve_scale", type=float,
                   default=g("preserve_scale", 1.0))
    p.add_argument("--rece_iterations", type=int,
                   default=g("rece_iterations", 3))
    p.add_argument("--save_path", type=str,
                   default=g("save_path", "./edited_unet.safetensors"))
    p.add_argument("--save-dir", type=str, default=g("save_dir", None))
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.model_dir is None:
        raise SystemExit("--model_dir pointing at a local HF-layout SD "
                         "checkpoint is required (no network egress).")

    from ..pipeline.diffusion import SafeDiffusionPipeline
    from ..training import edit_unet_concepts

    log_dir = args.save_dir or os.path.dirname(
        os.path.abspath(args.save_path))
    os.makedirs(log_dir, exist_ok=True)
    logger = Logger(os.path.join(log_dir, "edit_logs.txt"))
    for arg in vars(args):
        logger.log(f"{arg}: {getattr(args, arg)}")

    pipe = SafeDiffusionPipeline.from_pretrained(args.model_dir,
                                                 logger=logger)

    def encode_fn(prompt: str):
        embeds, _, _ = pipe.encode_prompt(prompt)
        return embeds[1][0]  # cond branch, [L, D] final states

    erase = _split(args.erase)
    targets = _split(args.targets) or None
    preserve = _split(args.preserve)
    logger.log(f"{args.method}: erase {erase} -> "
               f"{targets or ['<empty prompt>'] * len(erase)}, "
               f"preserve {preserve}")
    edited = edit_unet_concepts(
        pipe.unet_params, encode_fn, erase, targets, preserve,
        method=args.method, lamb=args.lamb, erase_scale=args.erase_scale,
        preserve_scale=args.preserve_scale,
        rece_iterations=args.rece_iterations)

    export_unet(edited, pipe.unet.config, args.save_path)
    logger.log(f"Edited UNet saved: {args.save_path}")
    print("end")


if __name__ == "__main__":
    main()
