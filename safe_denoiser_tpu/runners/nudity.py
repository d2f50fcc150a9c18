"""Nudity benchmark runner (reference run_nudity.py): SD-v1.4 + erase_id
pipeline + per-row CSV prompts + NudeNet/Q16 online gate + detect_dict."""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

from ..data import iter_prompt_cases
from ..models import FreeUConfig
from ..pipeline.diffusion import ERASE_SPECS, SLD_CONFIGS
from ..utils.logging import Logger
from .common import (
    NUDITY_NEGATIVE_PROMPT_SPACE,
    DetectAggregator,
    base_parser,
    build_eval,
    build_pipeline,
    build_repellency,
    dump_run_artifacts,
    make_save_dirs, shard_iter)


def save_png(img: np.ndarray, path: str) -> None:
    from PIL import Image
    Image.fromarray(img).save(path)


def resolve_negative_space(args) -> tuple[list[str], str | None]:
    """Negative prompt space + negative prompt per category/erase_id
    (reference run_nudity.py:345-369)."""
    if args.category in ("nudity", "all"):
        if "safree" not in args.erase_id:
            negative_prompt_space = [" "]
        else:
            negative_prompt_space = list(NUDITY_NEGATIVE_PROMPT_SPACE)
    elif "artists-" in args.category:
        name = args.category.split("-")[-1]
        name = {"VanGogh": "Van Gogh", "KellyMcKernan": "Kelly McKernan"}.get(
            name, name)
        negative_prompt_space = [name]
    else:
        negative_prompt_space = [" "]

    if "safree_neg_prompt" in args.erase_id and len(negative_prompt_space) > 1:
        negative_prompt = ", ".join(negative_prompt_space)
    else:
        negative_prompt = None
    return negative_prompt_space, negative_prompt


def main(argv=None):
    parser, _ = base_parser("Safe-Denoiser TPU nudity benchmark")
    args = parser.parse_args(argv)

    dirs = make_save_dirs(args.save_dir)
    logger = Logger(os.path.join(args.save_dir, "logs.txt"))
    logger.log("All configurations provided:")
    for arg in vars(args):
        logger.log(f"{arg}: {getattr(args, arg)}")

    dataset = pd.read_csv(args.data)
    if "Unnamed: 0" in dataset.columns:
        dataset = dataset.drop(columns=["Unnamed: 0"])
    logger.log(f"{args.category} dataset size: {dataset.shape[0]}")

    logger.log(f"Erase_path: "
               f"{args.erase_concept_checkpoint if 'std' not in args.erase_id else 'na'}")
    pipe = build_pipeline(args, logger)
    repellency_processor, task_config = build_repellency(args, pipe, logger)
    erase_spec = ERASE_SPECS[args.erase_id]

    freeu = None
    if args.safree and args.latent_re_attention:
        b1, b2, s1, s2 = (float(v) for v in args.freeu_hyp.split("-"))
        freeu = FreeUConfig(b1=b1, b2=b2, s1=s1, s2=s2, mode="all")

    safe_config = None
    if "sld" in args.erase_id:
        safe_config = SLD_CONFIGS[args.safe_level]
        logger.log(f"SLD safe level: {args.safe_level}")
        logger.log(f"SLD safe config: {safe_config}")

    eval_func = build_eval(args)
    negative_prompt_space, negative_prompt = resolve_negative_space(args)

    agg = DetectAggregator()

    # Overlapped loop: case i+1's device scan is ENQUEUED before case i's
    # transfer/save/eval — jax dispatch is async, so the chip never idles
    # while the 1-vCPU host writes PNGs and runs the NudeNet interpreter
    # (the reference loop is fully serial: generate → eval → save per case,
    # run_nudity.py:439-504). SDT_RUNNER_DEPTH=1 restores the serial order
    # (outputs are identical either way — depth changes only scheduling);
    # SDT_EVAL_GROUP groups the gate's interpreter calls into one batched
    # pass (NudeClassifier.eval_many).
    from collections import deque

    depth = max(1, int(os.environ.get("SDT_RUNNER_DEPTH", "2")))
    group = max(1, int(os.environ.get("SDT_EVAL_GROUP", "4")))
    inflight: deque = deque()
    ready: list = []

    def _drain_one():
        case, pending, t0 = inflight.popleft()
        imgs = pending.fetch()
        elapsed = time.time() - t0
        logger.log(f"Wall-Clock Time for image generation "
                   f"(Case#: {case.case_number}): {elapsed:.2f} seconds")
        if "artists-" in args.category:
            save_png(imgs[0], os.path.join(dirs["all"],
                                           f"{case.case_number}.png"))
        else:
            ready.append((case, imgs))

    def _flush_ready():
        if not ready:
            return
        if hasattr(eval_func, "eval_many"):
            results = eval_func.eval_many([imgs for _, imgs in ready],
                                          threshold=args.nudity_thr)
        else:
            results = [eval_func(imgs, threshold=args.nudity_thr)
                       for _, imgs in ready]
        for (case, imgs), (is_unsafe, pred) in zip(ready, results):
            agg.add(case.categories, is_unsafe, pred)
            tag = f"{case.case_number}_{'-'.join(case.categories)}.png"
            save_png(imgs[0], os.path.join(
                dirs["unsafe" if is_unsafe else "safe"], tag))
            save_png(imgs[0], os.path.join(dirs["all"], tag))
            logger.log(f"Optimized image is unsafe: {is_unsafe}, "
                       f"toxicity pred: {pred:.3f}")
        ready.clear()

    for case in shard_iter(args, iter_prompt_cases(
            dataset, default_guidance=args.guidance_scale,
            valid_case_numbers=args.valid_case_numbers, logger=logger)):
        if args.resume:
            tag = (f"{case.case_number}.png" if "artists-" in args.category
                   else f"{case.case_number}_{'-'.join(case.categories)}.png")
            if os.path.exists(os.path.join(dirs["all"], tag)):
                logger.log(f"[resume] skipping Case#: {case.case_number}")
                continue
        start_time = time.time()
        pending = pipe.dispatch(
            case.prompt,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=case.guidance,
            negative_prompt=negative_prompt,
            negative_prompt_space=negative_prompt_space,
            height=args.image_length, width=args.image_length,
            seed=case.seed,
            repellency_processor=repellency_processor,
            erase_spec=erase_spec,
            safe_config=safe_config,
            freeu=freeu,
            safree_dict={
                "re_attn_t": [int(t) for t in args.re_attn_t.split(",")],
                "alpha": args.sf_alpha,
                "logger": logger,
                "safree": args.safree,
                "svf": args.self_validation_filter,
                "lra": args.latent_re_attention,
                "up_t": args.up_t,
                "category": args.category,
            })
        inflight.append((case, pending, start_time))
        while len(inflight) >= depth:
            _drain_one()
        if len(ready) >= group:
            _flush_ready()
    while inflight:
        _drain_one()
    _flush_ready()

    if "artists-" not in args.category:
        agg.dump(args, args.save_dir, logger, task_config)
    else:
        # the reference writes config.yaml + (empty) detect_dict.json even
        # for artist runs — only the ratio aggregation is category-gated
        # (reference run_nudity.py:507,527-530)
        dump_run_artifacts(args, args.save_dir, task_config, detect_dict={})
    print("end")


if __name__ == "__main__":
    main()
