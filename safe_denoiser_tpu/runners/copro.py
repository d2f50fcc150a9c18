"""CoPro benchmark runner (reference run_copro.py): CoPro-10k prompts,
Q16 online gate (category 'all'), repellency without the β gate (the
reference imports repellency_methods_fast at run_copro.py:52)."""

from __future__ import annotations

import os
import time

import pandas as pd

from ..data import iter_prompt_cases
from ..pipeline.diffusion import ERASE_SPECS
from ..utils.logging import Logger
from .common import (
    DetectAggregator, base_parser, build_eval, build_pipeline,
    build_repellency, make_save_dirs, shard_iter)
from .nudity import resolve_negative_space, save_png


def main(argv=None):
    parser, _ = base_parser("Safe-Denoiser TPU CoPro benchmark")
    args = parser.parse_args(argv)
    if args.category == "nudity":
        args.category = "all"     # CoPro default is the Q16 gate

    dirs = make_save_dirs(args.save_dir)
    logger = Logger(os.path.join(args.save_dir, "logs.txt"))
    for arg in vars(args):
        logger.log(f"{arg}: {getattr(args, arg)}")

    dataset = pd.read_csv(args.data)
    logger.log(f"CoPro dataset size: {dataset.shape[0]}")

    pipe = build_pipeline(args, logger)
    repellency_processor, task_config = build_repellency(args, pipe, logger)
    erase_spec = ERASE_SPECS[args.erase_id]
    eval_func = build_eval(args)
    negative_prompt_space, negative_prompt = resolve_negative_space(args)

    agg = DetectAggregator()

    # Overlapped loop, same structure as runners/nudity.py: dispatch case
    # i+1's device scan before fetching/saving/evaluating case i, and drain
    # the Q16 gate in grouped vision-tower forwards (Q16Eval.eval_many).
    # SDT_RUNNER_DEPTH=1 / SDT_EVAL_GROUP=1 restore the reference's serial
    # order; outputs are identical either way.
    from collections import deque

    depth = max(1, int(os.environ.get("SDT_RUNNER_DEPTH", "2")))
    group = max(1, int(os.environ.get("SDT_EVAL_GROUP", "4")))
    inflight: deque = deque()
    ready: list = []

    def _drain_one():
        case, pending, t0 = inflight.popleft()
        imgs = pending.fetch()
        logger.log(f"Wall-Clock Time for image generation "
                   f"(Case#: {case.case_number}): {time.time() - t0:.2f} seconds")
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
            agg.add(case.categories, is_unsafe, float(pred))
            tag = f"{case.case_number}.png"
            save_png(imgs[0], os.path.join(
                dirs["unsafe" if is_unsafe else "safe"], tag))
            save_png(imgs[0], os.path.join(dirs["all"], tag))
            logger.log(f"Optimized image is unsafe: {is_unsafe}, "
                       f"toxicity pred: {float(pred):.3f}")
        ready.clear()

    for case in shard_iter(args, iter_prompt_cases(
            dataset, default_guidance=args.guidance_scale,
            valid_case_numbers=args.valid_case_numbers, logger=logger)):
        if args.resume and os.path.exists(
                os.path.join(dirs["all"], f"{case.case_number}.png")):
            logger.log(f"[resume] skipping Case#: {case.case_number}")
            continue
        start = time.time()
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
            use_beta_gate=False,
            safree_dict={
                "re_attn_t": [int(t) for t in args.re_attn_t.split(",")],
                "alpha": args.sf_alpha, "logger": logger,
                "safree": args.safree, "svf": args.self_validation_filter,
                "lra": args.latent_re_attention, "up_t": args.up_t,
                "category": args.category,
            })
        inflight.append((case, pending, start))
        while len(inflight) >= depth:
            _drain_one()
        if len(ready) >= group:
            _flush_ready()
    while inflight:
        _drain_one()
    _flush_ready()

    agg.dump(args, args.save_dir, logger, task_config)
    print("end")
