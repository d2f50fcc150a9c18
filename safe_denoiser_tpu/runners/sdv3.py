"""SD3 runners (reference run_nudity_sdv3.py / run_coco30k_sdv3.py):
flow-matching safe-denoiser with the fast_sdv3 repellency module."""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

from ..data import get_dataset, get_transform, iter_prompt_cases
from ..pipeline.diffusion_sd3 import SafeDiffusion3Pipeline
from ..pipeline.sampler import RepellencyWindow
from ..repellency import get_repellency_method
from ..utils.config import load_yaml
from ..utils.logging import Logger
from .common import (DetectAggregator, base_parser, build_eval,
                     check_bank_matches_image_length, make_save_dirs,
                     maybe_enable_bank_sharding, shard_iter)
from .nudity import save_png


def build_sd3_repellency(args, pipe: SafeDiffusion3Pipeline, logger: Logger):
    """fp16-aware embed_fn + fast_sdv3 repellency
    (reference run_nudity_sdv3.py:246-262)."""
    import jax
    import jax.numpy as jnp

    if args.task_config is None:
        return None, None
    task_config = load_yaml(args.task_config)
    data_config = task_config["data"]
    dataset = get_dataset(**data_config,
                          transforms=get_transform(**data_config))
    ref_imgs = np.stack([dataset[i] for i in range(len(dataset))])
    check_bank_matches_image_length(ref_imgs, task_config["repellency"],
                                    args.image_length)

    from ..models import AutoencoderKL

    def embed_fn(x):
        nhwc = jnp.transpose(jnp.asarray(x, dtype=jnp.float32), (0, 2, 3, 1))
        z = pipe.vae.apply(pipe.vae_params, nhwc, jax.random.PRNGKey(0),
                           method=AutoencoderKL.sample_latent)
        return jnp.transpose(z, (0, 3, 1, 2)) * pipe.vae.config.scaling_factor

    repellency_config = task_config["repellency"]
    processor = get_repellency_method(
        repellency_config["method"],
        ref_data=ref_imgs, embed_fn=embed_fn, forward_fn=None,
        num_timesteps=args.num_inference_steps, max_idx=None,
        beta_min=None, beta_max=None,
        n_embed=repellency_config["n_embed"],
        normalize_x=True,
        **repellency_config["params"])
    logger.log(f"Repellency method : {repellency_config['method']}")
    return processor, task_config


def _sd3_parser(desc):
    parser, cfg = base_parser(desc)
    parser.set_defaults(guidance_scale=cfg.get("guidance_scale", 2.5),
                        image_length=cfg.get("image_length", 1024),
                        model_id=cfg.get(
                            "model_id",
                            "stabilityai/stable-diffusion-3-medium-diffusers"))
    parser.add_argument("--efficient", action="store_true",
                        default=cfg.get("efficient", False),
                        help="reference CPU-offload variant; no-op on TPU")
    # the reference SD3 safe-denoiser pipeline applies the SAFREE projection
    # unconditionally (safe_denoiser_pipeline.py:1061-1079) — default on,
    # opt out with --no_safree for the vanilla sdv3 pipeline's behavior
    parser.set_defaults(safree=cfg.get("safree", True))
    parser.add_argument("--no_safree", dest="safree", action="store_false")
    # --int8 comes from base_parser (here: W8A8 MMDiT block dots)
    return parser


def main_nudity(argv=None):
    parser = _sd3_parser("Safe-Denoiser TPU SD3 nudity benchmark")
    args = parser.parse_args(argv)

    dirs = make_save_dirs(args.save_dir)
    logger = Logger(os.path.join(args.save_dir, "logs.txt"))
    for arg in vars(args):
        logger.log(f"{arg}: {getattr(args, arg)}")

    dataset = pd.read_csv(args.data)
    if args.model_dir is None:
        raise SystemExit("--model_dir with a local SD3 checkpoint is required")
    pipe = SafeDiffusion3Pipeline.from_pretrained(args.model_dir, logger=logger)
    maybe_enable_bank_sharding(args, pipe, logger)
    if getattr(args, "int8", False):
        pipe.enable_int8()
        logger.log("int8: MMDiT block matmuls quantized (W8A8)")
    repellency_processor, task_config = build_sd3_repellency(args, pipe, logger)
    eval_func = build_eval(args)

    # warmup end 880 for the efficient variant
    # (reference safe_denoiser_pipeline_efficient.py:1011)
    window = RepellencyWindow(1000.0, 880.0 if args.efficient else 780.0)

    agg = DetectAggregator()

    # Overlapped loop, same structure as runners/nudity.py: the SD3 scan is
    # ~7 s/image at 1024² — dispatching case i+1 before fetching case i
    # hides the host's PNG encode + NudeNet interpreter completely.
    # SDT_RUNNER_DEPTH=1 / SDT_EVAL_GROUP=1 restore the serial order.
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
        if "artists-" in args.category:
            # reference run_nudity_sdv3.py:367-369 — artists runs save the
            # image and skip the online gate entirely
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
            agg.add(case.categories, is_unsafe, float(pred))
            tag = f"{case.case_number}_{'-'.join(case.categories)}.png"
            save_png(imgs[0], os.path.join(
                dirs["unsafe" if is_unsafe else "safe"], tag))
            save_png(imgs[0], os.path.join(dirs["all"], tag))
            logger.log(f"Optimized image is unsafe: {is_unsafe}, "
                       f"toxicity pred: {float(pred):.3f}")
        ready.clear()

    for case in shard_iter(args, iter_prompt_cases(
            dataset, default_guidance=args.guidance_scale,
            valid_case_numbers=args.valid_case_numbers, logger=logger)):
        start = time.time()
        # negative_prompt=None -> the pipeline's hardcoded 17-phrase string.
        # EVERY reference SD3 pipeline (vanilla sdv3_pipeline.py:984-991 and
        # safe_denoiser_pipeline.py:989-996) rebinds the negative prompt to
        # this string regardless of the runner's "" — parity for std too.
        pending = pipe.dispatch(
            case.prompt,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=case.guidance,
            height=args.image_length, width=args.image_length,
            seed=case.seed, safree=args.safree,
            sf_alpha=args.sf_alpha,
            repellency_processor=repellency_processor,
            window=window, efficient=args.efficient)
        inflight.append((case, pending, start))
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
        # config.yaml + empty detect_dict.json, same as the SD-v1 artists
        # branch (reference run_nudity_sdv3.py:407 gates only the ratios)
        from .common import dump_run_artifacts
        dump_run_artifacts(args, args.save_dir, task_config, detect_dict={})
    print("end")


def main_coco30k(argv=None):
    parser = _sd3_parser("Safe-Denoiser TPU SD3 COCO-30k fidelity run")
    args = parser.parse_args(argv)

    dirs = make_save_dirs(args.save_dir)
    logger = Logger(os.path.join(args.save_dir, "logs.txt"))
    for arg in vars(args):
        logger.log(f"{arg}: {getattr(args, arg)}")

    dataset = pd.read_csv(args.data)
    if args.model_dir is None:
        raise SystemExit("--model_dir with a local SD3 checkpoint is required")
    pipe = SafeDiffusion3Pipeline.from_pretrained(args.model_dir, logger=logger)
    maybe_enable_bank_sharding(args, pipe, logger)
    if getattr(args, "int8", False):
        pipe.enable_int8()
        logger.log("int8: MMDiT block matmuls quantized (W8A8)")
    repellency_processor, _ = build_sd3_repellency(args, pipe, logger)

    # Overlapped like main_nudity: case i+1's ~7 s scan is enqueued before
    # case i's transfer + PNG save (SDT_RUNNER_DEPTH=1 = serial order).
    from collections import deque

    depth = max(1, int(os.environ.get("SDT_RUNNER_DEPTH", "2")))
    inflight: deque = deque()

    def _drain_one():
        case, pending, t0 = inflight.popleft()
        imgs = pending.fetch()
        logger.log(f"Wall-Clock Time for image generation "
                   f"(Case#: {case.case_number}): {time.time() - t0:.2f} seconds")
        save_png(imgs[0], os.path.join(dirs["all"], f"{case.case_number}.png"))

    for case in shard_iter(args, iter_prompt_cases(
            dataset, default_guidance=args.guidance_scale,
            valid_case_numbers=args.valid_case_numbers, logger=logger)):
        start = time.time()
        pending = pipe.dispatch(
            case.prompt,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=case.guidance,
            height=args.image_length, width=args.image_length,
            seed=case.seed, safree=args.safree,
            sf_alpha=args.sf_alpha,
            repellency_processor=repellency_processor,
            efficient=args.efficient)
        inflight.append((case, pending, start))
        while len(inflight) >= depth:
            _drain_one()
    while inflight:
        _drain_one()
    # reference run_coco30k_sdv3.py:440: unconditional merged-config dump
    from .common import dump_run_artifacts
    dump_run_artifacts(args, args.save_dir, None)
    print("end")
