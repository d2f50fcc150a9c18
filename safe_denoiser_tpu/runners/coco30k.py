"""COCO-30k fidelity runner (reference run_coco30k.py): vanilla (or safe)
sampling over the coco_30k prompt subset, optional in-loop CLIPScore, images
saved to all/ for offline FID/KID/CLIPScore."""

from __future__ import annotations

import os
import time

import pandas as pd

from ..data import iter_prompt_cases
from ..pipeline.diffusion import ERASE_SPECS
from ..utils.logging import Logger
from .common import (base_parser, build_pipeline, build_repellency,
                     dump_run_artifacts, make_save_dirs, shard_iter)
from .nudity import resolve_negative_space, save_png


class InLoopClipScore:
    """Per-image CLIPScore during the run (reference run_coco30k.py:177-234).

    Uses the framework's CLIP towers; requires local weights
    (--clip_weights_dir with text/ and vision/ state dicts)."""

    def __init__(self, weights_dir: str):
        import jax
        import jax.numpy as jnp

        from ..models import (
            CLIP_VISION_VIT_B_32, CLIPTextConfig, CLIPTextModel,
            CLIPVisionModel, preprocess_clip)
        from ..models.weights import (
            convert_clip_text, convert_clip_vision, load_sharded_state_dict)
        from ..text import CLIPTokenizer

        sd = load_sharded_state_dict(weights_dir)
        text_cfg = CLIPTextConfig(hidden_size=512, num_layers=12, num_heads=8,
                                  intermediate_size=2048, projection_dim=512)
        _put = lambda t: jax.tree_util.tree_map(jax.device_put, t)
        self.text_model = CLIPTextModel(text_cfg)
        # device-resident once (numpy jit args re-upload per scored image)
        self.text_params = _put(convert_clip_text(sd, text_cfg))
        self.vision_model = CLIPVisionModel(CLIP_VISION_VIT_B_32)
        self.vision_params = _put(convert_clip_vision(sd, CLIP_VISION_VIT_B_32))
        self.tokenizer = CLIPTokenizer.from_pretrained(
            os.path.join(weights_dir, "tokenizer"))
        self.preprocess = preprocess_clip
        self._jnp = jnp
        # params as jit ARGUMENTS (HTTP-413 rule, pipeline/diffusion.py)
        _ei = jax.jit(lambda p, px: self.vision_model.apply(p, px)[2])
        self._embed_img = lambda px: _ei(self.vision_params, px)
        _et = jax.jit(lambda p, ids: self.text_model.apply(p, ids)[3])
        self._embed_txt = lambda ids: _et(self.text_params, ids)

    def __call__(self, image, prompt: str) -> float:
        import numpy as np

        from ..evals.clip_metrics import clip_score
        jnp = self._jnp
        img = self._embed_img(self.preprocess(jnp.asarray(image[None])))
        ids = jnp.asarray(self.tokenizer([prompt])["input_ids"])
        txt = self._embed_txt(ids)
        return float(np.asarray(clip_score(img, txt))[0])


def main(argv=None):
    parser, _ = base_parser("Safe-Denoiser TPU COCO-30k fidelity run")
    parser.add_argument("--clip_weights_dir", type=str, default=None,
                        help="local CLIP ViT-B/32 weights for in-loop score")
    parser.add_argument("--hf_dataset_dir", type=str, default=None,
                        help="local Recap-COCO-30K copy: a datasets"
                             ".save_to_disk dir or parquet file/dir "
                             "(reference run_coco30k.py:284-285 pulls it "
                             "from the hub; zero egress here). Overrides "
                             "--data.")
    args = parser.parse_args(argv)

    dirs = make_save_dirs(args.save_dir)
    logger = Logger(os.path.join(args.save_dir, "logs.txt"))
    for arg in vars(args):
        logger.log(f"{arg}: {getattr(args, arg)}")

    if args.hf_dataset_dir:
        from ..data import load_hf_coco_dataset
        dataset = load_hf_coco_dataset(args.hf_dataset_dir)
    else:
        dataset = pd.read_csv(args.data)
    logger.log(f"coco dataset size: {dataset.shape[0]}")

    pipe = build_pipeline(args, logger)
    repellency_processor, task_config = build_repellency(args, pipe, logger)
    erase_spec = ERASE_SPECS[args.erase_id]
    negative_prompt_space, negative_prompt = resolve_negative_space(args)

    scorer = (InLoopClipScore(args.clip_weights_dir)
              if args.clip_weights_dir else None)

    cases = list(shard_iter(args, iter_prompt_cases(
        dataset, default_guidance=args.guidance_scale,
        valid_case_numbers=args.valid_case_numbers, logger=logger)))

    from collections import deque

    # Overlapped like runners/nudity.py: the next batch's (or case's) scan
    # is enqueued before the previous one's transfer + PNG save + in-loop
    # CLIPScore (the scorer itself dispatches device work that overlaps the
    # scan). SDT_RUNNER_DEPTH=1 restores the serial order; outputs are
    # identical either way.
    depth = max(1, int(os.environ.get("SDT_RUNNER_DEPTH", "2")))
    scores = []

    # Batched throughput mode (--batch_size > 1): rows keep their own seeds
    # and guidance; CFG pairs fold into one UNet batch (the reference is
    # hard-coded batch 1 — SURVEY.md §2.4).
    if args.batch_size > 1:
        sd = {"re_attn_t": [int(t) for t in args.re_attn_t.split(",")],
              "alpha": args.sf_alpha, "logger": logger,
              "safree": args.safree, "svf": args.self_validation_filter,
              "lra": args.latent_re_attention, "up_t": args.up_t,
              "category": args.category}
        inflight: deque = deque()

        def _drain_one():
            chunk, pending, t0 = inflight.popleft()
            imgs = pending.fetch()
            logger.log(f"Wall-Clock Time for batch of {len(chunk)}: "
                       f"{time.time() - t0:.2f} seconds")
            for case, img in zip(chunk, imgs):
                save_png(img, os.path.join(dirs["all"],
                                           f"{case.case_number}.png"))
                if scorer is not None:
                    s = scorer(img, case.prompt)
                    scores.append(s)
                    logger.log(f"CLIP score (Case#: {case.case_number}): "
                               f"{s:.4f}")

        for i in range(0, len(cases), args.batch_size):
            chunk = cases[i:i + args.batch_size]
            start = time.time()
            pending = pipe.dispatch_batch(
                [c.prompt for c in chunk], seeds=[c.seed for c in chunk],
                guidance_scales=[c.guidance for c in chunk],
                num_inference_steps=args.num_inference_steps,
                negative_prompt=negative_prompt,
                negative_prompt_space=negative_prompt_space,
                height=args.image_length, width=args.image_length,
                repellency_processor=repellency_processor,
                erase_spec=erase_spec, safree_dict=sd)
            inflight.append((chunk, pending, start))
            while len(inflight) >= depth:
                _drain_one()
        while inflight:
            _drain_one()
        if scores:
            logger.log(f"mean CLIP score: {sum(scores) / len(scores):.4f} "
                       f"over {len(scores)} images")
        print("end")
        return

    inflight: deque = deque()

    def _drain_case():
        case, pending, t0 = inflight.popleft()
        imgs = pending.fetch()
        logger.log(f"Wall-Clock Time for image generation "
                   f"(Case#: {case.case_number}): {time.time() - t0:.2f} seconds")
        save_png(imgs[0],
                 os.path.join(dirs["all"], f"{case.case_number}.png"))
        if scorer is not None:
            s = scorer(imgs[0], case.prompt)
            scores.append(s)
            logger.log(f"CLIP score (Case#: {case.case_number}): {s:.4f}")

    for case in cases:
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
            safree_dict={
                "re_attn_t": [int(t) for t in args.re_attn_t.split(",")],
                "alpha": args.sf_alpha, "logger": logger,
                "safree": args.safree, "svf": args.self_validation_filter,
                "lra": args.latent_re_attention, "up_t": args.up_t,
                "category": args.category,
            })
        inflight.append((case, pending, start))
        while len(inflight) >= depth:
            _drain_case()
    while inflight:
        _drain_case()

    if scores:
        logger.log(f"mean CLIP score: {sum(scores) / len(scores):.4f} "
                   f"over {len(scores)} images")
    # reference run_coco30k.py:542: unconditional merged-config dump
    dump_run_artifacts(args, args.save_dir, task_config)
    print("end")
