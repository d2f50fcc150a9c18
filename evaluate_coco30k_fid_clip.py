#!/usr/bin/env python
"""Offline COCO-30k FID/KID + CLIPScore (reference evaluate_coco30k_fid_clip.py)."""
import argparse

from safe_denoiser_tpu.evals.offline import evaluate_clip_score, evaluate_fid

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sample_dir", required=True, help="<run>/all directory")
    p.add_argument("--dataset_root", default="datasets/coco30k_10k_img")
    p.add_argument("--prompts_csv", default="datasets/coco_30k_10k.csv")
    p.add_argument("--inception_weights", default=None,
                   help="pt_inception-2015-12-05 state dict (.pt/.safetensors)")
    p.add_argument("--clip_weights_dir", default=None,
                   help="local clip-vit-base-patch32 weights dir")
    args = p.parse_args()

    print(evaluate_fid(args.sample_dir, args.dataset_root,
                       args.inception_weights))
    if args.clip_weights_dir:
        print(evaluate_clip_score(args.sample_dir, args.prompts_csv,
                                  args.clip_weights_dir))
