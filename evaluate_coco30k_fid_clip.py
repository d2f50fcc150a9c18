#!/usr/bin/env python
"""Offline COCO-30k FID/KID + CLIPScore (reference evaluate_coco30k_fid_clip.py)."""
import argparse


def main(argv=None):
    from safe_denoiser_tpu.evals.offline import evaluate_clip_score, evaluate_fid

    p = argparse.ArgumentParser()
    p.add_argument("--sample_dir", required=True, help="<run>/all directory")
    p.add_argument("--dataset_root", default="datasets/coco30k_10k_img")
    p.add_argument("--prompts_csv", default="datasets/coco_30k_10k.csv")
    p.add_argument("--inception_weights", default=None,
                   help="pt_inception-2015-12-05 state dict (.pt/.safetensors)")
    p.add_argument("--clip_weights_dir", default=None,
                   help="local clip-vit-base-patch32 weights dir")
    p.add_argument("--allow_random_init", action="store_true",
                   help="plumbing smoke-runs only: random-init inception "
                        "(FID/KID numbers are NOT valid)")
    args = p.parse_args(argv)

    print(evaluate_fid(args.sample_dir, args.dataset_root,
                       args.inception_weights,
                       allow_random_init=args.allow_random_init))
    if args.clip_weights_dir:
        print(evaluate_clip_score(args.sample_dir, args.prompts_csv,
                                  args.clip_weights_dir))


if __name__ == "__main__":
    main()
