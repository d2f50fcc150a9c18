#!/usr/bin/env python
"""Offline CoPro AES + CLIPScore (reference evaluate_copro_aes_clip.py)."""
import argparse


def main(argv=None):
    from safe_denoiser_tpu.evals.offline import (
        evaluate_aes_score, evaluate_clip_score)

    p = argparse.ArgumentParser()
    p.add_argument("--sample_dir", required=True, help="<run>/all directory")
    p.add_argument("--prompts_csv", default="datasets/CoPro_balanced_10k.csv")
    p.add_argument("--aes_weights",
                   default="pretrained/sac+logos+ava1-l14-linearMSE.pth")
    p.add_argument("--clip_vision_weights", default=None,
                   help="CLIP ViT-L/14 vision state dict")
    p.add_argument("--clip_weights_dir", default=None,
                   help="local clip-vit-base-patch32 weights dir")
    args = p.parse_args(argv)

    if args.clip_vision_weights:
        print(evaluate_aes_score(args.sample_dir, args.aes_weights,
                                 args.clip_vision_weights))
    if args.clip_weights_dir:
        print(evaluate_clip_score(args.sample_dir, args.prompts_csv,
                                  args.clip_weights_dir,
                                  id_column="idx",
                                  prompt_column="unsafe_prompt"))


if __name__ == "__main__":
    main()
