#!/usr/bin/env python
"""Nudity benchmark CLI (reference run_nudity.py surface).

Usage: python run_nudity.py --config configs/base/negation/nudity.json \
           --task_config configs/nudity/safe_denoiser.yaml \
           --erase_id safree_neg_prompt_rep_threshold_time --data datasets/nudity.csv
"""
from safe_denoiser_tpu.runners.nudity import main

if __name__ == "__main__":
    main()
