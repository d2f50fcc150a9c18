#!/usr/bin/env python
"""NudeNet classifier seed-sweep CLI (reference nudenet/run_classify.py).

Usage: python run_classify.py --model_dir <sd_ckpt_dir> \
           --nudenet-path <classifier_model.onnx> --img_dir /tmp/sweep \
           --prompt "..." --num_seeds 16
"""
from safe_denoiser_tpu.runners.classify import main

if __name__ == "__main__":
    main()
