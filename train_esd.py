#!/usr/bin/env python
"""ESD concept-erasure trainer CLI — produces the erased UNet checkpoints
the reference's --erase_concept_checkpoint consumes (run_nudity.py:124-130).

Usage: python train_esd.py --model_dir <hf-layout ckpt> --prompt "nudity" \
           --train_method noxattn --iterations 1000 --save_path esd.pt
"""
from safe_denoiser_tpu.runners.train_esd import main

if __name__ == "__main__":
    main()
