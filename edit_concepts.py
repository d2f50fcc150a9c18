#!/usr/bin/env python
"""Closed-form concept-editing CLI (UCE / RECE) — produces the edited UNet
checkpoints the reference's ``rece`` erase_id consumes.

Usage: python edit_concepts.py --model_dir <hf-layout ckpt> \
           --erase "nudity" --method rece --save_path rece_nudity.pt
"""
from safe_denoiser_tpu.runners.edit_concepts import main

if __name__ == "__main__":
    main()
