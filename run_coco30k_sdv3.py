#!/usr/bin/env python
"""SD3 COCO-30k fidelity CLI (reference run_coco30k_sdv3.py surface)."""
from safe_denoiser_tpu.runners.sdv3 import main_coco30k

if __name__ == "__main__":
    main_coco30k()
