#!/usr/bin/env python
"""COCO-30k fidelity CLI (reference run_coco30k.py surface)."""
from safe_denoiser_tpu.runners.coco30k import main

if __name__ == "__main__":
    main()
