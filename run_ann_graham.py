#!/usr/bin/env python
"""Ann Graham Lotz memorization CLI (reference run_ann_graham.py surface)."""
from safe_denoiser_tpu.runners.artist import main

if __name__ == "__main__":
    main("ann_graham")
