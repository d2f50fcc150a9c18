#!/usr/bin/env python
"""Edvard Munch memorization CLI (reference run_munch.py surface)."""
from safe_denoiser_tpu.runners.artist import main

if __name__ == "__main__":
    main("munch")
