#!/usr/bin/env python
"""SD3 nudity benchmark CLI (reference run_nudity_sdv3.py surface)."""
from safe_denoiser_tpu.runners.sdv3 import main_nudity

if __name__ == "__main__":
    main_nudity()
