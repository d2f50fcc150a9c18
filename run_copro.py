#!/usr/bin/env python
"""CoPro benchmark CLI (reference run_copro.py surface)."""
from safe_denoiser_tpu.runners.copro import main

if __name__ == "__main__":
    main()
