#!/usr/bin/env python
"""Serve safe-denoiser generation over HTTP with dynamic batching.

Beyond-reference deployment surface: the upstream repo generates one prompt
at a time in a research loop; this serves concurrent requests batched onto
the chip at a fixed compiled batch size (per-sample seed/guidance are
traced, so ragged groups pad without recompiling).

Usage:
    python serve.py --model_dir /path/to/sd-v1-4 --port 8000 \
        --batch_size 4 [--task_config configs/nudity/safe_denoiser.yaml]

    curl -s localhost:8000/generate -d '{"prompt": "a painting", "seed": 7}'
"""

from safe_denoiser_tpu.runners.serve import main

if __name__ == "__main__":
    main()
