"""Benchmark: SD-v1.4 50-step safe-denoiser sampling throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the flagship workload of the reference (run_nudity.py: 50-step
SD-v1.4 sampling with CFG + kernel_fast repellency in the 780..1000 timestep
window) as images/sec/chip on the local accelerator, bf16 UNet weights,
CFG folded into the batch axis. The reference runs batch=1 fp32 on one CUDA
GPU; A100-class throughput for 50-step SD-v1.4 fp16 with batching is ~1.5
img/s (diffusers A100 benchmarks) — used as the vs_baseline denominator.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_IMG_PER_SEC = 1.5  # A100-class 50-step SD-v1.4 fp16 batched
STEPS = 50
BATCH = int(os.environ.get("BENCH_BATCH", "4"))
BANK_M = 515  # i2p_sexual bank size (reference caches/sd/i2p_sexual)


def main():
    from safe_denoiser_tpu.models import SD14_UNET, UNet2DCondition
    from safe_denoiser_tpu.pipeline import (
        GuidanceConfig, RepellencyWindow, sample_sd)
    from safe_denoiser_tpu.repellency import RepellencyConfig
    from safe_denoiser_tpu.schedulers import DDPMScheduler

    rng = jax.random.PRNGKey(0)
    model = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    latents = jax.random.normal(rng, (BATCH, 64, 64, 4), dtype=jnp.float32)
    text = jax.random.normal(jax.random.fold_in(rng, 1), (2, BATCH, 77, 768))
    refs = jax.random.normal(jax.random.fold_in(rng, 2), (BANK_M, 4, 64, 64))
    refs = refs / jnp.linalg.norm(refs, axis=1, keepdims=True)

    # throughput only needs correctly-shaped weights; skip the init compile
    shapes = jax.eval_shape(
        lambda: model.init(rng, latents[:1], jnp.asarray(1), text[0, :1]))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02,
                           jnp.bfloat16 if (s.dtype == jnp.float32
                                            and len(s.shape) > 1) else s.dtype),
        shapes)

    sched = DDPMScheduler()
    rep = RepellencyConfig(method="kernel_fast", sigma=3.15, scale=0.33,
                           beta_threshold=7.0, use_beta_gate=True)

    def unet_apply(lat, t, ctx, freeu=None):
        return model.apply(params, lat, t, ctx, freeu=freeu)

    @jax.jit
    def run(latents, text, refs, rng):
        lat, applied = sample_sd(
            unet_apply, sched, text, latents, rng, STEPS,
            guidance=GuidanceConfig(guidance_scale=7.5),
            repellency=rep, refs_nchw=refs,
            window=RepellencyWindow(1000.0, 780.0))
        return lat, jnp.sum(applied)

    # warmup/compile
    out, _ = run(latents, text, refs, jax.random.PRNGKey(1))
    out.block_until_ready()

    n_rounds = 3
    t0 = time.perf_counter()
    for i in range(n_rounds):
        out, _ = run(latents, text, refs, jax.random.PRNGKey(2 + i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    img_per_sec = (n_rounds * BATCH) / dt
    print(json.dumps({
        "metric": "sd14_50step_safe_denoiser_throughput",
        "value": round(img_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
