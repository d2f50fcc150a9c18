"""Ad-hoc: trace one bench scan on the real TPU and print per-op device time.

Usage: python tools_profile_scan.py [trace_dir]
Parses plugins/profile/*/​*.trace.json.gz traceEvents (pid named /device:TPU:0)
— per CLAUDE.md this is the only trustworthy per-op timing path here.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 4
BANK_M = 515
STEPS = 50


def build_run():
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

    return run, (latents, text, refs)


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sdt_trace"
    run, (latents, text, refs) = build_run()
    out, _ = run(latents, text, refs, jax.random.PRNGKey(1))
    out.block_until_ready()

    jax.profiler.start_trace(trace_dir)
    out, _ = run(latents, text, refs, jax.random.PRNGKey(2))
    out.block_until_ready()
    jax.profiler.stop_trace()
    time.sleep(1)

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")), key=os.path.getmtime)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU:0" in str(e.get("args", {}).get("name", ""))}
    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
            name = e["name"]
            per_op[name] += e["dur"]
            total += e["dur"]
    print(f"total device time: {total/1e3:.2f} ms over "
          f"{sum(1 for e in events if e.get('pid') in tpu_pids and e.get('ph')=='X')} events")
    print("--- top ops by device time (us) ---")
    for name, dur in per_op.most_common(45):
        print(f"{dur:>10.0f}  {100*dur/total:5.1f}%  {name[:130]}")


if __name__ == "__main__":
    main()
