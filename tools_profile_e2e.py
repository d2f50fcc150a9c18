"""Ad-hoc: trace the NON-SCAN legs of the e2e pipeline (encode / scan /
decode) on the real TPU and print device time per jit program plus the
host-side gap (wall minus device) — VERDICT r2 item 2 said nobody had
profiled where the 0.131 s/img of e2e overhead goes.

Usage: python tools_profile_e2e.py [trace_dir]
"""

from __future__ import annotations

import collections
import os
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sdt_e2e_trace"
    import bench
    from tools_trace_cat import load_events

    # reuse the bench's own builders so the trace measures the bench path
    import jax.numpy as jnp
    from safe_denoiser_tpu.models import (
        CLIP_VIT_L_14, SD14_VAE, AutoencoderKL, CLIPTextModel)
    from safe_denoiser_tpu.pipeline import (
        GuidanceConfig, RepellencyWindow, sample_sd)
    from safe_denoiser_tpu.repellency import RepellencyConfig
    from safe_denoiser_tpu.schedulers import DDPMScheduler

    unet_apply, unet_params, latents, _, refs = bench._sd14_setup()
    rng = jax.random.PRNGKey(3)
    clip = CLIPTextModel(CLIP_VIT_L_14)
    clip_params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02, s.dtype),
        jax.eval_shape(lambda: clip.init(rng, jnp.zeros((1, 77), jnp.int32))))
    vae = AutoencoderKL(SD14_VAE, dtype=jnp.bfloat16)
    vae_params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02,
                           jnp.bfloat16 if (s.dtype == jnp.float32
                                            and len(s.shape) > 1) else s.dtype),
        jax.eval_shape(
            lambda: vae.init({"params": rng}, jnp.zeros((1, 512, 512, 3)),
                             rng)))
    sched = DDPMScheduler()
    rep = RepellencyConfig(method="kernel_fast", sigma=3.15, scale=0.33,
                           beta_threshold=7.0, use_beta_gate=True)
    B = bench.BATCH

    @jax.jit
    def encode(clip_params, ids):
        ctx, _, _, _ = clip.apply(clip_params, ids)
        return jnp.stack([ctx[:B], ctx[B:]])

    @jax.jit
    def scan(unet_params, text, latents, refs, rng):
        import functools
        lat, _ = sample_sd(functools.partial(unet_apply, unet_params), sched,
                           text, latents, rng, bench.STEPS,
                           guidance=GuidanceConfig(guidance_scale=7.5),
                           repellency=rep, refs_nchw=refs,
                           window=RepellencyWindow(1000.0, 780.0))
        return lat

    @jax.jit
    def decode(vae_params, lat):
        img = vae.apply(vae_params, lat / SD14_VAE.scaling_factor,
                        method=vae.decode)
        img = jnp.clip(img / 2 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255).astype(jnp.uint8)

    rs = np.random.RandomState(0)

    def full(key):
        ids = jnp.asarray(rs.randint(0, 49408, (2 * B, 77)), dtype=jnp.int32)
        text = encode(clip_params, ids)
        lat = scan(unet_params, text, latents, refs, key)
        img = decode(vae_params, lat)
        return np.asarray(img)

    full(jax.random.PRNGKey(1))  # warm every stage
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    full(jax.random.PRNGKey(2))
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    time.sleep(1)

    per_prog = collections.Counter()
    total = 0.0
    for e in load_events(trace_dir):
        name = e["name"]
        if name.startswith(("jit_", "jit(")):
            per_prog[name.split("(")[0]] += e["dur"]
            total += e["dur"]
    print(f"wall {wall*1e3:.1f} ms; device total {total/1e3:.1f} ms; "
          f"host gap {(wall - total/1e6)*1e3:.1f} ms")
    for name, dur in per_prog.most_common(10):
        print(f"  {dur/1e3:>8.2f} ms  {name}")


if __name__ == "__main__":
    main()
