"""Same-session A/B: 3-stage e2e dispatch (control) vs ONE fused jit program
(tokenize-ids -> CLIP encode -> 50-step scan -> VAE decode -> uint8).

Motivation: the e2e leg sits at 0.99x with scan+decode+encode device time
fully attributed; the remainder is ~40 ms/batch of per-dispatch tunnel RPC
latency (3 dispatches/round). Fusing the three stage jits into one program
cuts that to 1 dispatch/round. The round-1 mega-jit "never finished
compiling" failure was the close-over-params constant-inlining trap
(CLAUDE.md); here all params are jit ARGUMENTS, so the HLO stays small.

Order ABA: control, fused, control — prints img/s for each window.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 4
STEPS = 50
N_ROUNDS = 5


def main():
    import numpy as np

    from bench import _sd14_setup
    from safe_denoiser_tpu.models import (
        CLIP_VIT_L_14, SD14_VAE, AutoencoderKL, CLIPTextModel)
    from safe_denoiser_tpu.pipeline import (
        GuidanceConfig, RepellencyWindow, sample_sd)
    from safe_denoiser_tpu.repellency import RepellencyConfig
    from safe_denoiser_tpu.schedulers import DDPMScheduler

    unet_apply, unet_params, latents, _, refs = _sd14_setup()
    rng = jax.random.PRNGKey(3)

    clip = CLIPTextModel(CLIP_VIT_L_14)
    clip_shapes = jax.eval_shape(
        lambda: clip.init(rng, jnp.zeros((1, 77), jnp.int32)))
    clip_params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02, s.dtype), clip_shapes)
    vae = AutoencoderKL(SD14_VAE, dtype=jnp.bfloat16)
    vae_shapes = jax.eval_shape(
        lambda: vae.init({"params": rng}, jnp.zeros((1, 512, 512, 3)), rng))
    vae_params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02,
                           jnp.bfloat16 if (s.dtype == jnp.float32
                                            and len(s.shape) > 1) else s.dtype),
        vae_shapes)

    sched = DDPMScheduler()
    rep = RepellencyConfig(method="kernel_fast", sigma=3.15, scale=0.33,
                           beta_threshold=7.0, use_beta_gate=True)

    def _encode(clip_params, ids):
        ctx, _, _, _ = clip.apply(clip_params, ids)
        return jnp.stack([ctx[:BATCH], ctx[BATCH:]])

    def _scan(unet_params, text, latents, refs, rng):
        import functools
        lat, _ = sample_sd(functools.partial(unet_apply, unet_params), sched,
                           text, latents, rng, STEPS,
                           guidance=GuidanceConfig(guidance_scale=7.5),
                           repellency=rep, refs_nchw=refs,
                           window=RepellencyWindow(1000.0, 780.0))
        return lat

    def _decode(vae_params, lat):
        img = vae.apply(vae_params, lat / SD14_VAE.scaling_factor,
                        method=vae.decode)
        img = jnp.clip(img / 2 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255).astype(jnp.uint8)

    encode = jax.jit(_encode)
    scan = jax.jit(_scan)
    decode = jax.jit(_decode)

    @jax.jit
    def fused(clip_params, unet_params, vae_params, ids, latents, refs, rng):
        text = _encode(clip_params, ids)
        lat = _scan(unet_params, text, latents, refs, rng)
        return _decode(vae_params, lat)

    rs = np.random.RandomState(0)
    ids_pool = [jnp.asarray(rs.randint(0, 49408, (2 * BATCH, 77)),
                            dtype=jnp.int32) for _ in range(N_ROUNDS + 1)]

    def dispatch_staged(i, rng_key):
        text = encode(clip_params, ids_pool[i])
        lat = scan(unet_params, text, latents, refs, rng_key)
        return decode(vae_params, lat)

    def dispatch_fused(i, rng_key):
        return fused(clip_params, unet_params, vae_params, ids_pool[i],
                     latents, refs, rng_key)

    def window(dispatch, tag):
        np.asarray(dispatch(N_ROUNDS, jax.random.PRNGKey(1)))  # warmup
        t0 = time.perf_counter()
        pending = None
        for i in range(N_ROUNDS):
            img = dispatch(i, jax.random.PRNGKey(2 + i))
            if pending is not None:
                np.asarray(pending)
            pending = img
        np.asarray(pending)
        dt = time.perf_counter() - t0
        rate = (N_ROUNDS * BATCH) / dt
        print(f"[{tag}] {rate:.4f} img/s ({dt:.2f}s / {N_ROUNDS} rounds)",
              flush=True)
        return rate

    print("compiling staged (warm cache expected)...", flush=True)
    a1 = window(dispatch_staged, "staged-1")
    print("compiling fused (cold: one long compile expected)...", flush=True)
    t0 = time.perf_counter()
    f = window(dispatch_fused, "fused")
    print(f"fused total incl compile: {time.perf_counter() - t0:.1f}s",
          flush=True)
    a2 = window(dispatch_staged, "staged-2")
    f2 = window(dispatch_fused, "fused-2")
    print(f"RESULT: staged {a1:.4f}/{a2:.4f}  fused {f:.4f}/{f2:.4f}  "
          f"ratio {max(f, f2) / max(a1, a2):.4f}", flush=True)


if __name__ == "__main__":
    main()
