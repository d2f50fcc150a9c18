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

from bench import BATCH  # stage fns come from bench._e2e_setup; keep batch in sync

N_ROUNDS = 5


def main():
    import numpy as np

    from bench import _e2e_setup

    # single-sourced with bench.bench_sd14_e2e — this tool A/Bs that exact
    # leg, so the stage fns and fabricated params are imported, never copied
    (clip_params, unet_params, vae_params, latents, refs,
     _encode, _scan, _decode) = _e2e_setup()

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
