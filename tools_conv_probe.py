"""Isolation probe: XLA conv emitter vs matmul decompositions of the 3x3 conv.

The scan's conv category (4.9 ms/step) and the VAE decode's convs (~75 ms of
the 103 ms decode leg) run at 45-69% of roofline through XLA's conv emitter
(CLAUDE.md decode-conv close-out: bare [4,128,128,512]->512 3x3 bf16 measured
3.46 ms vs 1.57 ms roofline).  The ff matmuls in the same programs run at
~93%.  Hypothesis: re-expressing the 3x3 SAME conv as dots reaches matmul
efficiency:

  * dot9   — 9 shifted [BHW, Cin] @ [Cin, Cout] dots, accumulated
  * im2col — one [BHW, 9*Cin] @ [9*Cin, Cout] dot over stacked shifts

Measurement: serial chain of N convs (output feeds input, C_in == C_out,
stride 1 SAME) jitted as one program, wall-timed over the whole multi-second
chain, ending in a scalar jnp.sum — the only trustworthy wall pattern through
the axon tunnel (CLAUDE.md: per-op timings lie; only multi-second whole-run
walls and profiler traces are real).
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# (B, H, W, C) square conv C->C 3x3 SAME, bf16 — the hot shapes:
# scan (UNet, CFG-folded batch 8) and e2e decode (VAE, batch 4)
SHAPES = [
    ("scan64", (8, 64, 64, 320)),
    ("scan32", (8, 32, 32, 640)),
    ("scan16", (8, 16, 16, 1280)),
    ("scan8", (8, 8, 8, 1280)),
    ("dec64", (4, 64, 64, 512)),
    ("dec128", (4, 128, 128, 512)),
    ("dec256", (4, 256, 256, 512)),
    ("dec512", (4, 512, 512, 128)),
]

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (3, 3, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def conv_xla(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=DN,
                                    preferred_element_type=jnp.float32
                                    ).astype(x.dtype)


def conv_dot9(x, w):
    b, h, wd, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b, h, wd, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, wd, c))
            out = out + lax.dot_general(
                xs.reshape(b * h * wd, c), w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(b, h, wd, co)
    return out.astype(x.dtype)


def conv_im2col(x, w):
    b, h, wd, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, wd, c))
            for dy in range(3) for dx in range(3)]
    xs = jnp.concatenate(cols, axis=-1).reshape(b * h * wd, 9 * c)
    out = lax.dot_general(xs, w.reshape(9 * c, co), (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    return out.reshape(b, h, wd, co).astype(x.dtype)


VARIANTS = {"xla": conv_xla, "dot9": conv_dot9, "im2col": conv_im2col}


def roofline_ms(shape):
    b, h, w, c = shape
    return b * h * w * 9 * c * c * 2 / 197e12 * 1e3   # v5e bf16 ~197 TFLOP/s


def run_one(name, shape, variant, target_s=3.0):
    fn = VARIANTS[variant]
    b, h, w, c = shape
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, shape) * 0.1).astype(jnp.bfloat16)
    wt = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, c, c))
          * 0.02).astype(jnp.bfloat16)

    @jax.jit
    def chain(x, wt, n):
        def body(i, x):
            return fn(x, wt) * 0.1   # keep magnitudes bounded over the chain
        return jnp.sum(lax.fori_loop(0, n, body, x).astype(jnp.float32))

    n = max(8, min(2000, int(target_s / max(roofline_ms(shape) / 0.5, 1e-4)
                             * 1e3)))
    s = chain(x, wt, n)
    s.block_until_ready()            # warmup/compile
    t0 = time.perf_counter()
    s = chain(x, wt, n)
    float(np.asarray(s))             # scalar transfer — cannot lie
    dt = time.perf_counter() - t0
    ms = dt / n * 1e3
    rl = roofline_ms(shape)
    print(f"{name:8s} {variant:7s} n={n:5d}  {ms:7.3f} ms/conv  "
          f"roofline {rl:6.3f}  eff {rl / ms * 100:5.1f}%", flush=True)
    return ms


def main(argv=None):
    import sys
    argv = sys.argv[1:] if argv is None else argv
    only_shapes = [a for a in argv if not a.startswith("-")]
    for name, shape in SHAPES:
        if only_shapes and name not in only_shapes:
            continue
        for variant in VARIANTS:
            try:
                run_one(name, shape, variant)
            except Exception as e:
                print(f"{name:8s} {variant:7s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
