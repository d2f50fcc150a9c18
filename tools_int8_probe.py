"""int8 (W8A8) vs bf16 matmul probe at the hot dot shapes of BOTH model
families (SD-v1 UNet transformer blocks, SD3 MMDiT blocks).

The v5e MXU rates int8 at 2x bf16 (394.7 vs 196.9 TOPS). This probe answers
whether XLA actually delivers that through `lax.dot_general(s8, s8 -> s32)`
at our shapes, NET of the dynamic-quantization overhead the real pipeline
pays — the int8 body below IS the shipped recipe (ops/quant.py::int8_dense):
weights pre-quantized per-output-channel outside the loop, activations
quantized per-ROW dynamically inside it, dequant fused into the epilogue.

Usage: python tools_int8_probe.py [sd14|sd3|all]   (default all)

Measured 2026-08-19:
  * SD-v1 level-0 (K=320, lane-padded): 0.66-0.89x — a LOSS; the quantize
    pass costs more than the small padded dot saves. Level-1 ~1.0x,
    level-2 1.37-1.72x (per-tensor activation scales). int8 is NOT wired
    for the UNet.
  * SD3 MMDiT, shipped per-row recipe: qkv/out 1.53x, fc1 1.79x, fc2 1.40x
    at rel_err 1.2e-2 — wired as the opt-in SDT_INT8 path; end-to-end ABA
    on the 50-step SD3 scan +16.27%.

Methodology (CLAUDE.md): chained multi-second scan loops, identical feedback
structure in both variants so the A-B difference isolates dot+quant cost;
per-op wall timings through the tunnel are garbage.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# SD-v1 UNet transformer dots, 50-step headline config (batch 8 CFG-folded):
# level-0 S=4096 C=320, level-1 S=1024 C=640, level-2 S=256 C=1280;
# qkv/out projections + GEGLU fc1 (C -> 8C) + ff fc2 (4C -> C).
SHAPES_SD14 = [
    (32768, 320, 320, "l0 qkv/out"),
    (32768, 320, 2560, "l0 fc1"),
    (32768, 1280, 320, "l0 fc2"),
    (8192, 640, 640, "l1 qkv/out"),
    (8192, 640, 5120, "l1 fc1"),
    (8192, 2560, 640, "l1 fc2"),
    (2048, 1280, 1280, "l2 qkv/out"),
    (2048, 1280, 10240, "l2 fc1"),
    (2048, 5120, 1280, "l2 fc2"),
]

# SD3-medium MMDiT at 1024px (CFG pair): 4096 image + 333 context tokens
# ~= 8960 rows over the batch; dim 1536, mlp 6144.
SHAPES_SD3 = [
    (8960, 1536, 1536, "sd3 qkv/out"),
    (8960, 1536, 6144, "sd3 fc1"),
    (8960, 6144, 1536, "sd3 fc2"),
]


def quant_w(w):
    """Per-output-channel symmetric int8 weights + f32 scales."""
    sw = jnp.max(jnp.abs(w), axis=0) / 127.0
    wq = jnp.round(w / sw[None, :]).astype(jnp.int8)
    return wq, sw


def bf16_body(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def int8_body(x, wq, sw):
    """The shipped recipe (ops/quant.py::int8_dense): per-row dynamic
    activation scales, rank-preserving dot, fused dequant."""
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                     1e-12) / 127.0
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sx * sw).astype(jnp.bfloat16)


def time_loop(fn, x, length):
    @jax.jit
    def loop(x):
        def body(c, _):
            y = fn(c)
            # rank-preserving feedback: fold a scalar of y back into the
            # carry so the chain can't be DCE'd; identical in both variants
            c = c * (1.0 + 1e-12 * jnp.sum(y[:1, :1]).astype(c.dtype))
            return c, ()
        c, _ = jax.lax.scan(body, x, None, length=length)
        return jnp.sum(c.astype(jnp.float32))

    float(loop(x))  # compile + warm
    t0 = time.perf_counter()
    float(loop(x))
    return (time.perf_counter() - t0) / length * 1000.0


def main(shapes):
    rng = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()}")
    for i, (rows, k, n, tag) in enumerate(shapes):
        kx, kw = jax.random.split(jax.random.fold_in(rng, i))
        x = (jax.random.normal(kx, (rows, k), jnp.float32)).astype(jnp.bfloat16)
        w = jax.random.normal(kw, (k, n), jnp.float32) / np.sqrt(k)
        wbf = w.astype(jnp.bfloat16)
        wq, sw = quant_w(w)
        flops = 2 * rows * k * n
        # size the loop for ~3 s of bf16 work at 50% of peak
        length = max(50, min(4000, int(3.0 / (flops / (0.5 * 197e12)))))

        t_bf = time_loop(lambda c: bf16_body(c, wbf), x, length)
        t_q = time_loop(lambda c: int8_body(c, wq, sw), x, length)

        # numeric sanity at this shape (relative error of one call) —
        # reduced on-device; only the scalar crosses the tunnel
        @jax.jit
        def rel_err(x, w, wq, sw):
            y_ref = jnp.dot(x.astype(jnp.float32), w)
            y_q = int8_body(x, wq, sw).astype(jnp.float32)
            return (jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
        rel = float(rel_err(x, w, wq, sw))

        eff_bf = flops / (t_bf * 1e-3) / 197e12
        eff_q = flops / (t_q * 1e-3) / 394e12
        print(f"{tag:12s} [{rows:6d},{k:5d}]@[{k:5d},{n:5d}] "
              f"bf16 {t_bf:7.4f} ms ({eff_bf * 100:4.0f}%pk)  "
              f"int8 {t_q:7.4f} ms ({eff_q * 100:4.0f}%pk)  "
              f"speedup {t_bf / t_q:5.2f}x  rel_err {rel:.2e}  n={length}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    main({"sd14": SHAPES_SD14, "sd3": SHAPES_SD3,
          "all": SHAPES_SD14 + SHAPES_SD3}[mode])
