"""Same-session A/B: bf16 vs int8-QK^T attention kernel on the real TPU.

Stage 1 (kernel): per-layer-shape timing of _self_attention_bhsd with
quant_i8 False/True (whole-loop wall ending in a scalar reduction — per-op
block_until_ready lies through the tunnel) + numerics check on-device.
Stage 2 (headline): `python tools_ab_i8attn.py scan [leg]` dispatches to the
shared ABA harness in tools_ab_env.py (control, int8-attn, control on the
50-step scan; leg defaults to sd14, 'sd3' selects the MMDiT leg).

Reference target: the attention the reference runs through diffusers
Transformer2D blocks (reference models/unet_2d_blocks.py, head_dim 40/80).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from safe_denoiser_tpu.ops.attention import _self_attention_bhsd  # noqa: E402

# the scan's attention layer shapes (CFG-folded batch 8): levels 0-2 + mid
SHAPES = [
    (8 * 8, 4096, 40),    # level 0 spatial self-attn
    (8 * 8, 1024, 80),    # level 1
    (8 * 8, 512, 160),    # level 2 (S=256 padded to 512 by the wrapper)
    (2 * 24, 4608, 64),   # SD3 MMDiT joint attention (4429 padded)
]


def _time(fn, *args, iters=30):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    s = float(out)  # scalar transfer ends the timed region
    return (time.perf_counter() - t0) / iters, s


def main():
    for bh, s, d in SHAPES:
        rs = np.random.RandomState(0)
        q = jnp.asarray(rs.randn(bh, s, d), jnp.bfloat16)
        kt = jnp.asarray(rs.randn(bh, d, s), jnp.bfloat16)
        v = jnp.asarray(rs.randn(bh, s, d), jnp.bfloat16)
        sm = 1.0 / float(np.sqrt(d))

        bf = jax.jit(lambda q, kt, v: jnp.sum(
            _self_attention_bhsd(q, kt, v, sm).astype(jnp.float32)))
        i8 = jax.jit(lambda q, kt, v: jnp.sum(
            _self_attention_bhsd(q, kt, v, sm, quant_i8=True)
            .astype(jnp.float32)))
        try:
            t8, _ = _time(i8, q, kt, v)
        except Exception as e:
            print(f"[{bh},{s},{d}] int8 FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        tb, _ = _time(bf, q, kt, v)
        # on-device numerics: rel fro error of the full outputs
        ob = _self_attention_bhsd(q, kt, v, sm)
        o8 = _self_attention_bhsd(q, kt, v, sm, quant_i8=True)
        rel = float(jnp.linalg.norm((ob - o8).astype(jnp.float32))
                    / jnp.linalg.norm(ob.astype(jnp.float32)))
        print(f"[{bh},{s},{d}]: bf16 {tb*1e3:7.3f} ms  int8-qk {t8*1e3:7.3f}"
              f" ms  ({tb/t8:5.3f}x)  rel {rel:.2e}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "scan":
        # Stage 2: whole-scan ABA via the shared harness (the only readout
        # CLAUDE.md trusts through the tunnel)
        import tools_ab_env
        leg = sys.argv[2] if len(sys.argv) > 2 else "sd14"
        tools_ab_env.main(["SDT_INT8_ATTN", "0", "1", leg])
    else:
        main()
