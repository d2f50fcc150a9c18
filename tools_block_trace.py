"""Ad-hoc: per-category device time of ONE level-0 Transformer2D stack
(x [8,64,64,320], the layout-anchoring battleground) via profiler traces.

A 50-iteration fori_loop feeding output->input reproduces the in-scan layout
pressure; categories print like tools_trace_cat.py. Env knobs select the
variant under test (SDT_FLASH2_LAYOUT, SDT_LAYOUT_ANCHOR, SDT_ATTN_BARRIER,
SDT_ATTN_REPACK, ...).

Usage: python tools_block_trace.py [tag]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 50


def main():
    from safe_denoiser_tpu.models.unet import Transformer2D
    from tools_trace_cat import categorize

    tag = sys.argv[1] if len(sys.argv) > 1 else "var"
    trace_dir = f"/tmp/block_trace_{tag}"

    model = Transformer2D(num_heads=8, head_dim=40, context_dim=768,
                          dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 64, 64, 320), jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (8, 77, 768),
                            jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.fold_in(rng, 2), x, ctx))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02,
                           jnp.bfloat16 if s.ndim > 1 else s.dtype), shapes)

    @jax.jit
    def run(params, x, ctx):
        def body(i, x):
            y = model.apply(params, x, ctx)
            return y / (1.0 + jnp.max(jnp.abs(y)) * 1e-9)  # keep finite
        return jax.lax.fori_loop(0, N, body, x)

    out = run(params, x, ctx)
    out.block_until_ready()
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    out = run(params, x, ctx)
    out.block_until_ready()
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    time.sleep(1)

    per_cat, total = categorize(trace_dir, N)
    print(f"[{tag}] wall {wall*1e3:.1f} ms; device {total/1e3:.1f} ms "
          f"= {total/1e3/N:.3f} ms/layer-iter")
    for cat, dur in per_cat.most_common(12):
        print(f"  {dur/1e3/N:>7.3f} ms  {100*dur/total:>5.1f}%  {cat}")


if __name__ == "__main__":
    main()
