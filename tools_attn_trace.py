"""Ad-hoc: per-variant device time of the flash2 bhsd kernel via profiler
traces (the only trustworthy per-op timing on this machine — CLAUDE.md).

Runs a 50-iteration loop per (block_q, block_k) variant, captures one trace,
and sums device time for the pallas custom-call vs everything else.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))

B, H, S, D = 8, 8, 4096, 40
N = 50
VARIANTS = [(512, 512), (512, 1024), (512, 2048), (256, 512), (1024, 512),
            (512, 4096)]


def device_op_times(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")), key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU:0" in str(e.get("args", {}).get("name", ""))}
    per_op = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
            per_op[e["name"]] += e["dur"]
    return per_op


def main():
    from safe_denoiser_tpu.ops import attention as A

    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, S, H, D),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, S, H, D),
                          jnp.bfloat16)
    sm = float(D) ** -0.5

    for bq, bk in VARIANTS:
        @jax.jit
        def run(q, k, v, bq=bq, bk=bk):
            def body(i, x):
                b, s, h, d = x.shape
                qf = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
                ktf = jnp.transpose(k, (0, 2, 3, 1)).reshape(b * h, d, s)
                vf = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, s, d)
                o = A._self_attention_bhsd(qf, ktf, vf, sm_scale=sm,
                                           block_q=bq, block_k=bk)
                o = o.reshape(b, h, s, d).transpose(0, 2, 1, 3)
                return o * 0.5 + q * 0.5
            return jax.lax.fori_loop(0, N, body, q)

        try:
            import numpy as np
            out = run(q, k, v)
            np.asarray(out)
            tdir = f"/tmp/attn_trace_{bq}_{bk}"
            jax.profiler.start_trace(tdir)
            np.asarray(run(q, k, v))
            jax.profiler.stop_trace()
            time.sleep(0.5)
            ops = device_op_times(tdir)
            pallas = sum(dur for name, dur in ops.items()
                         if "_self_attention" in name) / N / 1e3
            # top-level jit_run envelope = whole loop incl. layout ops
            total = max((dur for name, dur in ops.items()
                         if name.startswith("jit_run")), default=0) / N / 1e3
            print(f"bq={bq:5d} bk={bk:5d}: kernel {pallas:6.3f} ms | "
                  f"loop total {total:6.3f} ms/iter")
        except Exception as e:
            print(f"bq={bq:5d} bk={bk:5d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
