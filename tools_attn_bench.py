"""Ad-hoc: time attention variants at the SD shapes on the real TPU.

Whole-jit timing (100 layer calls inside one lax.fori_loop per measurement)
— per-op block_until_ready timing is unreliable through the axon tunnel
(CLAUDE.md).

Usage: python tools_attn_bench.py [variant ...]
Variants: flash2 (current dispatch), bhsd, bshd, stock, einsum.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))

B, H, S, D = 8, 8, 4096, 40
N_ITERS = 2000


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return dt / N_ITERS * 1e3  # ms per layer call


def _loop(call):
    @jax.jit
    def run(q, k, v):
        def body(i, x):
            # real data dependency on the carry so XLA can't hoist the call;
            # 0.5x keeps magnitudes bounded across iterations
            return call(x, k, v) * 0.5 + q * 0.5
        return jax.lax.fori_loop(0, N_ITERS, body, q)
    return run


def main():
    variants = sys.argv[1:] or ["bhsd", "bshd", "stock"]
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, S, H, D), jnp.bfloat16)
    sm = float(D) ** -0.5

    from safe_denoiser_tpu.ops import attention as A

    for name in variants:
        if name.startswith("bhsd"):
            parts = name.split(":")
            bq = int(parts[1]) if len(parts) > 1 else 512
            bk = int(parts[2]) if len(parts) > 2 else 512

            def call(q, k, v, bq=bq, bk=bk):
                b, s, h, d = q.shape
                qf = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, s, d)
                ktf = jnp.transpose(k, (0, 2, 3, 1)).reshape(b * h, d, s)
                vf = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, s, d)
                o = A._self_attention_bhsd(qf, ktf, vf, sm_scale=sm,
                                           block_q=bq, block_k=bk)
                return o.reshape(b, h, s, d).transpose(0, 2, 1, 3)
        elif name == "bshd":
            call = functools.partial(A._self_attention_bshd, sm_scale=sm)
        elif name == "stock":
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, flash_attention)
            bs = BlockSizes(block_q=512, block_k_major=2048, block_k=2048,
                            block_b=1, block_q_major_dkv=512,
                            block_k_major_dkv=2048, block_k_dkv=2048,
                            block_q_dkv=512, block_k_major_dq=2048,
                            block_k_dq=2048, block_q_dq=512)

            def call(q, k, v):
                o = flash_attention(
                    jnp.transpose(q, (0, 2, 1, 3)),
                    jnp.transpose(k, (0, 2, 1, 3)),
                    jnp.transpose(v, (0, 2, 1, 3)), sm_scale=sm,
                    block_sizes=bs)
                return jnp.transpose(o, (0, 2, 1, 3))
        elif name == "einsum":
            def call(q, k, v):
                logits = jnp.einsum("bqhd,bkhd->bhqk", q * sm, k,
                                    preferred_element_type=jnp.float32)
                w = jax.nn.softmax(logits, axis=-1)
                return jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v,
                                  preferred_element_type=jnp.float32
                                  ).astype(v.dtype)
        else:
            raise SystemExit(f"unknown variant {name}")
        try:
            ms = _time(_loop(call), q, k, v)
            print(f"{name:8s}: {ms:7.3f} ms / [8,8,4096,40] layer "
                  f"(incl. layout ops)")
        except Exception as e:
            print(f"{name:8s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
