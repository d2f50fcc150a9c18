"""Per-call cost of the repellency score kernel at the BASELINE bank sizes.

Times a jitted scan of N chained kernel calls (multi-second wall clock — the
only timing signal the axon tunnel reports faithfully, see CLAUDE.md) and
prints ms/call for M=515 (i2p_sexual bank) and M=3000 (CoPro bank) at the
SD-1.4 latent shape [4, 16384].
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from safe_denoiser_tpu.ops.repellency_kernels import rbf_negative_score


def main():
    rng = jax.random.PRNGKey(0)
    for m, length in ((515, 2000), (3000, 500)):
        x = jax.random.normal(rng, (4, 16384), dtype=jnp.float32)
        refs = jax.random.normal(jax.random.fold_in(rng, 1), (m, 16384),
                                 dtype=jnp.float32)
        refs = refs / jnp.linalg.norm(refs, axis=1, keepdims=True)

        @jax.jit
        def loop(x, refs, length=length):
            def body(c, _):
                s, b = rbf_negative_score(c, refs, 3.15)
                return c + 1e-6 * s, b[0]
            c, _ = jax.lax.scan(body, x, None, length=length)
            return c

        np.asarray(loop(x, refs))  # warmup compile, forced real
        t0 = time.perf_counter()
        np.asarray(loop(x, refs))
        dt = time.perf_counter() - t0
        print(f"M={m}: {dt / length * 1000:.3f} ms/call "
              f"({dt:.2f}s / {length} calls)")


if __name__ == "__main__":
    main()
