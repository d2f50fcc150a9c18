"""Fused GroupNorm Pallas kernel vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from safe_denoiser_tpu.ops.group_norm import (
    group_norm,
    group_norm_pallas,
    group_norm_ref,
)


@pytest.mark.parametrize("s,c,groups,act", [
    (64, 320, 32, None),
    (512, 320, 32, "silu"),
    (1024, 640, 32, "silu"),
    (128, 96, 8, None),
])
def test_pallas_matches_ref(s, c, groups, act):
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(2, s, c) * 2 + 0.5).astype(np.float32))
    scale = jnp.asarray(rng.randn(c).astype(np.float32))
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    want = group_norm_ref(x, scale, bias, groups, act=act)
    got = group_norm_pallas(x, scale, bias, groups, act=act, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ref_matches_flax_groupnorm():
    import flax.linen as nn

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 64).astype(np.float32))
    scale = jnp.asarray(rng.randn(64).astype(np.float32))
    bias = jnp.asarray(rng.randn(64).astype(np.float32))
    want = nn.GroupNorm(num_groups=8, epsilon=1e-6).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    got = group_norm_ref(x, scale, bias, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_dispatch_cpu_fallback():
    x = jnp.ones((1, 60, 32))  # s not tile-divisible; cpu anyway
    out = group_norm(x, jnp.ones(32), jnp.zeros(32), 8)
    assert out.shape == x.shape


def test_fast_bf16_formulation_matches_two_pass():
    """The bf16 fast path (one-pass sum/sumsq over S, groups folded after,
    bf16 affine apply) must match the two-pass f32 reference evaluated on
    the SAME bf16-quantized input to within ~1 bf16 ulp."""
    import numpy as np

    rng = jax.random.PRNGKey(9)
    xb = (jax.random.normal(rng, (2, 1024, 64), jnp.float32) * 2
          + 5).astype(jnp.bfloat16)
    sc = jax.random.normal(jax.random.fold_in(rng, 1), (64,)) * 0.5 + 1
    bi = jax.random.normal(jax.random.fold_in(rng, 2), (64,)) * 0.1

    fast = group_norm_ref(xb, sc, bi, 8, 1e-5, "silu")
    # two-pass reference on the identical quantized input
    want = group_norm_ref(xb.astype(jnp.float32), sc, bi, 8, 1e-5, "silu")
    d = np.abs(np.asarray(fast, np.float32) - np.asarray(want, np.float32))
    mag = np.abs(np.asarray(want)).max()
    # ~3 bf16 ulp: one-pass stats + the bf16-rounded affine coefficients
    assert d.max() <= 3.0 * mag * 2 ** -8


def test_gn_stats_kernel_matches_reduce():
    """One-pass Pallas stats == the jnp reduces, over the chunked grid."""
    import numpy as np
    from safe_denoiser_tpu.ops.group_norm import gn_stats_pallas

    rng = jax.random.PRNGKey(3)
    x = (jax.random.normal(rng, (2, 2048, 256), jnp.float32) * 2
         + 3).astype(jnp.bfloat16)
    s1, s2 = gn_stats_pallas(x, interpret=True)
    xf = np.asarray(x, np.float32)
    np.testing.assert_allclose(np.asarray(s1), xf.sum(1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), (xf * xf).sum(1), rtol=1e-5)
