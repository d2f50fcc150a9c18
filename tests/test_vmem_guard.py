"""Pin the repellency-kernel VMEM feasibility guard (round-1 VERDICT item 9).

The guard protects against a Mosaic compiler *crash* (not a clean OOM) on
v5e — ops/repellency_kernels.py::_pallas_fits_vmem/_pick_tile_m. Two layers:

  * host-side: freeze the guard's decision boundary for the real workload
    shapes so budget-constant drift is a visible test failure;
  * on-target (SDT_TPU_TESTS=1 on a real TPU): walk N at the SD-1.4 latent
    width up to the guard's edge and assert the Pallas kernel actually
    compiles+matches just below it, and that the dispatcher falls back to
    the jnp path just above it.

Run the hardware half with:
    SDT_TPU_TESTS=1 python -m pytest tests/test_vmem_guard.py -q
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from safe_denoiser_tpu.ops.repellency_kernels import (
    _pallas_fits_vmem,
    _pick_tile_m,
    rbf_negative_score,
    rbf_negative_score_pallas,
    rbf_negative_score_ref,
)

SD14_D = 4 * 64 * 64          # 16,384
SD3_D = 16 * 128 * 128        # 262,144


def test_guard_boundary_constants():
    """The decision boundary for the benchmark shapes, frozen. If someone
    retunes the budgets, these update deliberately together with an
    on-target re-run of the hardware half below."""
    # SD-1.4 latents: CFG-folded batches up to 32 run in Pallas; 40 falls back
    for n in (1, 4, 8, 16, 32):
        assert _pallas_fits_vmem(n, SD14_D), f"N={n} should fit"
    assert not _pallas_fits_vmem(40, SD14_D)
    # SD3 latents never fit (D=262144): jnp fallback (CLAUDE.md crash note)
    assert not _pallas_fits_vmem(1, SD3_D)
    # tile_m stays a positive multiple of 8 and respects the 512 cap
    for n in (1, 8, 32):
        tm = _pick_tile_m(n, SD14_D)
        assert tm % 8 == 0 and 8 <= tm <= 512


def test_dispatcher_falls_back_above_boundary():
    """rbf_negative_score must route infeasible shapes to the jnp path even
    when use_pallas=True is forced (the guard, not the caller, decides)."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 256).astype(np.float32))
    refs = jnp.asarray(rs.randn(9, 256).astype(np.float32))
    # tiny shape: guard passes; on CPU use_pallas=None -> ref path. Just
    # assert both paths agree through the dispatcher.
    s1, b1 = rbf_negative_score(x, refs, 2.0)
    s2, b2 = rbf_negative_score_ref(x, refs, 2.0)
    # on TPU this compares the real Pallas kernel against jnp (fp32
    # reassociation): same tolerance as the boundary sweep below
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=5e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=5e-4)


@pytest.mark.skipif(os.environ.get("SDT_TPU_TESTS") != "1"
                    or jax.default_backend() != "tpu",
                    reason="real-TPU boundary sweep (SDT_TPU_TESTS=1)")
@pytest.mark.parametrize("n", [8, 16, 32])
def test_tpu_vmem_boundary_sweep_compiles(n):
    """Just below the guard edge: the kernel must COMPILE and match the jnp
    reference at the real SD-1.4 latent width with a realistic bank."""
    rs = np.random.RandomState(n)
    x = jnp.asarray(rs.randn(n, SD14_D).astype(np.float32))
    refs = jnp.asarray(rs.randn(515, SD14_D).astype(np.float32))
    assert _pallas_fits_vmem(n, SD14_D)
    s_pal, b_pal = rbf_negative_score_pallas(x, refs, 3.15)
    s_ref, b_ref = rbf_negative_score_ref(x, refs, 3.15)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b_pal), np.asarray(b_ref),
                               rtol=5e-4)


@pytest.mark.skipif(os.environ.get("SDT_TPU_TESTS") != "1"
                    or jax.default_backend() != "tpu",
                    reason="real-TPU boundary sweep (SDT_TPU_TESTS=1)")
def test_tpu_above_boundary_uses_fallback():
    """Just above the edge the dispatcher must not touch Pallas (Mosaic
    crashes rather than erroring there) — and still return correct values."""
    rs = np.random.RandomState(99)
    n = 40
    assert not _pallas_fits_vmem(n, SD14_D)
    x = jnp.asarray(rs.randn(n, SD14_D).astype(np.float32))
    refs = jnp.asarray(rs.randn(64, SD14_D).astype(np.float32))
    s, b = rbf_negative_score(x, refs, 3.15)
    s_ref, b_ref = rbf_negative_score_ref(x, refs, 3.15)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=5e-4,
                               atol=1e-5)
