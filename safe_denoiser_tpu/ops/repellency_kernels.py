"""Repellency math: fused Pallas TPU kernel + jnp reference implementations.

The hot op (reference repellency/repellency_methods_threshold.py:309-349,
``kernel_fast``) is, for a batch of Tweedie estimates x ∈ R^{N×D} and a
cached negative-latent bank R ∈ R^{M×D}:

    w_ij   = exp( -||x_i - r_j||_2 / (2 σ²) )          (RBF on *distance*,
                                                        not squared distance —
                                                        torch.cdist semantics)
    num_i  = Σ_j w_ij · r_j                             ∈ R^D
    β_i    = Σ_j w_ij + ε                               (the "denominator")
    score_i = num_i / β_i

The reference materializes an [N, M, D+1] broadcast product
(repellency_methods_threshold.py:335-336) — O(N·M·D) HBM traffic. The TPU
design reads the bank exactly ONCE per call: a Pallas kernel streams R
through VMEM in M-tiles; each tile feeds both the distance Gram matmul and
the weighted-sum matmul while resident. The jnp fallback uses the two-matmul
decomposition (dist² = ||x||² + ||r||² − 2·x·rᵀ), which XLA maps to the MXU
but reads the bank twice.

``sparse_repellency_force`` implements SPELL-style truncated repulsion
(reference repellency_methods_threshold.py:386-459) without the [N, M, D]
diff materialization: force_i = x_i·Σ_j c_ij − Σ_j c_ij·r_j with
c_ij = relu(radius/d_ij − 1)·[d_ij < radius].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# jnp reference implementation (CPU tests, autodiff, small banks)
# ---------------------------------------------------------------------------


def _pairwise_dist(x: jax.Array, refs: jax.Array) -> jax.Array:
    """Euclidean distance matrix [N, M] via the Gram decomposition (fp32)."""
    x = x.astype(jnp.float32)
    refs = refs.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)            # [N, 1]
    r2 = jnp.sum(refs * refs, axis=-1)[None, :]            # [1, M]
    g = jax.lax.dot_general(x, refs, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)  # [N, M]
    d2 = jnp.maximum(x2 + r2 - 2.0 * g, 0.0)
    return jnp.sqrt(d2)


def rbf_negative_score_ref(x: jax.Array, refs: jax.Array, sigma: float,
                           epsilon: float = 1e-8, normalize: bool = True):
    """jnp implementation. x: [N, D], refs: [M, D] → (score [N, D], beta [N]).

    ``normalize=False`` returns the raw partial sums (Σ w·r, Σ w) without the
    epsilon or the division — the bank-sharded path psums partials across
    devices before normalizing (parallel/bank.py)."""
    dist = _pairwise_dist(x, refs)
    w = jnp.exp(-dist / (2.0 * sigma ** 2))                # [N, M]
    num = jax.lax.dot_general(w, refs.astype(jnp.float32),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)  # [N, D]
    if not normalize:
        return num, jnp.sum(w, axis=-1)
    beta = jnp.sum(w, axis=-1) + epsilon                   # [N]
    return num / beta[:, None], beta


# ---------------------------------------------------------------------------
# Pallas fused kernel: single pass over the bank
# ---------------------------------------------------------------------------


def _rbf_kernel(x_ref, refs_ref, num_ref, beta_ref,
                acc_num, acc_beta, *, sigma: float, epsilon: float,
                valid_rows_last: int, normalize: bool):
    """Grid over M-tiles. Per tile: distances → weights → accumulate."""
    m = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(m == 0)
    def _init():
        acc_num[:] = jnp.zeros_like(acc_num)
        acc_beta[:] = jnp.zeros_like(acc_beta)

    x = x_ref[:]                                           # [N, D] fp32
    r = refs_ref[:]                                        # [TM, D] fp32

    g = jax.lax.dot_general(x, r, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)  # [N, TM]
    xsq = jnp.sum(x * x, axis=-1, keepdims=True)           # [N, 1]
    r2 = jnp.sum(r * r, axis=-1)[None, :]                  # [1, TM]
    d2 = jnp.maximum(xsq + r2 - 2.0 * g, 0.0)
    w = jnp.exp(-jnp.sqrt(d2) / (2.0 * sigma ** 2))        # [N, TM]

    # mask rows past M in the final (padded) tile
    @pl.when(m == n_tiles - 1)
    def _mask():
        col = jax.lax.broadcasted_iota(jnp.int32, w.shape, dimension=1)
        acc_beta[:] = acc_beta[:] + jnp.broadcast_to(jnp.sum(
            jnp.where(col < valid_rows_last, w, 0.0), axis=-1, keepdims=True),
            acc_beta.shape)
        acc_num[:] = acc_num[:] + jax.lax.dot_general(
            jnp.where(col < valid_rows_last, w, 0.0), r,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @pl.when(m != n_tiles - 1)
    def _accum():
        acc_beta[:] = acc_beta[:] + jnp.broadcast_to(
            jnp.sum(w, axis=-1, keepdims=True), acc_beta.shape)
        acc_num[:] = acc_num[:] + jax.lax.dot_general(
            w, r, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @pl.when(m == n_tiles - 1)
    def _finalize():
        if normalize:
            beta = acc_beta[:] + epsilon
            num_ref[:] = acc_num[:] / beta[:, :1]
            beta_ref[:] = beta
        else:   # raw partials for the bank-sharded psum path
            num_ref[:] = acc_num[:]
            beta_ref[:] = acc_beta[:]


def _pick_tile_m(n: int, d: int, vmem_budget: int = 7 * 2 ** 20) -> int:
    """Largest M-tile (multiple of 8) whose working set fits the budget.

    Budget is conservative: the refs tile is double-buffered by the Mosaic
    pipeliner and x/num/beta blocks are sublane-padded to 8 rows, so leave
    headroom under the 16 MB scoped-VMEM limit.
    """
    n_pad = max(8, n)
    fixed = 4 * n_pad * d * 4  # x (2 bufs) + num out (2 bufs) + scratch
    tm = (vmem_budget - fixed) // (2 * d * 4)
    tm = max(8, min(512, int(tm) // 8 * 8))
    return tm


@functools.partial(jax.jit, static_argnames=("sigma", "epsilon", "normalize",
                                              "interpret"))
def rbf_negative_score_pallas(x: jax.Array, refs: jax.Array, sigma: float,
                              epsilon: float = 1e-8, normalize: bool = True,
                              interpret: bool = False):
    """Fused single-pass kernel. x: [N, D], refs: [M, D] (D % 128 == 0)."""
    n, d = x.shape
    m = refs.shape[0]
    assert d % 128 == 0, f"D={d} must be lane-aligned (multiple of 128)"
    tile_m = _pick_tile_m(n, d)
    n_tiles = pl.cdiv(m, tile_m)
    m_pad = n_tiles * tile_m
    valid_last = m - (n_tiles - 1) * tile_m
    if m_pad != m:
        refs = jnp.pad(refs, ((0, m_pad - m), (0, 0)))

    x = x.astype(jnp.float32)
    refs = refs.astype(jnp.float32)

    kernel = functools.partial(
        _rbf_kernel, sigma=sigma, epsilon=epsilon,
        valid_rows_last=valid_last, normalize=normalize)

    num, beta = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((n, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * m_pad * d,
            bytes_accessed=m_pad * d * 4 + 2 * n * d * 4,
            transcendentals=n * m_pad,
        ),
        interpret=interpret,
    )(x, refs)
    return num, beta[:, 0]


def _pallas_fits_vmem(n: int, d: int, budget: int = 12 * 2 ** 20) -> bool:
    """Scoped-VMEM feasibility: x/num blocks (double-buffered) + scratch +
    the minimum 8-row refs tile must fit the ~16 MB v5e limit (Mosaic crashes
    rather than erroring when exceeded — see CLAUDE.md). SD-1.4 latents
    (D=16384) fit; SD3 latents (D=262144) fall back to the jnp path."""
    n_pad = max(8, (n + 7) // 8 * 8)   # sublane-padded row count
    fixed = 5 * n_pad * d * 4          # x ×2 bufs, num ×2 bufs, acc scratch
    min_refs_tile = 2 * 8 * d * 4      # smallest M-tile, double-buffered
    return fixed + min_refs_tile <= budget


def rbf_negative_score(x: jax.Array, refs: jax.Array, sigma: float,
                       epsilon: float = 1e-8, use_pallas: bool | None = None,
                       normalize: bool = True):
    """Dispatch: Pallas on TPU, jnp elsewhere. Returns (score [N,D], beta [N]);
    ``normalize=False`` returns raw (Σ w·r, Σ w) partials (bank-sharded path)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if (use_pallas and x.shape[-1] % 128 == 0
            and _pallas_fits_vmem(x.shape[0], x.shape[-1])):
        return rbf_negative_score_pallas(x, refs, sigma, epsilon,
                                         normalize=normalize)
    return rbf_negative_score_ref(x, refs, sigma, epsilon,
                                  normalize=normalize)


# ---------------------------------------------------------------------------
# Sparse (SPELL) repellency
# ---------------------------------------------------------------------------


def sparse_repellency_force(x: jax.Array, refs: jax.Array, radius: float,
                            raw: bool = False):
    """Truncated repulsive force away from in-radius bank points.

    Reference semantics (repellency_methods_threshold.py:415-439):
      neighbors = {r_j : ||x − r_j|| < radius}
      force = Σ_j relu(radius/||x−r_j|| − 1) · (x − r_j)

    Returns (force [N, D], trunc_weight_sum [N]) — the weight sum drives the
    reference's is_negation flag (":450-453").

    ``raw=True`` returns (Σ c·r [N, D], Σ c [N]) instead — both plain sums
    over M, so the bank-sharded path (parallel/bank.py) psums them across
    shards and forms ``force = x·Σc − Σc·r`` once afterwards.
    """
    dist = _pairwise_dist(x, refs)                          # [N, M]
    in_radius = dist < radius
    c = jnp.where(in_radius,
                  jax.nn.relu(radius / jnp.maximum(dist, 1e-20) - 1.0), 0.0)
    c_sum = jnp.sum(c, axis=-1)                             # [N]
    cr = jax.lax.dot_general(c, refs.astype(jnp.float32),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # [N, D]
    if raw:
        return cr, c_sum
    force = x.astype(jnp.float32) * c_sum[:, None] - cr
    return force, c_sum
