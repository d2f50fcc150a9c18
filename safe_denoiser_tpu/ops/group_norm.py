"""Fused GroupNorm(+SiLU) Pallas TPU kernel.

Motivation (measured, see git history): the UNet forward spends ~25% of its
device time in XLA's convert+reduce fusions for the 109 Group/LayerNorms —
~8× over the bandwidth roofline. This kernel brings a GroupNorm (optionally
fused with the SiLU that always follows it in the resnet blocks) to one HBM
read + one HBM write:

  * grid over the batch; each step holds the sample's [S, C] activations in
    VMEM (max 2.6 MB bf16 for SD-1.4's top resolution),
  * group statistics via an MXU matmul against a [C, 2G] one-hot that
    produces Σx and Σx² per group in a single dot,
  * per-channel scale/shift broadcast back through the transposed one-hot,
    applied in fp32, written back in the input dtype.

Falls back to the jnp implementation off-TPU or for shapes that don't fit
the single-tile budget (e.g. the 512² VAE decoder activations).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_onehot(c: int, groups: int) -> np.ndarray:
    """[C, G] one-hot: channel -> its group (contiguous grouping)."""
    m = np.zeros((c, groups), dtype=np.float32)
    size = c // groups
    for ch in range(c):
        m[ch, ch // size] = 1.0
    return m


def _fast_act_ok(dtype) -> bool:
    """Apply the trailing activation at bf16 instead of f32 when the output
    is bf16 anyway. The normalized value is cast to bf16 for the next conv
    regardless, so silu(bf16(y)) differs from bf16(silu_f32(y)) by ~1 ulp —
    while XLA's f32 sigmoid costs ~2x the whole GroupNorm (measured r3:
    0.067 vs 0.048 ms per level-0 norm, ~0.5 ms/step over the UNet's 109
    norm+silu sites). Stats stay fp32 always. Opt out: SDT_FAST_SILU=0."""
    return (dtype == jnp.bfloat16
            and os.environ.get("SDT_FAST_SILU", "1") == "1")


_STATS_MAX_ELEMS = 1 << 19                    # ~1 MB bf16 per VMEM block


def _stats_chunk(s: int, c: int) -> int:
    """Row-chunk for the one-pass stats kernel: halve S until a [chunk, C]
    bf16 block fits the VMEM budget. Shared by gn_stats_pallas (the actual
    blocking) and gn_affine_coefs (the will-it-fit dispatch gate) so the
    two can never diverge."""
    chunk = s
    while chunk * c > _STATS_MAX_ELEMS and chunk % 2 == 0:
        chunk //= 2
    return chunk


def gn_affine_coefs(x: jax.Array, scale: jax.Array, bias: jax.Array,
                    groups: int, epsilon: float = 1e-6):
    """[B, S, C] -> f32 (a_c, b_c) [B, C] with GN(x)*scale+bias == x*a_c+b_c.

    The one-pass stats path of group_norm_ref's fast branch, exposed so the
    fused Pallas conv (ops/conv3x3.py) can apply the affine inside its halo
    band instead of XLA emitting a standalone apply pass."""
    b, s, c = x.shape
    chunk = _stats_chunk(s, c)
    # the stats kernel is a fusion barrier — only worth it when the
    # activation is big enough that the saved second HBM pass dominates
    # (the VAE decoder; the scan's smaller norms stay fused in XLA,
    # threshold tunable via SDT_GN_STATS_MIN log2-elements)
    min_elems = 1 << int(os.environ.get("SDT_GN_STATS_MIN", "21"))
    if (jax.default_backend() == "tpu" and c >= 128
            and s * c >= min_elems and chunk * c <= _STATS_MAX_ELEMS):
        s1, s2 = gn_stats_pallas(x)                   # one HBM pass
    else:
        xf = x.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=1)                      # [B, C]
        s2 = jnp.sum(xf * xf, axis=1)                 # [B, C]
    n = float(s * (c // groups))
    s1g = s1.reshape(b, groups, -1).sum(-1)           # [B, G]
    s2g = s2.reshape(b, groups, -1).sum(-1)
    mean = s1g / n
    var = s2g / n - mean * mean
    inv = jax.lax.rsqrt(var + epsilon)                # [B, G]
    a_g = jnp.repeat(inv, c // groups, axis=1)        # [B, C]
    m_g = jnp.repeat(mean, c // groups, axis=1)
    a_c = a_g * scale.astype(jnp.float32)
    b_c = bias.astype(jnp.float32) - m_g * a_c
    return a_c, b_c


def group_norm_ref(x: jax.Array, scale: jax.Array, bias: jax.Array,
                   groups: int, epsilon: float = 1e-6,
                   act: str | None = None) -> jax.Array:
    """jnp reference: fp32-statistics GroupNorm over [B, S, C] (+ SiLU).

    f32 inputs keep the reference two-pass mean/var (bit-comparable to the
    torch goldens). bf16 compute takes the fast formulation: one-pass
    sum/sumsq stats reduced over S THEN folded into groups (the direct
    (1,3)-axis reduce makes XLA materialize transposes/copies — measured
    ~90 ms of the 227 ms VAE decode), and a per-channel affine applied at
    bf16. The E[x2]-E[x]2 cancellation is ~1e-5 relative, far below bf16
    input quantization. SDT_FAST_SILU=0 opts out of the fast path."""
    b, s, c = x.shape
    fast = _fast_act_ok(x.dtype)
    if fast:
        a_c, b_c = gn_affine_coefs(x, scale, bias, groups, epsilon)
        # affine applied at bf16: costs one extra ulp (a/b rounding) but
        # measured 170 vs 196 ms on the whole VAE decode — the bf16 form
        # fuses into the surrounding convs where the f32 one forced
        # separate convert_multiply passes
        y = (x * a_c.astype(x.dtype)[:, None, :]
             + b_c.astype(x.dtype)[:, None, :])
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        return y
    xf = x.astype(jnp.float32).reshape(b, s, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + epsilon)
    y = y.reshape(b, s, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


_S_TILE = 512


def _gn_stats_kernel(x_ref, s1_ref, s2_ref):
    """Accumulate per-channel sum and sum-of-squares in one pass over the
    S-chunks of one batch row (grid = (B, n_chunks); the [1, C] outputs are
    revisited consecutively across chunks so they stay VMEM-resident)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    xf = x_ref[0].astype(jnp.float32)
    # outputs are [1, 8, C] (8-sublane minimum block); row 0 carries the sum
    s1_ref[0, 0] += jnp.sum(xf, axis=0)
    s2_ref[0, 0] += jnp.sum(xf * xf, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gn_stats_pallas(x: jax.Array, interpret: bool = False):
    """[B, S, C] -> (sum [B, C], sumsq [B, C]) in f32, reading x ONCE.

    XLA computes the two stats as two separate convert+reduce fusions that
    each re-read the activation (measured 19.5 ms on the VAE decode vs a
    ~4.4 ms read-once floor)."""
    b, s, c = x.shape
    chunk = _stats_chunk(s, c)
    out = jax.ShapeDtypeStruct((b, 8, c), jnp.float32)
    spec = pl.BlockSpec((1, 8, c), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    s1, s2 = pl.pallas_call(
        _gn_stats_kernel,
        grid=(b, s // chunk),
        in_specs=[pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[spec, spec],
        out_shape=(out, out),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x)
    return s1[:, 0, :], s2[:, 0, :]


def _gn_kernel(x_ref, scale_ref, bias_ref, onehot_ref, out_ref,
               *, groups: int, epsilon: float, act: str | None,
               n_per_group: float, fast_act: bool = False):
    """x stays VMEM-resident in the input dtype; fp32 temporaries exist only
    per S-tile, keeping scoped VMEM under the 16 MB v5e limit."""
    s = x_ref.shape[1]
    tile = min(_S_TILE, s)
    n_tiles = s // tile
    m = onehot_ref[:]                                     # [C, G]

    def stat_body(i, carry):
        sum_g, sumsq_g = carry
        xc = x_ref[0, pl.ds(i * tile, tile), :].astype(jnp.float32)
        # HIGHEST precision: the MXU would otherwise truncate the fp32
        # activations to bf16, corrupting Σx² (measured 3e-2 output error)
        sum_g = sum_g + jnp.sum(jax.lax.dot_general(
            xc, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST), axis=0)
        sumsq_g = sumsq_g + jnp.sum(jax.lax.dot_general(
            xc * xc, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST), axis=0)
        return sum_g, sumsq_g

    zeros = jnp.zeros((groups,), jnp.float32)
    sum_g, sumsq_g = jax.lax.fori_loop(0, n_tiles, stat_body, (zeros, zeros))

    mean_g = sum_g / n_per_group
    var_g = sumsq_g / n_per_group - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + epsilon)                # [G]
    # broadcast group stats back to channels: [G] @ [G, C]
    mean_c = jax.lax.dot_general(mean_g[None], m.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)[0]
    inv_c = jax.lax.dot_general(inv_g[None], m.T, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)[0]
    a = inv_c * scale_ref[0]                              # [C]
    b = bias_ref[0] - mean_c * a

    def apply_body(i, _):
        xc = x_ref[0, pl.ds(i * tile, tile), :].astype(jnp.float32)
        y = xc * a[None, :] + b[None, :]
        if act == "silu":
            if fast_act:  # match group_norm_ref's bf16-act numerics
                y = y.astype(out_ref.dtype)
                y = (y * jax.nn.sigmoid(y)).astype(jnp.float32)
            else:
                y = y * jax.nn.sigmoid(y)
        out_ref[0, pl.ds(i * tile, tile), :] = y.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, apply_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("groups", "epsilon", "act", "interpret"))
def group_norm_pallas(x: jax.Array, scale: jax.Array, bias: jax.Array,
                      groups: int, epsilon: float = 1e-6,
                      act: str | None = None,
                      interpret: bool = False) -> jax.Array:
    """x: [B, S, C]; scale/bias: [C]. One grid step per batch row."""
    b, s, c = x.shape
    onehot = jnp.asarray(_group_onehot(c, groups))
    kernel = functools.partial(_gn_kernel, groups=groups, epsilon=epsilon,
                               act=act, n_per_group=float(s * (c // groups)),
                               fast_act=_fast_act_ok(x.dtype))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        interpret=interpret,
    )(x, scale.astype(jnp.float32)[None], bias.astype(jnp.float32)[None],
      onehot)


# single-tile VMEM budget: the x and out blocks are double-buffered by the
# Mosaic pipeliner, so cap at 4096x320 bf16 (2.6 MB x4 + scratch < 16 MB);
# larger activations (up-block concats, VAE decoder) fall back to XLA
_MAX_TILE_ELEMS = 4096 * 320


def group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, groups: int,
               epsilon: float = 1e-6, act: str | None = None) -> jax.Array:
    """Dispatch. Default is the XLA path: profiling showed the Pallas kernel
    matches XLA's per-norm time (~130 us) but acts as a fusion barrier,
    regressing the surrounding elementwise fusions by ~20% of step time.
    Kept behind SDT_FUSED_GN=1 for future tuning."""
    b, s, c = x.shape
    if (os.environ.get("SDT_FUSED_GN") == "1"
            and jax.default_backend() == "tpu" and s * c <= _MAX_TILE_ELEMS
            and c % groups == 0 and s % min(_S_TILE, s) == 0):
        return group_norm_pallas(x, scale, bias, groups, epsilon, act)
    return group_norm_ref(x, scale, bias, groups, epsilon, act)
