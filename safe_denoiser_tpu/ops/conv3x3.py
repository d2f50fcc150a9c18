"""Pallas halo-DMA 3x3 SAME conv for the VAE decoder's NHWC bf16 convs.

Why: XLA's conv emitter runs the decode-leg convs at 28-69% of roofline
(CLAUDE.md decode close-out: [4,128,128,512]->512 measured 3.46 ms vs 1.57
roofline; [4,512,512,128]->128 at 28%), while plain matmuls in the same
programs hit ~93%. This kernel re-expresses the conv as 9 full-width MXU
dots so it inherits matmul efficiency:

  * the input is SAME-padded once in HBM ([B, H+2, W+2, Ci]);
  * each grid step DMAs one [tile_h+2, W+2, Ci] row band into VMEM
    (pltpu.make_async_copy — halo rows overlap between bands, which a
    BlockSpec cannot express);
  * the band is viewed as [(tile_h+2)*Wp, Ci] (Wp = W+2 rounded up to the
    16-sublane bf16 tile so the reshape is a free view) and, for each of
    the 9 taps, one [tile_h*Wp, Ci] @ [Ci, Co] dot runs over the FULL
    padded width (~2% redundant columns), accumulating the dx-shifted
    slice into an f32 scratch accumulator;
  * bias is folded into the accumulator init; output casts to x.dtype.

Reference parity target: the VAE decoder convs the reference runs through
diffusers' torch Conv2d (reference models use AutoencoderKL.decode via
run_nudity.py:589-596); numerics match lax.conv with f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(x_hbm, w_ref, b_ref, o_ref, xs, acc, sem, *,
            tile_h: int, W: int, Wp: int, Ci: int, Co: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_h = pl.num_programs(1)

    # double-buffered halo DMA: band i computes out of slot i%2 while band
    # i+1 streams into the other slot. Full-width row bands — the input is
    # pre-padded to Wp columns in HBM so the copy needs no partial-width
    # slice (Mosaic requires sliced tiled dims to stay tile-aligned); only
    # the untiled H dim is sliced. The prefetch crosses image boundaries
    # ((b, n_h-1) prefetches (b+1, 0)) so the pipe never drains mid-batch.
    def band_dma(slot, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * tile_h, tile_h + 2)], xs.at[slot],
            sem.at[slot])

    g = b * n_h + i            # global step: slot parity survives b changes
    slot = g % 2

    @pl.when(g == 0)
    def _warmup():
        band_dma(0, 0, 0).start()

    nxt = jnp.where(i + 1 < n_h, i + 1, 0)
    nxt_b = jnp.where(i + 1 < n_h, b, b + 1)

    @pl.when(nxt_b < pl.num_programs(0))
    def _prefetch():
        band_dma((g + 1) % 2, nxt_b, nxt).start()

    band_dma(slot, b, i).wait()
    x2 = xs[slot].reshape((tile_h + 2) * Wp, Ci)
    # one accumulator RMW per kernel row (not per tap): the three dx taps of
    # a row are summed in registers first — at small Co the f32 accumulator
    # traffic, not the MXU, is the limiter
    for dy in range(3):
        xd = x2[dy * Wp:(dy + tile_h) * Wp, :]
        row = None
        for dx in range(3):
            y = lax.dot_general(xd, w_ref[dy * 3 + dx],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            s = y.reshape(tile_h, Wp, Co)[:, dx:dx + W, :]
            row = s if row is None else row + s
        if dy == 0:
            acc[...] = row + b_ref[...].astype(jnp.float32)
        else:
            acc[...] += row
    o_ref[0] = acc[...].astype(o_ref.dtype)


def _pick_tile_h(H: int, W: int, Co: int) -> int:
    # up to three per-tap f32 dot results [tile_h*Wp, Co] are live at once
    # (the in-register row sum); keep each ~<=1.25 MB so Mosaic's scoped
    # VMEM stays inside the v5e budget
    budget = 1.25e6
    for th in (16, 8, 4, 2, 1):
        if H % th == 0 and th * _round_up(W + 2, 16) * Co * 4 <= budget:
            return th
    return 1


def supports(x_shape, ci: int, co: int) -> bool:
    """Shapes the kernel handles well: bf16-tileable channel counts and a
    height the row-band grid divides. The VAE decoder's convs (Ci/Co in
    {128, 256, 512}, H = W in {64..512}) all qualify."""
    b, h, w, _ = x_shape
    return (ci % 128 == 0 and co % 128 == 0 and h % _pick_tile_h(h, w, co) == 0
            and ci <= 1024 and co <= 1024 and w >= 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3(x, w, b=None, *, interpret: bool = False):
    """3x3 stride-1 SAME conv, NHWC x [B,H,W,Ci], HWIO w [3,3,Ci,Co].

    f32 accumulation, output in x.dtype. Falls back to lax.conv for
    unsupported shapes (callers should gate on supports())."""
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    if not supports(x.shape, Ci, Co):
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        out = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        if b is not None:
            out = out + b.astype(jnp.float32)
        return out.astype(x.dtype)

    tile_h = _pick_tile_h(H, W, Co)
    Wp = _round_up(W + 2, 16)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, 0)))
    w9 = w.reshape(9, Ci, Co)
    bias = (jnp.zeros((1, Co), jnp.float32) if b is None
            else b.reshape(1, Co).astype(jnp.float32))

    grid = (B, H // tile_h)
    return pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, W=W, Wp=Wp, Ci=Ci, Co=Co),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, Ci, Co), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, Co),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, Wp, Ci), x.dtype),
            pltpu.VMEM((tile_h, W, Co), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w9, bias)
