"""Pallas halo-DMA 3x3 SAME conv for the VAE's NHWC bf16 convs, with the
GroupNorm-affine+SiLU prologue and residual-add epilogue fused in.

Why: XLA's conv emitter runs the decode-leg convs at 28-69% of roofline
(CLAUDE.md decode close-out: [4,128,128,512]->512 measured 3.46 ms vs 1.57
roofline), while plain matmuls in the same programs hit ~93%. This kernel
re-expresses the conv as 9 full-width MXU dots so it inherits matmul
efficiency. The first version (git 81dbed1) beat XLA 1.15-1.64x on pure conv
compute but was a wash in situ: XLA fuses the SAME-pad, the GN affine+silu
apply and the residual add into its conv fusions, and those became
standalone HBM passes around the Pallas call. This version absorbs them:

  * NO pre-pad pass: the input stays [B, H, W, Ci] in HBM. Each grid step
    DMAs a clamped [tile_h+2, W, Ci] row band (pltpu.make_async_copy —
    halo rows overlap between bands, which a BlockSpec cannot express;
    at the top/bottom image edge the clamp shifts the band by one row and
    the kernel re-aligns when writing the activated scratch);
  * the GroupNorm per-channel affine (a_c, b_c from a separate one-pass
    stats kernel, ops/group_norm.gn_affine_coefs) and the SiLU are applied
    on the band in VMEM while staging it into the activated scratch
    (bf16 apply — same numerics as group_norm_ref's fast path);
  * the scratch holds tile_h+4 rows: row(k+1) = activated conv-input row
    i*tile_h-1+k, with the out-of-image rows zeroed, plus one slack row on
    each side so the 9 tap dots can slice the flattened [(tile_h+4)*W, Ci]
    view at start (1+dy)*W + dx - 1 without going out of bounds;
  * each tap is one [tile_h*W, Ci] @ [Ci, Co] dot accumulated in f32. The
    dx=0/dx=2 taps wrap across row boundaries at the image's left/right
    edge columns — but the value SAME-padding wants there is zero, so the
    wrapped garbage is removed exactly by six tiny fix-up dots over the
    scratch's first/last columns (E_left[r] = sum_dy col_{W-1}[r+dy] @
    w[dy,0], mirrored on the right), which simultaneously implements the
    zero left/right conv padding;
  * bias (+ optional residual block) folds into the accumulator init;
    output casts to x.dtype.

Reference parity target: the VAE decoder convs the reference runs through
diffusers' torch Conv2d (reference models use AutoencoderKL.decode via
run_nudity.py:589-596); numerics match lax.conv with f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, *rest, tile_h: int, H: int, W: int,
            Ci: int, Co: int, has_pre: bool, act: str | None,
            has_res: bool, pad_cols: bool = False, nofix: bool = False):
    """pad_cols=True: the activated scratch is 16 columns wider than the
    image (band at column 0, columns W..W+15 permanently zero), so the
    dx=-1 tap at m=0 wraps into the PREVIOUS flat row's zero pad and the
    dx=+1 tap at m=W-1 reads the CURRENT row's zero pad — the six per-band
    edge fix-up dots and the column-mask subtract pass disappear entirely,
    for (W+16)/W more rows per tap dot (3-12% at the decode shapes)."""
    idx = 0
    if has_pre:
        a_ref, s_ref = rest[idx], rest[idx + 1]   # [1, 1, Ci] blocks
        idx += 2
    if has_res:
        res_ref = rest[idx]
        idx += 1
    o_ref, xs, sact, sem = rest[idx:idx + 4]

    b = pl.program_id(0)
    i = pl.program_id(1)
    n_h = pl.num_programs(1)
    th = tile_h

    # clamped halo DMA: band i wants image rows [i*th-1, i*th+th+1); at the
    # image top/bottom the start clamps into range and the band lands one
    # row shifted (d = i*th-1-s in {-1, 0, +1})
    def band_dma(slot, bb, ii):
        s = jnp.clip(ii * th - 1, 0, H - (th + 2))
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(s, th + 2)], xs.at[slot], sem.at[slot])

    g = b * n_h + i            # global step: slot parity survives b changes
    slot = g % 2

    @pl.when(g == 0)
    def _init():
        band_dma(0, 0, 0).start()
        # slack rows 0 / th+3 are read only at single wrap positions whose
        # contributions the fix-up dots subtract again — but they must hold
        # FINITE values for that cancellation (NaN - NaN != 0), so clear the
        # scratch once; afterwards every row only ever holds activations
        sact[...] = jnp.zeros_like(sact)

    nxt = jnp.where(i + 1 < n_h, i + 1, 0)
    nxt_b = jnp.where(i + 1 < n_h, b, b + 1)

    @pl.when(nxt_b < pl.num_programs(0))
    def _prefetch():
        band_dma((g + 1) % 2, nxt_b, nxt).start()

    band_dma(slot, b, i).wait()

    band = xs[slot]                                   # [th+2, W, Ci]
    if has_pre:
        band = band * a_ref[0] + s_ref[0]             # [1, Ci] broadcasts
    if act == "silu":
        # x*sigmoid(x) written dtype-consistently: jax.nn.sigmoid emits an
        # f32 scalar broadcast into the bf16 vector, which Mosaic's
        # verifier rejects ('vector.broadcast' element type mismatch)
        band = band / (jnp.asarray(1.0, band.dtype) + jnp.exp(-band))
    # re-align for the clamp shift: activated conv-input row k goes to
    # scratch row k+1 = band row k+d  =>  write band at row offset 1-d
    s0 = jnp.clip(i * th - 1, 0, H - (th + 2))
    d = i * th - 1 - s0
    Wp = W + 16 if pad_cols else W    # scratch row width (see docstring)
    if pad_cols:
        # pad the band to the scratch width in-register: the 16 pad columns
        # re-zero on every write, so the scratch's pad region stays zero
        # without a separate maintenance pass
        band = jnp.concatenate(
            [band, jnp.zeros((th + 2, 16, Ci), band.dtype)], axis=1)
    sact[pl.ds(1 - d, th + 2)] = band.astype(sact.dtype)

    zero_row = jnp.zeros((Wp, Ci), sact.dtype)

    @pl.when(i == 0)
    def _top():                                       # image row -1
        sact[1] = zero_row

    @pl.when(i == n_h - 1)
    def _bottom():                                    # image row H
        sact[th + 2] = zero_row

    sv = sact[...]                                    # [th+4, Wp, Ci]
    f = sv.reshape((th + 4) * Wp, Ci)
    total = None
    for dy in range(3):
        for dx in range(3):
            start = (1 + dy) * Wp + dx - 1
            y = lax.dot_general(f[start:start + th * Wp], w_ref[dy * 3 + dx],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            total = y if total is None else total + y
    total = total.reshape(th, Wp, Co)
    if pad_cols:
        total = total[:, :W]
    total = total + b_ref[...].astype(jnp.float32)
    if has_res:
        total = total + res_ref[0].astype(jnp.float32)

    # wrap fix-up == zero SAME-padding of the left/right image columns
    # (pad_cols handles both wrap and padding structurally — no fix-ups).
    # nofix (SDT_CONV_NOFIX=1) is a TIMING-ONLY debug switch (wrong values
    # at the image's left/right edge columns) that isolates what the six
    # tiny fix-up dots cost per grid step.
    if not pad_cols and not nofix:
        col_l = sv[:, W - 1, :]                       # [th+4, Ci]
        col_r = sv[:, 0, :]
        e_l = e_r = None
        for dy in range(3):
            yl = lax.dot_general(col_l[dy:dy + th], w_ref[dy * 3],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
            yr = lax.dot_general(col_r[dy + 2:dy + 2 + th], w_ref[dy * 3 + 2],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
            e_l = yl if e_l is None else e_l + yl
            e_r = yr if e_r is None else e_r + yr
        # Mosaic rejects value-level .at[col].add (scatter-add); a column-
        # mask multiply-subtract is the supported form and fuses into the
        # VPU pass
        cw = lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
        total = (total - e_l[:, None, :] * (cw == 0)
                 - e_r[:, None, :] * (cw == W - 1))

    o_ref[0] = total.astype(o_ref.dtype)


def _up_kernel(h_hbm, w_ref, b_ref, o_ref, xs, sact, sem, *,
               tile_h2: int, H2: int, W2: int, Ci: int, Co: int):
    """conv3x3_SAME(nearest-2x-upsample(h)) without materializing the
    upsampled tensor. Factorization: output row 2r+py taps half-rows
    (r-1+j+py) with row-weight groups G_r(0)=({0},{1,2}), G_r(1)=({0,1},{2})
    (because (2r+py+dy-1)//2 collapses two of the three dy taps onto the
    same half-row); columns identically. So each output parity (py, px) is
    a 2x2-tap conv of the HALF-res input with pre-summed weights
    W_eff[py,px][j,k] = sum_{dy in G_r(py,j), dx in G_c(px,k)} w[dy,dx] —
    16 quarter-size dots = 4/9 the MACs of convolving the duplicated
    tensor. The parity planes interleave back in-register before the one
    output write."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_h = pl.num_programs(1)
    th2 = tile_h2

    def band_dma(slot, bb, ii):
        s = jnp.clip(ii * th2 - 1, 0, H2 - (th2 + 2))
        return pltpu.make_async_copy(
            h_hbm.at[bb, pl.ds(s, th2 + 2)], xs.at[slot], sem.at[slot])

    g = b * n_h + i
    slot = g % 2

    @pl.when(g == 0)
    def _init():
        band_dma(0, 0, 0).start()
        sact[...] = jnp.zeros_like(sact)   # slack rows must be finite

    nxt = jnp.where(i + 1 < n_h, i + 1, 0)
    nxt_b = jnp.where(i + 1 < n_h, b, b + 1)

    @pl.when(nxt_b < pl.num_programs(0))
    def _prefetch():
        band_dma((g + 1) % 2, nxt_b, nxt).start()

    band_dma(slot, b, i).wait()
    s0 = jnp.clip(i * th2 - 1, 0, H2 - (th2 + 2))
    d = i * th2 - 1 - s0
    sact[pl.ds(1 - d, th2 + 2)] = xs[slot]

    zero_row = jnp.zeros((W2, Ci), sact.dtype)

    @pl.when(i == 0)
    def _top():                                       # half row -1
        sact[1] = zero_row

    @pl.when(i == n_h - 1)
    def _bottom():                                    # half row H2
        sact[th2 + 2] = zero_row

    sv = sact[...]                                    # [th2+4, W2, Ci]
    f = sv.reshape((th2 + 4) * W2, Ci)
    col_l = sv[:, W2 - 1, :]
    col_r = sv[:, 0, :]
    planes = []
    for py in range(2):
        prow = []
        for px in range(2):
            acc = None
            for j in range(2):
                for k in range(2):
                    start = (j + 1 + py) * W2 + k - (1 - px)
                    y = lax.dot_general(
                        f[start:start + th2 * W2],
                        w_ref[((py * 2 + px) * 2 + j) * 2 + k],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = y if acc is None else acc + y
            acc = acc + b_ref[...].astype(jnp.float32)
            acc = acc.reshape(th2, W2, Co)
            # wrap fix-up == zero SAME-padding at the left/right image edge
            # (column-mask multiply: Mosaic rejects value scatter-add)
            cw = lax.broadcasted_iota(jnp.int32, (1, W2, 1), 1)
            if px == 0:     # k=0 slice wraps at m=0
                e = None
                for j in range(2):
                    y = lax.dot_general(
                        col_l[j + py:j + py + th2],
                        w_ref[((py * 2) * 2 + j) * 2],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    e = y if e is None else e + y
                acc = acc - e[:, None, :] * (cw == 0)
            else:           # k=1 slice wraps at m=W2-1
                e = None
                for j in range(2):
                    y = lax.dot_general(
                        col_r[j + py + 2:j + py + 2 + th2],
                        w_ref[((py * 2 + 1) * 2 + j) * 2 + 1],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    e = y if e is None else e + y
                acc = acc - e[:, None, :] * (cw == W2 - 1)
            prow.append(acc.astype(o_ref.dtype))
        # column interleave: [th2, W2, 2, Co] -> [th2, 2*W2, Co]
        planes.append(jnp.stack(prow, axis=2).reshape(th2, 2 * W2, Co))
    # row interleave over the untiled dim: [th2, 2, W, Co] -> [th, W, Co]
    o_ref[0] = jnp.stack(planes, axis=1).reshape(2 * th2, 2 * W2, Co)


def _up_kernel_planar(h_hbm, w_ref, b_ref, o_ref, xs, sact, sem, *,
                      tile_h2: int, H2: int, W2: int, Ci: int, Co: int,
                      py: int, px: int):
    """Parity-planar lowering of the same factorization as _up_kernel: one
    pallas_call PER output parity (py, px static — Mosaic rejects tap
    slices at traced offsets), so only that parity's [4, Ci, Co] weight
    block is VMEM-resident (4x smaller than the interleaved kernel's full
    [16, Ci, Co] — which is what unlocks the UNet's 640-channel upsample,
    13 MB as one block). Each call writes one quarter plane [B, H2, W2, Co];
    the caller de-interleaves with one XLA transpose+reshape. The band DMA
    re-runs per parity (4x input reads — bands are KBs, weights are MBs:
    the right trade)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_h = pl.num_programs(1)
    th2 = tile_h2

    def band_dma(slot, bb, ii):
        s = jnp.clip(ii * th2 - 1, 0, H2 - (th2 + 2))
        return pltpu.make_async_copy(
            h_hbm.at[bb, pl.ds(s, th2 + 2)], xs.at[slot], sem.at[slot])

    g = b * n_h + i
    slot = g % 2

    @pl.when(g == 0)
    def _init():
        band_dma(0, 0, 0).start()
        sact[...] = jnp.zeros_like(sact)   # slack rows must be finite

    nxt_i = jnp.where(i + 1 < n_h, i + 1, 0)
    nxt_b = jnp.where(i + 1 < n_h, b, b + 1)

    @pl.when(nxt_b < pl.num_programs(0))
    def _prefetch():
        band_dma((g + 1) % 2, nxt_b, nxt_i).start()

    band_dma(slot, b, i).wait()
    s0 = jnp.clip(i * th2 - 1, 0, H2 - (th2 + 2))
    d = i * th2 - 1 - s0
    sact[pl.ds(1 - d, th2 + 2)] = xs[slot]

    zero_row = jnp.zeros((W2, Ci), sact.dtype)

    @pl.when(i == 0)
    def _top():                                       # half row -1
        sact[1] = zero_row

    @pl.when(i == n_h - 1)
    def _bottom():                                    # half row H2
        sact[th2 + 2] = zero_row

    sv = sact[...]                                    # [th2+4, W2, Ci]
    f = sv.reshape((th2 + 4) * W2, Ci)
    acc = None
    for j in range(2):
        for k in range(2):
            start = (j + 1 + py) * W2 + k - (1 - px)  # static: py/px baked
            y = lax.dot_general(
                f[start:start + th2 * W2], w_ref[j * 2 + k],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    acc = acc.reshape(th2, W2, Co) + b_ref[...].astype(jnp.float32)

    # wrap fix-up == zero SAME-padding: the k=0 slice wraps at m=0 (only
    # this parity's px==0 calls), the k=1 slice at m=W2-1 (px==1 calls);
    # column-mask multiply because Mosaic rejects value scatter-add
    cw = lax.broadcasted_iota(jnp.int32, (1, W2, 1), 1)
    if px == 0:
        col_l = sv[:, W2 - 1, :]
        e = None
        for j in range(2):
            y = lax.dot_general(col_l[j + py:j + py + th2], w_ref[j * 2],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            e = y if e is None else e + y
        acc = acc - e[:, None, :] * (cw == 0)
    else:
        col_r = sv[:, 0, :]
        e = None
        for j in range(2):
            y = lax.dot_general(col_r[j + py + 2:j + py + 2 + th2],
                                w_ref[j * 2 + 1],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            e = y if e is None else e + y
        acc = acc - e[:, None, :] * (cw == W2 - 1)

    o_ref[0] = acc.astype(o_ref.dtype)


def _w_eff_up(w: jax.Array) -> jax.Array:
    """[3,3,Ci,Co] -> [16,Ci,Co] pre-summed parity weights (see _up_kernel)."""
    groups = {0: ((0,), (1, 2)), 1: ((0, 1), (2,))}
    out = []
    for py in range(2):
        for px in range(2):
            for j in range(2):
                for k in range(2):
                    acc = 0
                    for dy in groups[py][j]:
                        for dx in groups[px][k]:
                            acc = acc + w[dy, dx]
                    out.append(acc)
    return jnp.stack(out, axis=0)


def _pick_tile_h2(H2: int, W2: int, Co: int) -> int:
    # four parity accumulators [tile_h2*W2, Co] f32 live at once — same
    # total bytes as the full-res accumulator of the non-upsample kernel
    budget = 1.25e6
    for th2 in (8, 4, 2, 1):
        if H2 % th2 == 0 and H2 >= th2 + 2 and th2 * W2 * Co * 4 <= budget:
            return th2
    return 1


def supports_up(h_shape, ci: int, co: int) -> bool:
    """Half-res input shapes the upsample-fused kernel handles: the doubled
    width must be a 16-multiple and the half-height must leave halo-clamp
    headroom. The VAE decoder's three upsamples (512ch 64->128, 512ch
    128->256, 256ch 256->512) all qualify."""
    b, h2, w2, _ = h_shape
    th2 = _pick_tile_h2(h2, w2, co)
    return (ci % 128 == 0 and co % 128 == 0 and w2 % 16 == 0
            and h2 % th2 == 0 and h2 >= th2 + 2
            and ci <= 1024 and co <= 1024)


@functools.partial(jax.jit, static_argnames=("form", "interpret"))
def conv3x3_up(h, w, b=None, *, form: str = "planar",
               interpret: bool = False):
    """conv3x3_SAME(nearest_2x_upsample(h), w) + b for NHWC half-res h.

    Matches Upsample's broadcast-reshape + conv composition (models/vae.py)
    with f32 accumulation; 4/9 the MXU work of convolving the duplicated
    tensor and no materialized upsample. Falls back to the composition for
    unsupported shapes. form='planar' (default) runs one pallas_call per
    output parity with a [4,Ci,Co] weight block plus one XLA de-interleave
    — measured 1.73-3.01x vs XLA at the VAE upsamples and 1.31x at the
    UNet's 640-channel upsample (2026-08-18). form='interleave' writes
    standard layout from one call (one [16,Ci,Co] weight block) but its
    in-kernel column interleave FAILS the Mosaic compile on v5e — kept for
    interpret-mode numerics only."""
    B, H2, W2, Ci = h.shape
    Co = w.shape[-1]
    if not supports_up(h.shape, Ci, Co):
        up = jnp.broadcast_to(h[:, :, None, :, None, :],
                              (B, H2, 2, W2, 2, Ci)).reshape(
                                  B, 2 * H2, 2 * W2, Ci)
        return _fallback(up, w, b, None, None, None, None)

    th2 = _pick_tile_h2(H2, W2, Co)
    bias = (jnp.zeros((1, Co), jnp.float32) if b is None
            else b.reshape(1, Co).astype(jnp.float32))
    scratch = [
        pltpu.VMEM((2, th2 + 2, W2, Ci), h.dtype),
        pltpu.VMEM((th2 + 4, W2, Ci), h.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if form == "planar":
        w16 = _w_eff_up(w)                       # [16, Ci, Co]
        planes = []
        for py in range(2):
            for px in range(2):
                planes.append(pl.pallas_call(
                    functools.partial(_up_kernel_planar, tile_h2=th2, H2=H2,
                                      W2=W2, Ci=Ci, Co=Co, py=py, px=px),
                    grid=(B, H2 // th2),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.ANY),
                        pl.BlockSpec((4, Ci, Co), lambda bi, i: (0, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, Co), lambda bi, i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, th2, W2, Co),
                                           lambda bi, i: (bi, i, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((B, H2, W2, Co), h.dtype),
                    scratch_shapes=scratch,
                    interpret=interpret,
                )(h, w16[(py * 2 + px) * 4:(py * 2 + px) * 4 + 4], bias))
        # de-interleave: planes[py*2+px][b, r, m] -> out[b, 2r+py, 2m+px]
        return jnp.stack(planes, axis=0).reshape(
            2, 2, B, H2, W2, Co).transpose(2, 3, 0, 4, 1, 5).reshape(
                B, 2 * H2, 2 * W2, Co)
    return pl.pallas_call(
        functools.partial(_up_kernel, tile_h2=th2, H2=H2, W2=W2,
                          Ci=Ci, Co=Co),
        grid=(B, H2 // th2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((16, Ci, Co), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * th2, 2 * W2, Co),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H2, 2 * W2, Co), h.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(h, _w_eff_up(w), bias)


def _pick_tile_h(H: int, W: int, Co: int,
                 budget: float | None = None) -> int:
    # up to three per-tap f32 dot results [tile_h*W, Co] are live at once
    # (the in-register row sum); keep each ~<=1.25 MB so Mosaic's scoped
    # VMEM stays inside the v5e budget. The clamped halo DMA needs at least
    # one full extra row in range (H >= tile_h+2). SDT_CONV_BUDGET overrides
    # for on-target tile sweeps (bytes per f32 dot result); conv3x3 threads
    # it through the jit cache key so in-process sweeps recompile.
    if budget is None:
        import os
        budget = float(os.environ.get("SDT_CONV_BUDGET", "1.25e6"))
    for th in (32, 16, 8, 4, 2, 1):
        if H % th == 0 and H >= th + 2 and th * W * Co * 4 <= budget:
            return th
    return 1


def supports(x_shape, ci: int, co: int) -> bool:
    """Shapes the kernel handles well: bf16-tileable channel counts, a
    16-multiple width (the flattened-band view must be a free reshape) and
    a height the row-band grid divides with headroom for the halo clamp.
    The VAE's convs (Ci/Co in {128, 256, 512}, H = W in {64..512}) all
    qualify."""
    b, h, w, _ = x_shape
    th = _pick_tile_h(h, w, co)
    return (ci % 128 == 0 and co % 128 == 0 and w % 16 == 0
            and h % th == 0 and h >= th + 2 and ci <= 1024 and co <= 1024)


def _fallback(x, w, b, pre_scale, pre_shift, act, residual):
    if pre_scale is not None:
        x = x * pre_scale.astype(x.dtype)[:, None, None, :] \
            + pre_shift.astype(x.dtype)[:, None, None, :]
    if act == "silu":
        x = x * jax.nn.sigmoid(x)
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)


def conv3x3(x, w, b=None, pre_scale=None, pre_shift=None, act=None,
            residual=None, *, interpret: bool = False):
    """residual + conv3x3_SAME(act(x*pre_scale + pre_shift), w) + b.

    x: NHWC [B,H,W,Ci]; w: HWIO [3,3,Ci,Co]; pre_scale/pre_shift: optional
    f32 [B,Ci] per-batch-channel GroupNorm affine (applied at x.dtype, like
    group_norm_ref's fast path); act: None|'silu'; residual: [B,H,W,Co].
    f32 accumulation, output in x.dtype. Falls back to the equivalent
    lax.conv composition for unsupported shapes (callers should gate on
    supports()).

    The SDT_CONV_PADCOLS / SDT_CONV_NOFIX env switches are read HERE (not
    inside the jit) so flipping them in-process selects a different compiled
    kernel instead of silently reusing a stale cache entry."""
    import os
    return _conv3x3_jit(
        x, w, b, pre_scale, pre_shift, act, residual, interpret=interpret,
        pad_cols=os.environ.get("SDT_CONV_PADCOLS", "0") == "1",
        nofix=os.environ.get("SDT_CONV_NOFIX") == "1",
        tile_budget=float(os.environ.get("SDT_CONV_BUDGET", "1.25e6")))


@functools.partial(jax.jit, static_argnames=("act", "interpret", "pad_cols",
                                             "nofix", "tile_budget"))
def _conv3x3_jit(x, w, b=None, pre_scale=None, pre_shift=None, act=None,
                 residual=None, *, interpret: bool = False,
                 pad_cols: bool = False, nofix: bool = False,
                 tile_budget: float = 1.25e6):
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    if not supports(x.shape, Ci, Co):
        return _fallback(x, w, b, pre_scale, pre_shift, act, residual)

    Wp = W + 16 if pad_cols else W
    tile_h = _pick_tile_h(H, Wp, Co, budget=tile_budget)
    has_pre = pre_scale is not None
    has_res = residual is not None
    w9 = w.reshape(9, Ci, Co)
    bias = (jnp.zeros((1, Co), jnp.float32) if b is None
            else b.reshape(1, Co).astype(jnp.float32))

    args = [x, w9, bias]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((9, Ci, Co), lambda bi, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Co), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if has_pre:
        # [B, 1, Ci] so the block's last two dims (1, Ci) equal the array's
        # (Mosaic rejects a (1, Ci) block of a [B, Ci] array: sublane dim 1
        # is neither 8-divisible nor the full B)
        args += [pre_scale.astype(x.dtype).reshape(B, 1, Ci),
                 pre_shift.astype(x.dtype).reshape(B, 1, Ci)]
        in_specs += [pl.BlockSpec((1, 1, Ci), lambda bi, i: (bi, 0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    if has_res:
        args.append(residual)
        in_specs.append(pl.BlockSpec((1, tile_h, W, Co),
                                     lambda bi, i: (bi, i, 0, 0),
                                     memory_space=pltpu.VMEM))

    grid = (B, H // tile_h)
    return pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, H=H, W=W, Ci=Ci, Co=Co,
                          has_pre=has_pre, act=act, has_res=has_res,
                          pad_cols=pad_cols, nofix=nofix),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_h, W, Co),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, W, Ci), x.dtype),
            pltpu.VMEM((tile_h + 4, Wp, Ci), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)
