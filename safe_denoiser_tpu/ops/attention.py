"""Fused self-attention Pallas TPU kernel for the diffusion transformer blocks.

Why not the stock ``jax.experimental.pallas.ops.tpu.flash_attention``: the
SD-1.4 / SD3 spatial self-attentions run at head_dim 40/80 with seq 4096/1024
and *no mask*. The stock kernel measures 67% of the padded-head-dim roofline
on v5e (4.13 ms per [8,8,4096,40] CFG-folded layer); the gap is VPU softmax
work that does not overlap the MXU plus the b-transposed QK^T feed. This
kernel removes everything the workload doesn't need:

  * no causal/segment masking, no ab bias, no backward pass (inference only);
  * K arrives pre-transposed as [BH, D, S] so both matmuls are natural
    [M,K]@[K,N] MXU feeds (no in-kernel transposes) and the K tile is
    sublane- instead of lane-padded (48x4096 vs 4096x128 at D=40 — 2.6x
    less VMEM);
  * online softmax in the exp2 domain: sm_scale*log2(e) is folded into one
    VPU multiply that rides the row-max pass, `exp2` replaces `exp`;
  * fp32 running stats / accumulator, bf16 MXU feeds, single final
    reciprocal-normalize.

Replaces the attention consumed by the reference's Transformer2D blocks
(reference models/unet_2d_blocks.py attention at head_dim 40/80/160) — see
models/layers.py::dot_product_attention for the dispatch.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, kt_ref, v_ref, o_ref, *, sm_scale: float,
                 block_k: int, valid_kv: int, quant_i8: bool = False):
    """One q-block against the full (unmasked) KV row.

    q_ref: [1, bq, D] bf16/f32; kt_ref: [1, D, S]; v_ref: [1, S, D];
    o_ref: [1, bq, D]. ``valid_kv`` < S masks the zero-padded tail keys
    (needed for non-512-multiple sequences, e.g. SD3's 4429 joint tokens)
    — the mask compiles only into the final chunk.

    quant_i8: run the QK^T dot in int8 (SageAttention-style, beyond-parity
    opt-in — MEASURED NEGATIVE, see below). v5e's int8 MXU path is
    nominally 2x bf16, which would halve the D->128 lane-padded floor the
    bf16 QK^T is pinned at. Scales are dynamic and in-kernel: Q
    per-query-row, K per-key-token (columns of K^T), both folded with
    sm_scale into the logit dequant. PV stays bf16: quantizing P+V as well
    measured 2.4-3.4% output error vs 0.8% for QK-only (flat attention
    spreads mass over ~S keys, so 7-bit P accumulates relative noise) —
    same conclusion SageAttention reached. Softmax statistics and the
    output accumulator stay f32.

    ON-TARGET RESULT (2026-08-19 whole-scan ABAs, tools_ab_env.py): SD-v1
    headline -2.95%, SD3 -2.16% — the int8 rate does not beat the in-kernel
    quantize VPU overhead plus the block_q 512 cap (1024 blows scoped VMEM
    with the unrolled quantize temporaries). Kept as a documented opt-in
    (SDT_INT8_ATTN=1) for re-testing on future Mosaic versions; do not
    enable by default.
    """
    bq = q_ref.shape[1]
    s_kv = kt_ref.shape[2]
    n_chunks = s_kv // block_k
    # fold sm_scale and the exp->exp2 change of base into one constant
    c = sm_scale * math.log2(math.e)

    q = q_ref[0]
    masked = valid_kv < s_kv

    def _i8(x, amax):
        # symmetric round-to-nearest int8 with a zero-safe scale
        r = 127.0 / jnp.maximum(amax, 1e-20)
        return jnp.clip(jnp.round(x.astype(jnp.float32) * r),
                        -127.0, 127.0).astype(jnp.int8)

    if quant_i8:
        q_amax = jnp.max(jnp.abs(q.astype(jnp.float32)), axis=1,
                         keepdims=True)                          # [bq, 1]
        qi = _i8(q, q_amax)
        # per-row dequant constant: amax_q/127 * c (K's joins per chunk)
        q_deq = q_amax * (c / 127.0)

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry
        kt = kt_ref[0, :, pl.ds(i * block_k, block_k)]          # [D, bk]
        if quant_i8:
            k_amax = jnp.max(jnp.abs(kt.astype(jnp.float32)), axis=0,
                             keepdims=True)                      # [1, bk]
            ki = _i8(kt, k_amax)
            s32 = jax.lax.dot_general(
                qi, ki, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)                # [bq, bk]
            s = s32.astype(jnp.float32) * q_deq * (k_amax * (1.0 / 127.0))
        else:
            s = jax.lax.dot_general(
                q, kt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # [bq, bk]
            s = s * c                                            # log2 domain
        if masked:  # tail-mask padded keys (no-op chunks fold to identity)
            col = i * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < valid_kv, s, -jnp.inf)
        m_cur = jnp.max(s, axis=1, keepdims=True)                # [bq, 1]
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)                                 # [bq, bk] f32
        l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, pl.ds(i * block_k, block_k), :]             # [bk, D]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [bq, D]
        acc_next = acc_prev * alpha + pv
        return m_next, l_next, acc_next

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, o_ref.shape[2]), jnp.float32)  # = V width (q/kt
    # may carry an int8 contraction pad wider than the output)
    # full unroll: Mosaic supports only unroll=1|all, and the unrolled body
    # lets the scheduler overlap chunk i's exp2/max (VPU) with chunk i+1's
    # matmuls (MXU). (A plain python loop with constant chunk indices
    # measured 4.6% SLOWER end-to-end — keep the traced-index fori form.)
    _, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0),
                                  unroll=True)
    o_ref[0] = (acc * (1.0 / l)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q", "block_k",
                                             "valid_kv", "quant_i8",
                                             "interpret"))
def _self_attention_bhsd(q: jax.Array, kt: jax.Array, v: jax.Array,
                         sm_scale: float, block_q: int = 512,
                         block_k: int = 512, valid_kv: int | None = None,
                         quant_i8: bool = False,
                         interpret: bool = False) -> jax.Array:
    """q: [BH, S, D], kt: [BH, D, S], v: [BH, S, D] -> [BH, S, D].
    S must be a multiple of the blocks; ``valid_kv`` masks padded tail keys."""
    bh, s, d = q.shape
    if quant_i8 and d % 64:
        # int8 MXU feeds with contraction < 64 lower pathologically on v5e
        # (D=40 measured ~2000x slower than bf16); zero-pad the contraction
        # to the next 64-multiple — zeros quantize to zeros and contribute
        # nothing to QK^T. V/output keep the true D.
        dp = -(-d // 64) * 64
        q = jnp.pad(q, ((0, 0), (0, 0), (0, dp - d)))
        kt = jnp.pad(kt, ((0, 0), (0, dp - d), (0, 0)))
    dq = q.shape[2]   # contraction width (= d unless int8-padded above)
    grid = (bh, s // block_q)
    kernel = functools.partial(_attn_kernel, sm_scale=sm_scale,
                               block_k=block_k, quant_i8=quant_i8,
                               valid_kv=s if valid_kv is None else valid_kv)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dq), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dq, s), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * s * d,
            bytes_accessed=q.nbytes + kt.nbytes + v.nbytes + q.nbytes,
            transcendentals=bh * s * s),
        interpret=interpret,
    )(q, kt, v)


def _attn_kernel_nt(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                    block_k: int, valid_kv: int):
    """NT variant: K arrives in the SAME natural [1, S, D] layout as V and
    QK^T contracts D-against-D via NT dimension numbers (the MXU transposes
    the stationary operand in the systolic feed — same form the stock pallas
    flash kernel uses). The point is what the HOST side no longer does: no
    [B,S,H,D]->[BH,D,S] seq-minor transpose exists in the HLO, so XLA's
    layout assignment has nothing to anchor a seq-minor layout on and the
    surrounding qkv/ff matmuls keep their canonical channel-minor layouts
    (round-2 trace: those fusions ran at ~73% of roofline under the anchored
    layout — see VERDICT r2 Weak #1)."""
    bq = q_ref.shape[1]
    s_kv = k_ref.shape[1]
    n_chunks = s_kv // block_k
    c = sm_scale * math.log2(math.e)

    q = q_ref[0]
    masked = valid_kv < s_kv

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]             # [bk, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [bq, bk]
        s = s * c
        if masked:
            col = i * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < valid_kv, s, -jnp.inf)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, pl.ds(i * block_k, block_k), :]             # [bk, D]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [bq, D]
        acc_next = acc_prev * alpha + pv
        return m_next, l_next, acc_next

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, q_ref.shape[2]), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0),
                                  unroll=True)
    o_ref[0] = (acc * (1.0 / l)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q", "block_k",
                                             "valid_kv", "interpret"))
def _self_attention_nt(q: jax.Array, k: jax.Array, v: jax.Array,
                       sm_scale: float, block_q: int = 512,
                       block_k: int = 512, valid_kv: int | None = None,
                       interpret: bool = False) -> jax.Array:
    """q/k/v all [BH, S, D] -> [BH, S, D]; no seq-minor operand anywhere."""
    bh, s, d = q.shape
    grid = (bh, s // block_q)
    kernel = functools.partial(_attn_kernel_nt, sm_scale=sm_scale,
                               block_k=block_k,
                               valid_kv=s if valid_kv is None else valid_kv)
    row_spec = pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * s * d,
            bytes_accessed=q.nbytes + k.nbytes + v.nbytes + q.nbytes,
            transcendentals=bh * s * s),
        interpret=interpret,
    )(q, k, v)


def _attn_kernel_bshd(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                      sm_scale: float, n_kv: int, block_k_inner: int):
    """Natural-layout variant: no host-side transposes anywhere. KV is
    blocked via the GRID (a [1, S, H, D] whole-row block would lane-pad D
    40->128 and double-buffer to 33 MB); online-softmax stats persist in VMEM
    scratch across the kv grid steps, heads walked by an in-kernel loop.
    Within a grid step the kv block is walked in ``block_k_inner`` chunks by
    an unrolled fori loop — the unrolled body lets the Mosaic scheduler
    overlap chunk i's exp2/max (VPU) with chunk i+1's matmuls (MXU), same as
    the bhsd kernel; scratch is read/written once per grid step, the chunk
    carry lives in registers.

    q_ref: [1, bq, H, D]; k_ref/v_ref: [1, bk, H, D]; o_ref: [1, bq, H*D];
    scratch: m/l [H, bq, 128] f32, acc [bq, H*D] f32.
    """
    n_heads = q_ref.shape[2]
    d = q_ref.shape[3]
    bk = k_ref.shape[1]
    n_inner = bk // block_k_inner
    j = pl.program_id(2)
    c = sm_scale * math.log2(math.e)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    for h in range(n_heads):
        q = q_ref[0, :, h, :]                                     # [bq, D]

        def body(i, carry, h=h, q=q):
            m_prev, l_prev, acc_prev = carry
            k = k_ref[0, pl.ds(i * block_k_inner, block_k_inner), h, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)               # [bq, bki]
            s = s * c
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next)
            l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            v = v_ref[0, pl.ds(i * block_k_inner, block_k_inner), h, :]
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # [bq, D]
            return m_next, l_next, acc_prev * alpha + pv

        carry0 = (m_scr[h, :, :1], l_scr[h, :, :1],
                  acc_scr[:, h * d:(h + 1) * d])
        m_next, l_next, acc_next = jax.lax.fori_loop(
            0, n_inner, body, carry0, unroll=True)
        acc_scr[:, h * d:(h + 1) * d] = acc_next
        m_scr[h] = jnp.broadcast_to(m_next, m_scr.shape[1:])
        l_scr[h] = jnp.broadcast_to(l_next, l_scr.shape[1:])

    @pl.when(j == n_kv - 1)
    def _finalize():
        inv = 1.0 / l_scr[:, :, :1]                               # [H, bq, 1]
        parts = [acc_scr[:, h * d:(h + 1) * d] * inv[h]
                 for h in range(n_heads)]
        o_ref[0] = jnp.concatenate(parts, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q", "block_k",
                                             "block_k_inner", "interpret"))
def _self_attention_bshd(q: jax.Array, k: jax.Array, v: jax.Array,
                         sm_scale: float, block_q: int = 256,
                         block_k: int = 512, block_k_inner: int | None = None,
                         interpret: bool = False) -> jax.Array:
    """q/k/v: [B, S, H, D] (natural projection layout) -> [B, S, H, D]."""
    b, s, h, d = q.shape
    n_kv = s // block_k
    grid = (b, s // block_q, n_kv)
    kernel = functools.partial(_attn_kernel_bshd, sm_scale=sm_scale,
                               n_kv=n_kv,
                               block_k_inner=block_k_inner or block_k)
    qspec = pl.BlockSpec((1, block_q, h, d), lambda i, j, k_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, block_k, h, d), lambda i, j, k_: (i, k_, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=pl.BlockSpec((1, block_q, h * d), lambda i, j, k_: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h * d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((h, block_q, 128), jnp.float32),   # running sum
            pltpu.VMEM((block_q, h * d), jnp.float32),    # output acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=3 * q.nbytes + q.nbytes,
            transcendentals=b * h * s * s),
        interpret=interpret,
    )(q, k, v)
    return out.reshape(b, s, h, d)  # bitcast, same memory order


def _repack_to_heads_kernel(x_ref, o_ref, *, n_heads: int, d: int):
    """[1, bs, H*D] -> [1, H, bs, D]: the head-split transpose as an in-VMEM
    lane shuffle. Hiding it inside a Pallas call (instead of an XLA
    transpose) keeps XLA's layout assignment from propagating a seq-minor
    layout backward through the projections (VERDICT r2 Weak #1)."""
    for h in range(n_heads):
        o_ref[0, h] = x_ref[0, :, h * d:(h + 1) * d]


def _repack_from_heads_kernel(x_ref, o_ref, *, n_heads: int, d: int):
    """[1, H, bs, D] -> [1, bs, H*D]: inverse lane shuffle."""
    for h in range(n_heads):
        o_ref[0, :, h * d:(h + 1) * d] = x_ref[0, h]


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def repack_to_heads(x: jax.Array, n_heads: int,
                    interpret: bool = False) -> jax.Array:
    """[B, S, H*D] -> [B, H, S, D] without an XLA-visible transpose."""
    b, s, hd = x.shape
    d = hd // n_heads
    bs = 512 if s % 512 == 0 else s
    return pl.pallas_call(
        functools.partial(_repack_to_heads_kernel, n_heads=n_heads, d=d),
        grid=(b, s // bs),
        in_specs=[pl.BlockSpec((1, bs, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n_heads, bs, d),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_heads, s, d), x.dtype),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnames=("interpret",))
def repack_from_heads(x: jax.Array, interpret: bool = False) -> jax.Array:
    """[B, H, S, D] -> [B, S, H*D] without an XLA-visible transpose."""
    b, h, s, d = x.shape
    bs = 512 if s % 512 == 0 else s
    return pl.pallas_call(
        functools.partial(_repack_from_heads_kernel, n_heads=h, d=d),
        grid=(b, s // bs),
        in_specs=[pl.BlockSpec((1, h, bs, d), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bs, h * d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h * d), x.dtype),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnames=("sm_scale", "chunk_q"))
def _chunked_einsum_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                              sm_scale: float,
                              chunk_q: int = 512) -> jax.Array:
    """Wide-head attention as a q-chunked einsum: per chunk, the [B,H,cq,S]
    f32 logits round-trip HBM between the two MXU dots (33 MB per chunk at
    the VAE mid-block shape, vs 268 MB one-shot) and XLA pipelines
    dot -> softmax -> dot across chunks. q/k/v: [B, S, H, D] -> [B, S, H, D].
    """
    b, s, h, d = q.shape
    n = s // chunk_q
    qs = q.reshape(b, n, chunk_q, h, d).transpose(1, 0, 2, 3, 4)

    def f(qc):
        lg = jnp.einsum("bqhd,bkhd->bhqk", qc, k,
                        preferred_element_type=jnp.float32) * sm_scale
        p = jax.nn.softmax(lg, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    out = jax.lax.map(f, qs)                        # [n, B, cq, H, D]
    return out.transpose(1, 0, 2, 3, 4).reshape(b, s, h, d)


def supports(s_q: int, s_kv: int, head_dim: int, block_q: int = 512) -> bool:
    """Shapes this kernel handles: unmasked self-attention with head dim
    within two lane tiles (SD uses 40/80/160; SD3 64) — or a WIDE full-lane
    head (the VAE mid-block single-head D=512 attention, routed to the
    q-chunked einsum path: one-shot einsum materializes [S, S] f32 logits,
    268 MB per 512^2 image, ~150 ms of the VAE decode; chunked is 1.7 ms). Non-512-multiple
    sequences (SD3's 4096+333 joint tokens) are zero-padded and
    tail-masked."""
    if s_q != s_kv or s_q < block_q:
        return False
    if head_dim > 256:  # wide-head: bshd kernel, no padding, needs 512-grid
        return head_dim % 128 == 0 and head_dim <= 1024 and s_q % 512 == 0
    return True


def self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   sm_scale: float, interpret: bool = False) -> jax.Array:
    """Unmasked self-attention over [B, S, H, D] inputs (flax convention).

    Returns [B, S, H, D] in v.dtype. Seq >= 512; non-512-multiple sequences
    (e.g. SD3's 4096+333 joint tokens) are zero-padded to the block grid and
    the padded tail keys are -inf-masked inside the kernel (padded query
    rows are computed and sliced off).

    Layouts, SDT_FLASH2_LAYOUT={bhsd|nt|bshd} (+SDT_ATTN_REPACK=1):
      * `bhsd` (default): K pre-transposed to [BH, D, S] so both in-kernel
        matmuls are natural MXU feeds; the host-side transposes anchor a
        seq-minor layout on the whole transformer block (ff matmuls ~73% of
        roofline — VERDICT r2 Weak #1).
      * `nt`: K stays [BH, S, D] like V; QK^T uses NT dimension numbers.
        Removes the seq-minor K^T transpose from the HLO (the q/v/out
        transposes remain). Same-session bench r3: 1.3517 vs bhsd 1.3664 —
        the anchoring persists via the q/v transposes.
      * `nt` + SDT_ATTN_REPACK=1: ALL head-split transposes become in-VMEM
        Pallas lane shuffles (repack_to_heads/repack_from_heads); the HLO
        contains only bitcast reshapes, nothing for layout assignment to
        anchor on.
      * `bshd`: fully natural-layout kernel — measured 0.69 img/s ([*,H,D]
        blocks lane-pad 40->128); kept for future Mosaic versions.
    """
    import os

    b, s, h, d = q.shape
    layout = os.environ.get("SDT_FLASH2_LAYOUT", "bhsd")
    compute_dtype = jnp.bfloat16 if v.dtype == jnp.bfloat16 else jnp.float32
    if d > 256 and s % 512 == 0:
        # wide full-lane head (VAE mid-block: H=1, D=512, S=4096): the
        # q-chunked einsum beats every Pallas formulation here — v5e
        # same-session microbench at [4,4096,1,512] bf16: chunked einsum
        # 1.705 ms vs bshd kernel 7.9 ms (10% of roofline; tiny grid steps
        # and 4D blocks dominate) vs one-shot einsum 10.6 ms (268 MB f32
        # logits). XLA pipelines the per-chunk dot -> f32 softmax -> dot
        # through HBM at near-bandwidth.
        out = _chunked_einsum_attention(q.astype(compute_dtype),
                                        k.astype(compute_dtype),
                                        v.astype(compute_dtype),
                                        float(sm_scale))
        return out.astype(v.dtype)
    if layout == "bshd" and s % 512 == 0:
        out = _self_attention_bshd(q.astype(compute_dtype),
                                   k.astype(compute_dtype),
                                   v.astype(compute_dtype),
                                   sm_scale=float(sm_scale),
                                   interpret=interpret)
        return out.astype(v.dtype)
    block = 512
    s_pad = -(-s // block) * block
    valid = s
    # trace sweep (tools_attn_trace.py): block_q 1024 measures 3.001 ms vs
    # 3.040 at 512 for the [8,8,4096,40] layer; use it when the grid allows.
    # The int8-QK path must stay at 512: its per-chunk quantize temporaries
    # under the unrolled fori pushed the 1024-block scoped VMEM to 18.16M
    # (16M limit) at the S=4096 layer. The cap applies only when the int8
    # path is actually taken (bhsd layout + bf16 compute) — an ambient
    # SDT_INT8_ATTN=1 must not slow f32 parity or nt-layout runs.
    quant_i8 = (os.environ.get("SDT_INT8_ATTN") == "1"
                and layout != "nt" and compute_dtype == jnp.bfloat16)
    block_q = 1024 if (s_pad % 1024 == 0 and not quant_i8) else 512
    if s_pad != s:
        # zero-pad to the block grid; padded keys are -inf-masked in the
        # kernel (SD3's joint sequence is 4096 + 333 text tokens), padded
        # q rows produce garbage that is sliced off below
        pad = ((0, 0), (0, s_pad - s), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    if layout == "nt" and os.environ.get("SDT_ATTN_REPACK") == "1":
        # head-split via in-VMEM Pallas lane shuffles: the HLO contains only
        # bitcast reshapes, so no transpose exists for layout assignment to
        # anchor a seq-minor layout on
        hd = h * d
        qf, kf, vf = (
            repack_to_heads(t.reshape(b, s_pad, hd), h,
                            interpret=interpret).reshape(b * h, s_pad, d)
            for t in (q, k, v))
        out = _self_attention_nt(qf.astype(compute_dtype),
                                 kf.astype(compute_dtype),
                                 vf.astype(compute_dtype),
                                 sm_scale=float(sm_scale),
                                 block_q=block_q,
                                 valid_kv=valid if s_pad != s else None,
                                 interpret=interpret)
        out = repack_from_heads(out.reshape(b, h, s_pad, d),
                                interpret=interpret)
        return out[:, :s].reshape(b, s, h, d).astype(v.dtype)
    qf = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, s_pad, d)
    vf = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, s_pad, d)
    if layout == "nt":
        kf = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * h, s_pad, d)
        out = _self_attention_nt(qf.astype(compute_dtype),
                                 kf.astype(compute_dtype),
                                 vf.astype(compute_dtype),
                                 sm_scale=float(sm_scale),
                                 block_q=block_q,
                                 valid_kv=valid if s_pad != s else None,
                                 interpret=interpret)
    else:
        ktf = jnp.transpose(k, (0, 2, 3, 1)).reshape(b * h, d, s_pad)
        # SDT_INT8_ATTN=1: the QK^T dot in int8 (dynamic per-token scales
        # quantized in-kernel, PV + softmax stats untouched — see
        # _attn_kernel quant_i8). Beyond-parity opt-in like the int8 weight
        # path; bf16 compute only (the f32 path keeps reference-exact
        # numerics for the torch parity harnesses).
        out = _self_attention_bhsd(qf.astype(compute_dtype),
                                   ktf.astype(compute_dtype),
                                   vf.astype(compute_dtype),
                                   sm_scale=float(sm_scale),
                                   block_q=block_q,
                                   valid_kv=valid if s_pad != s else None,
                                   quant_i8=quant_i8,
                                   interpret=interpret)
    out = out.reshape(b, h, s_pad, d).transpose(0, 2, 1, 3)[:, :s]
    return out.astype(v.dtype)
