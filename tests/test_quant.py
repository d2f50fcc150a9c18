"""int8 W8A8 quantization (ops/quant.py + models/layers.QDense).

Opt-in perf path for the SD3 MMDiT (SDT_INT8=1 in bench.py /
SafeDiffusion3Pipeline.enable_int8). The reference has no quantized path
(torch fp16/fp32 only) — these tests pin the two safety properties the
opt-in depends on: the default (non-quantized) path is bit-identical to
nn.Dense, and the quantized forward stays within the measured error
envelope of the probe (tools_int8_probe.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from safe_denoiser_tpu.models.layers import QDense
from safe_denoiser_tpu.models.mmdit import MMDiT, MMDiTConfig
from safe_denoiser_tpu.ops.quant import (int8_dense, quantize_dense_kernel,
                                         quantize_mmdit_params,
                                         quantize_unet_params)

RNG = jax.random.PRNGKey(0)


TINY = MMDiTConfig(sample_size=16, num_layers=2, num_heads=4, head_dim=16,
                   joint_attention_dim=64, caption_projection_dim=64,
                   pooled_projection_dim=48, pos_embed_max_size=16)


def _tiny_inputs():
    x = jax.random.normal(jax.random.fold_in(RNG, 1), (2, 16, 16, 16))
    ctx = jax.random.normal(jax.random.fold_in(RNG, 2), (2, 10, 64))
    pooled = jax.random.normal(jax.random.fold_in(RNG, 3), (2, 48))
    t = jnp.array([500.0, 500.0])
    return x, t, ctx, pooled


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("ndim", [2, 3])
def test_qdense_default_path_bit_identical_to_dense(dtype, ndim):
    shape = (3, 16) if ndim == 2 else (2, 5, 16)
    x = jax.random.normal(jax.random.fold_in(RNG, 7), shape, jnp.float32)
    ref = nn.Dense(24, dtype=dtype)
    p = ref.init(RNG, x)
    y_ref = ref.apply(p, x)
    y_q = QDense(24, dtype=dtype).apply(p, x)
    assert y_q.dtype == y_ref.dtype
    np.testing.assert_array_equal(np.asarray(y_q), np.asarray(y_ref))


def test_qdense_param_tree_matches_dense():
    x = jnp.ones((2, 8))
    p_ref = nn.Dense(12).init(RNG, x)
    p_q = QDense(12).init(RNG, x)
    assert (jax.tree_util.tree_structure(p_ref)
            == jax.tree_util.tree_structure(p_q))
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_q)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantize_dense_kernel_roundtrip_bound():
    w = jax.random.normal(jax.random.fold_in(RNG, 11), (64, 48)) * 0.3
    wq, sw = quantize_dense_kernel(w)
    assert wq.dtype == jnp.int8 and sw.shape == (48,)
    deq = wq.astype(jnp.float32) * sw[None, :]
    # symmetric rounding: per-element error bounded by half a quant step
    assert float(jnp.max(jnp.abs(deq - w) / sw[None, :])) <= 0.5 + 1e-5


def test_int8_dense_error_envelope():
    x = jax.random.normal(jax.random.fold_in(RNG, 13), (128, 96))
    w = jax.random.normal(jax.random.fold_in(RNG, 14), (96, 64)) / np.sqrt(96)
    b = jax.random.normal(jax.random.fold_in(RNG, 15), (64,)) * 0.1
    wq, sw = quantize_dense_kernel(w)
    y = int8_dense(x, wq, sw, b, dtype=jnp.float32)
    y_ref = x @ w + b
    rel = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 2.5e-2, rel  # probe measured ~1.5e-2 on Gaussian data


def test_int8_dense_preserves_leading_dims_and_dtype():
    x = jax.random.normal(RNG, (2, 7, 32))
    w = jax.random.normal(jax.random.fold_in(RNG, 1), (32, 16))
    wq, sw = quantize_dense_kernel(w)
    y = int8_dense(x, wq, sw, None, dtype=jnp.bfloat16)
    assert y.shape == (2, 7, 16) and y.dtype == jnp.bfloat16


def test_quantize_mmdit_params_targets_and_forward_error():
    m = MMDiT(TINY)
    x, t, ctx, pooled = _tiny_inputs()
    p = m.init(RNG, x, t, ctx, pooled)["params"]
    y0 = m.apply({"params": p}, x, t, ctx, pooled)
    pq, qt = quantize_mmdit_params(p)

    # tree structure unchanged; exactly the block dense kernels are int8
    assert (jax.tree_util.tree_structure(pq)
            == jax.tree_util.tree_structure(p))
    n_int8 = sum(int(l.dtype == jnp.int8)
                 for l in jax.tree_util.tree_leaves(pq))
    # per full block: 6 qkv + 2 out + 4 mlp = 12; context_pre_only last
    # block: 6 qkv + 1 out + 2 mlp = 9
    assert n_int8 == 12 * (TINY.num_layers - 1) + 9
    # embedders / adaLN / head untouched
    assert pq["context_embedder"]["kernel"].dtype == jnp.float32
    assert pq["blocks_0"]["norm1"]["linear"]["kernel"].dtype == jnp.float32
    assert pq["proj_out"]["kernel"].dtype == jnp.float32
    # biases untouched everywhere
    assert pq["blocks_0"]["attn_q"]["bias"].dtype == jnp.float32

    yq = m.apply({"params": pq, "quant": qt}, x, t, ctx, pooled)
    rel = float(jnp.linalg.norm(yq - y0) / jnp.linalg.norm(y0))
    assert rel < 2e-2, rel

    # original tree untouched (the transform copies)
    assert p["blocks_0"]["attn_q"]["kernel"].dtype == jnp.float32


def test_int8_kernel_without_quant_collection_raises():
    m = MMDiT(TINY)
    x, t, ctx, pooled = _tiny_inputs()
    p = m.init(RNG, x, t, ctx, pooled)["params"]
    pq, _ = quantize_mmdit_params(p)
    with pytest.raises(ValueError, match="quant"):
        m.apply({"params": pq}, x, t, ctx, pooled)


def test_quantized_tp_matches_unsharded():
    """int8 + tensor parallelism: column/row-parallel int8 kernels under
    GSPMD (scales replicated — a column-sharded dot output times a
    replicated per-column scale partitions elementwise).

    Tolerance note: sharded-vs-unsharded cannot be bit-equal for a
    quantized model — GSPMD reassociation noise (~1e-7, same as the
    unquantized TP test's tolerance) upstream of a discontinuous
    ``round()`` occasionally flips a quantization bucket, and each flip is
    worth one full quant step (~2e-3 here). A single int8_dense under
    either sharding matches to 5e-7; the whole-model bound is a few quant
    steps max / tiny mean."""
    from jax.sharding import Mesh
    from safe_denoiser_tpu.parallel import shard_params_tp

    m = MMDiT(TINY)
    x, t, ctx, pooled = _tiny_inputs()
    p = m.init(RNG, x, t, ctx, pooled)["params"]
    pq, qt = quantize_mmdit_params(p)
    want = m.apply({"params": pq, "quant": qt}, x, t, ctx, pooled)

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "model"))
    sharded = shard_params_tp({"params": pq, "quant": qt}, mesh)
    kq = sharded["params"]["blocks_0"]["attn_q"]["kernel"]
    assert kq.dtype == jnp.int8 and not kq.sharding.is_fully_replicated
    got = np.asarray(jax.jit(m.apply)(sharded, x, t, ctx, pooled))
    d = np.abs(got - np.asarray(want))
    assert d.max() < 1e-2 and d.mean() < 1e-4, (d.max(), d.mean())
    # and the sharded quantized forward stays inside the quantization
    # error envelope of the f32 reference
    y0 = np.asarray(m.apply({"params": p}, x, t, ctx, pooled))
    rel = np.linalg.norm(got - y0) / np.linalg.norm(y0)
    assert rel < 2e-2, rel


def test_quantized_sample_sd3_scan():
    """The int8 path jits inside the full flow-matching scan and tracks the
    bf16/f32 trajectory (quantize happens once, outside the scan)."""
    from safe_denoiser_tpu.pipeline.sampler import sample_sd3
    from safe_denoiser_tpu.schedulers import FlowMatchEulerScheduler

    m = MMDiT(TINY)
    x, t, ctx, pooled = _tiny_inputs()
    p = m.init(RNG, x, t, ctx, pooled)["params"]
    pq, qt = quantize_mmdit_params(p)
    sched = FlowMatchEulerScheduler()
    lat = jax.random.normal(jax.random.fold_in(RNG, 21), (1, 16, 16, 16))
    text = jnp.stack([ctx[:1], ctx[1:]])
    pool = jnp.stack([pooled[:1], pooled[1:]])

    def run(variables):
        out, _ = sample_sd3(
            lambda l, tt, c, pl: m.apply(variables, l, tt, c, pl),
            sched, text, pool, lat, jax.random.fold_in(RNG, 22), 4,
            guidance_scale=2.5)
        return out

    y0 = jax.jit(run)({"params": p})
    yq = jax.jit(run)({"params": pq, "quant": qt})
    assert bool(jnp.all(jnp.isfinite(yq)))
    rel = float(jnp.linalg.norm(yq - y0) / jnp.linalg.norm(y0))
    assert rel < 5e-2, rel


# ---------------------------------------------------------------------------
# SD-v1 UNet (quantize_unet_params): selective-by-shape wide-block transform


def _tiny_unet():
    from safe_denoiser_tpu.models import UNet2DCondition, UNetConfig

    cfg = UNetConfig(sample_size=8, block_out_channels=(32, 64),
                     layers_per_block=1, cross_attention_dim=16,
                     num_attention_heads=4, norm_num_groups=8)
    m = UNet2DCondition(cfg)
    x = jax.random.normal(jax.random.fold_in(RNG, 31), (2, 8, 8, 4))
    t = jnp.array([500.0, 2.0])
    ctx = jax.random.normal(jax.random.fold_in(RNG, 32), (2, 7, 16))
    p = m.init(jax.random.fold_in(RNG, 33), x, t, ctx)["params"]
    return m, p, x, t, ctx


def test_quantize_unet_params_targets_and_forward_error():
    m, p, x, t, ctx = _tiny_unet()
    y0 = m.apply({"params": p}, x, t, ctx)
    # min_dim low enough that every transformer-block dense qualifies
    pq, qt = quantize_unet_params(p, min_dim=16)

    assert (jax.tree_util.tree_structure(pq)
            == jax.tree_util.tree_structure(p))
    blk = pq["down_0_attentions_0"]["blocks_0"]
    # attention projections + ff (GEGLU proj, net_2) are int8
    for mod in ("attn1", "attn2"):
        for d in ("to_q", "to_k", "to_v", "to_out"):
            assert blk[mod][d]["kernel"].dtype == jnp.int8, (mod, d)
    assert blk["ff"]["net_0"]["proj"]["kernel"].dtype == jnp.int8
    assert blk["ff"]["net_2"]["kernel"].dtype == jnp.int8
    assert pq["mid_attentions_0"]["blocks_0"]["attn1"]["to_q"][
        "kernel"].dtype == jnp.int8
    # everything outside the transformer blocks stays f32: convs, resnets,
    # time embedding, proj_in/out, norms, and all biases
    assert pq["conv_in"]["kernel"].dtype == jnp.float32
    assert pq["time_emb_1"]["kernel"].dtype == jnp.float32
    assert pq["down_0_resnets_0"]["conv1"]["kernel"].dtype == jnp.float32
    assert pq["down_0_attentions_0"]["proj_in"]["kernel"].dtype == jnp.float32
    assert blk["attn1"]["to_out"]["bias"].dtype == jnp.float32
    # original tree untouched
    assert p["down_0_attentions_0"]["blocks_0"]["attn1"]["to_q"][
        "kernel"].dtype == jnp.float32

    yq = m.apply({"params": pq, "quant": qt}, x, t, ctx)
    rel = float(jnp.linalg.norm(yq - y0) / jnp.linalg.norm(y0))
    assert rel < 5e-2, rel


def test_quantize_unet_params_min_dim_gate():
    """The shape gate is the point of the UNet transform: narrow kernels
    (where int8 measured a LOSS on v5e) must stay f32."""
    m, p, x, t, ctx = _tiny_unet()
    # min_dim=33 excludes the 32-ch level-0 blocks and every [16, *]
    # cross-attention k/v, keeps the 64-ch mid block
    pq, qt = quantize_unet_params(p, min_dim=33)
    l0 = pq["down_0_attentions_0"]["blocks_0"]
    assert l0["attn1"]["to_q"]["kernel"].dtype == jnp.float32
    assert l0["ff"]["net_2"]["kernel"].dtype == jnp.float32
    mid = pq["mid_attentions_0"]["blocks_0"]
    assert mid["attn1"]["to_q"]["kernel"].dtype == jnp.int8
    # cross k/v contract from cross_attention_dim=16 — excluded by shape
    assert mid["attn2"]["to_k"]["kernel"].dtype == jnp.float32
    assert mid["attn2"]["to_q"]["kernel"].dtype == jnp.int8
    # the partially-quantized tree still runs
    y = m.apply({"params": pq, "quant": qt}, x, t, ctx)
    assert bool(jnp.all(jnp.isfinite(y)))
    # a gate excluding everything raises (mirrors the MMDiT contract)
    with pytest.raises(ValueError, match="no .* kernels"):
        quantize_unet_params(p, min_dim=4096)


def test_quantize_unet_params_rejects_requantize():
    _, p, *_ = _tiny_unet()
    pq, _ = quantize_unet_params(p, min_dim=16)
    with pytest.raises(ValueError, match="already int8"):
        quantize_unet_params(pq, min_dim=16)


def test_quantized_unet_fused_qkv_raises(monkeypatch):
    """SDT_FUSED_QKV=1 has no dequant path for the fused concat — it must
    fail loudly on int8 kernels, not silently produce garbage."""
    m, p, x, t, ctx = _tiny_unet()
    pq, qt = quantize_unet_params(p, min_dim=16)
    monkeypatch.setenv("SDT_FUSED_QKV", "1")
    with pytest.raises(ValueError, match="SDT_FUSED_QKV"):
        m.apply({"params": pq, "quant": qt}, x, t, ctx)


def test_quantized_unet_tp_matches_unsharded():
    """int8 x tensor parallelism for the UNet rules (same GSPMD bucket-flip
    tolerance rationale as the MMDiT test above)."""
    from jax.sharding import Mesh
    from safe_denoiser_tpu.parallel import UNET_TP_RULES, shard_params_tp

    m, p, x, t, ctx = _tiny_unet()
    pq, qt = quantize_unet_params(p, min_dim=16)
    want = m.apply({"params": pq, "quant": qt}, x, t, ctx)

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "model"))
    sharded = shard_params_tp({"params": pq, "quant": qt}, mesh,
                              rules=UNET_TP_RULES)
    kq = sharded["params"]["down_0_attentions_0"]["blocks_0"]["attn1"][
        "to_q"]["kernel"]
    assert kq.dtype == jnp.int8 and not kq.sharding.is_fully_replicated
    got = np.asarray(jax.jit(m.apply)(sharded, x, t, ctx))
    d = np.abs(got - np.asarray(want))
    # a few bucket flips, each worth ~one quant step (~2e-2 at these
    # activation magnitudes; measured max 1.7e-2 / mean 1.8e-3)
    assert d.max() < 5e-2 and d.mean() < 5e-3, (d.max(), d.mean())
    # and the sharded quantized forward stays inside the quantization error
    # envelope of the f32 reference
    y0 = np.asarray(m.apply({"params": p}, x, t, ctx))
    rel = np.linalg.norm(got - y0) / np.linalg.norm(y0)
    assert rel < 5e-2, rel
