"""Golden tests for the custom self-attention Pallas kernel (ops/attention.py)
against the einsum/XLA reference math, run in interpreter mode on the CPU
test mesh. The real SD-1.4 head_dims (40/80/160) are covered at reduced seq
(the kernel is seq-size-agnostic past the 512 block multiple).

Replaces-the-math-of: reference models/unet_2d_blocks.py Transformer2D
attention (torch scaled_dot_product_attention at head_dim 40/80/160).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_denoiser_tpu.ops.attention import (_self_attention_bhsd,
                                             self_attention, supports)


def einsum_ref(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v.astype(jnp.float32))


@pytest.mark.parametrize("layout", ["nt", "bhsd", "nt_repack"])
@pytest.mark.parametrize("shape", [
    (1, 512, 2, 40),    # SD-1.4 level-1 head_dim
    (2, 1024, 2, 80),   # level-2
    (1, 512, 1, 160),   # level-3/mid
    (1, 512, 1, 128),   # generic full-lane head
])
def test_matches_einsum_f32(shape, layout, monkeypatch):
    if layout == "nt_repack":
        monkeypatch.setenv("SDT_FLASH2_LAYOUT", "nt")
        monkeypatch.setenv("SDT_ATTN_REPACK", "1")
    else:
        monkeypatch.setenv("SDT_FLASH2_LAYOUT", layout)
    b, s, h, d = shape
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, shape, jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), shape, jnp.float32)
    v = jax.random.normal(jax.random.fold_in(rng, 2), shape, jnp.float32)
    scale = d ** -0.5
    ref = einsum_ref(q, k, v, scale)
    got = self_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_matches_einsum_large_logits():
    """Online-softmax max tracking: logits far from zero must not overflow."""
    b, s, h, d = 1, 512, 1, 40
    rng = jax.random.PRNGKey(3)
    q = 8.0 * jax.random.normal(rng, (b, s, h, d), jnp.float32)
    k = 8.0 * jax.random.normal(jax.random.fold_in(rng, 1), (b, s, h, d))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, s, h, d))
    scale = d ** -0.5
    ref = einsum_ref(q, k, v, scale)
    got = self_attention(q, k, v, scale, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_bf16_inputs_accumulate_fp32():
    b, s, h, d = 1, 512, 2, 40
    rng = jax.random.PRNGKey(7)
    q = jax.random.normal(rng, (b, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, s, h, d))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, s, h, d))
    scale = d ** -0.5
    ref = einsum_ref(q, k, v, scale)
    got = self_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                         v.astype(jnp.bfloat16), scale, interpret=True)
    assert got.dtype == jnp.bfloat16
    # bf16 feed tolerance: inputs carry ~3e-3 relative quantization
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=2.5e-2, rtol=2.5e-2)


def test_supports_predicate():
    assert supports(4096, 4096, 40)
    assert supports(1024, 1024, 80)
    assert supports(512, 512, 160)
    assert not supports(4096, 77, 40)     # cross-attention
    assert not supports(256, 256, 160)    # below block size
    assert supports(640, 640, 40)         # non-multiple: padded + tail-masked
    assert supports(4429, 4429, 64)       # SD3 joint sequence
    assert supports(4096, 4096, 512)      # VAE mid-block single wide head
    assert not supports(640, 640, 512)    # wide head needs the 512 grid
    assert not supports(512, 512, 300)    # wide head must be full-lane


def test_block_shapes_partition():
    """bhsd entry point: output equals per-block einsum regardless of the
    q-block partition (checks the grid index maps)."""
    bh, s, d = 3, 1024, 40
    rng = jax.random.PRNGKey(11)
    q = jax.random.normal(rng, (bh, s, d), jnp.float32)
    kt = jax.random.normal(jax.random.fold_in(rng, 1), (bh, d, s))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (bh, s, d))
    scale = d ** -0.5
    logits = jnp.einsum("bqd,bdk->bqk", q * scale, kt)
    ref = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(logits, -1), v)
    got = _self_attention_bhsd(q, kt, v, sm_scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_wide_head_routes_to_bshd_and_matches_einsum():
    """The VAE mid-block shape (H=1, D=512) must route to the bshd kernel
    regardless of SDT_FLASH2_LAYOUT and match the einsum reference."""
    rng = jax.random.PRNGKey(21)
    b, s, h, d = 2, 512, 1, 512
    q = jax.random.normal(rng, (b, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, s, h, d))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, s, h, d))
    scale = d ** -0.5
    ref = einsum_ref(q, k, v, scale)
    got = self_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_wide_head_inner_chunk_loop_matches_einsum():
    """S=1024 wide head exercises the in-kernel 512-chunk loop
    (block_k=1024, block_k_inner=512 -> n_inner=2) added for the VAE
    mid-block; must still match einsum."""
    rng = jax.random.PRNGKey(23)
    b, s, h, d = 1, 1024, 1, 512
    q = jax.random.normal(rng, (b, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, s, h, d))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, s, h, d))
    scale = d ** -0.5
    ref = einsum_ref(q, k, v, scale)
    got = self_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_repack_kernels_roundtrip():
    """repack_to_heads/repack_from_heads == the XLA transposes, bit-exact."""
    from safe_denoiser_tpu.ops.attention import (repack_from_heads,
                                                 repack_to_heads)

    rng = np.random.RandomState(5)
    b, s, h, d = 2, 1024, 8, 40
    x = jnp.asarray(rng.randn(b, s, h * d).astype(np.float32))
    want = jnp.transpose(x.reshape(b, s, h, d), (0, 2, 1, 3))
    got = repack_to_heads(x, h, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    back = repack_from_heads(got, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("layout", ["nt", "bhsd", "nt_repack"])
def test_flash2_padded_non_multiple_seq_matches_einsum(layout, monkeypatch):
    """SD3's joint sequence (img 4096 + text 333) is not a 512 multiple; the
    kernel zero-pads and -inf-masks the tail keys. Golden vs einsum at a
    shrunken analogue (600 = 512 + 88)."""
    if layout == "nt_repack":
        monkeypatch.setenv("SDT_FLASH2_LAYOUT", "nt")
        monkeypatch.setenv("SDT_ATTN_REPACK", "1")
    else:
        monkeypatch.setenv("SDT_FLASH2_LAYOUT", layout)
    rng = np.random.RandomState(3)
    b, s, h, d = 2, 600, 3, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    sm = float(d) ** -0.5

    want = einsum_ref(q, k, v, sm)
    got = self_attention(q, k, v, sm, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
    assert supports(s, s, d)


@pytest.mark.skipif(__import__("os").environ.get("SDT_TPU_TESTS") != "1"
                    or jax.default_backend() != "tpu",
                    reason="real-TPU padded-path check (SDT_TPU_TESTS=1)")
def test_flash2_padded_on_target_matches_einsum():
    """The real Mosaic compile of the tail-masked padded path at the actual
    SD3 joint-sequence length vs the einsum reference."""
    rng = np.random.RandomState(5)
    b, s, h, d = 1, 4429, 4, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    sm = float(d) ** -0.5
    want = einsum_ref(q, k, v, sm)
    got = self_attention(q, k, v, sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-3, rtol=3e-3)


def test_int8_qk_close_to_f32():
    """quant_i8 (SDT_INT8_ATTN surface): the int8 QK^T path must track the
    exact kernel within ~1% relative — Q per-row / K per-token dynamic
    scales, PV and softmax stats untouched (ops/attention.py _attn_kernel)."""
    rs = np.random.RandomState(3)
    bh, s, d = 4, 1024, 40
    q = jnp.asarray(rs.randn(bh, s, d), jnp.float32)
    kt = jnp.asarray(rs.randn(bh, d, s), jnp.float32)
    v = jnp.asarray(rs.randn(bh, s, d), jnp.float32)
    sm = float(d) ** -0.5
    ref = _self_attention_bhsd(q, kt, v, sm, interpret=True)
    got = _self_attention_bhsd(q, kt, v, sm, quant_i8=True, interpret=True)
    rel = float(jnp.linalg.norm(ref - got) / jnp.linalg.norm(ref))
    assert rel < 0.015, rel
    # tail-masked variant (SD3's non-512-multiple joint sequence)
    refm = _self_attention_bhsd(q, kt, v, sm, valid_kv=s - 100,
                                interpret=True)
    gotm = _self_attention_bhsd(q, kt, v, sm, valid_kv=s - 100,
                                quant_i8=True, interpret=True)
    relm = float(jnp.linalg.norm(refm - gotm) / jnp.linalg.norm(refm))
    assert relm < 0.015, relm


def test_int8_attn_env_dispatch(monkeypatch):
    """SDT_INT8_ATTN=1 must route bf16 bhsd attention through the int8 QK
    path (and leave f32 inputs on the exact path)."""
    monkeypatch.setenv("SDT_FLASH2_LAYOUT", "bhsd")
    monkeypatch.setenv("SDT_INT8_ATTN", "1")
    rs = np.random.RandomState(5)
    b, s, h, d = 1, 512, 2, 40
    q = jnp.asarray(rs.randn(b, s, h, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(b, s, h, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(b, s, h, d), jnp.bfloat16)
    sm = float(d) ** -0.5
    got = self_attention(q, k, v, sm, interpret=True)
    want = einsum_ref(q, k, v, sm)
    # int8 QK: looser than the bf16 path's 3e-3, still tight
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), atol=0.05, rtol=0.05)
    # f32 inputs bypass the int8 path entirely (parity harnesses rely on it)
    got32 = self_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                           v.astype(jnp.float32), sm, interpret=True)
    np.testing.assert_allclose(np.asarray(got32), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
