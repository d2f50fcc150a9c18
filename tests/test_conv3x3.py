"""Pallas halo-DMA 3x3 conv (ops/conv3x3.py): interpreter-mode correctness
vs lax.conv on CPU, the supports() routing contract, and the Conv3x3 flax
module's param-tree compatibility with nn.Conv (checkpoint converters must
see no difference)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax import lax

from safe_denoiser_tpu.ops.conv3x3 import conv3x3, supports


def _ref(x, w, b):
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                   dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)
    return (out + b.astype(jnp.float32)).astype(x.dtype)


@pytest.mark.parametrize("shape,co", [
    ((2, 16, 16, 128), 128),    # tile_h 16
    ((1, 32, 16, 256), 128),    # Ci != Co
    ((2, 8, 24, 128), 256),     # W+2 not a sublane multiple (Wp padding)
    ((1, 16, 8, 128), 128),     # narrow W
])
def test_interpret_matches_lax_conv(shape, co):
    rng = np.random.RandomState(0)
    ci = shape[-1]
    x = jnp.asarray(rng.randn(*shape), jnp.float32).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, ci, co) * 0.05,
                    jnp.float32).astype(jnp.bfloat16)
    b = jnp.asarray(rng.randn(co) * 0.1, jnp.float32).astype(jnp.bfloat16)
    assert supports(x.shape, ci, co)
    got = np.asarray(conv3x3(x, w, b, interpret=True), np.float32)
    want = np.asarray(_ref(x, w, b), np.float32)
    np.testing.assert_allclose(got, want, atol=0.13, rtol=0.05)
    # borders exercise the halo path: check the frame exactly (same bf16
    # tolerance, but isolated so an off-by-one halo cannot hide in the bulk)
    np.testing.assert_allclose(got[:, 0], want[:, 0], atol=0.13, rtol=0.05)
    np.testing.assert_allclose(got[:, -1], want[:, -1], atol=0.13, rtol=0.05)
    np.testing.assert_allclose(got[:, :, 0], want[:, :, 0],
                               atol=0.13, rtol=0.05)
    np.testing.assert_allclose(got[:, :, -1], want[:, :, -1],
                               atol=0.13, rtol=0.05)


def test_no_bias_and_f32_fallback():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 16, 128), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 128, 128) * 0.05, jnp.float32)
    got = np.asarray(conv3x3(x, w, None, interpret=True))
    want = np.asarray(_ref(x, w, jnp.zeros((128,), jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_supports_contract():
    # channel counts must be lane-aligned; odd channels fall back
    assert not supports((1, 16, 16, 320), 320, 320)   # UNet channels: no
    assert not supports((1, 16, 16, 64), 64, 128)
    assert supports((4, 128, 128, 512), 512, 512)     # VAE decoder shapes
    assert supports((4, 512, 512, 128), 128, 128)
    assert supports((1, 17, 16, 128), 128, 128)       # odd H: tile_h=1


def test_unsupported_shape_falls_back():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 64), jnp.float32).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.1,
                    jnp.float32).astype(jnp.bfloat16)
    b = jnp.zeros((64,), jnp.bfloat16)
    got = np.asarray(conv3x3(x, w, b), np.float32)  # lax path, no interpret
    want = np.asarray(_ref(x, w, b), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_conv3x3_module_param_tree_matches_nn_conv():
    """Swapping nn.Conv for Conv3x3 in the VAE must not change the param
    tree (names, shapes, dtypes) or the f32 forward."""
    from flax import linen as nn

    from safe_denoiser_tpu.models.vae import Conv3x3

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 8, 8, 128))
    mod_new = Conv3x3(128, name="conv1")
    mod_old = nn.Conv(128, (3, 3), padding=1, name="conv1")
    p_new = mod_new.init(rng, x)
    p_old = mod_old.init(rng, x)
    assert jax.tree_util.tree_structure(p_new) == \
        jax.tree_util.tree_structure(p_old)
    for a, b in zip(jax.tree_util.tree_leaves(p_new),
                    jax.tree_util.tree_leaves(p_old)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # identical init (same initializers/seed) -> identical f32 forward
    np.testing.assert_allclose(np.asarray(mod_new.apply(p_new, x)),
                               np.asarray(mod_old.apply(p_old, x)),
                               atol=1e-5, rtol=1e-5)
