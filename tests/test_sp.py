"""Sequence-parallel (context-parallel) MMDiT on the virtual 8-device mesh.

parallel/sp.py shards the image-token S dim over a 'seq' mesh axis; joint
attention all-gathers K/V inside a shard_map while context tokens stay
replicated. Everything must reproduce the unsharded forward bit-for-bit up
to partitioned-reduction reassociation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from safe_denoiser_tpu.models import MMDiT, MMDiTConfig
from safe_denoiser_tpu.parallel.sp import constrain_seq, sp_joint_attention

TINY = MMDiTConfig(sample_size=8, num_layers=2, num_heads=4, head_dim=8,
                   joint_attention_dim=48, caption_projection_dim=32,
                   pooled_projection_dim=40, pos_embed_max_size=16)


def _mesh_2x4():
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devices, ("data", "seq"))


def test_sp_joint_attention_matches_concat():
    """The shard_map'd joint attention == attention over concat([img, ctx])
    for both the S-sharded image rows and the replicated context rows."""
    from safe_denoiser_tpu.models.layers import dot_product_attention

    mesh = _mesh_2x4()
    rng = jax.random.PRNGKey(0)
    b, s_img, s_ctx, h, d = 2, 16, 5, 4, 8
    ks = jax.random.split(rng, 6)
    xq, xk, xv = (jax.random.normal(k, (b, s_img, h, d)) for k in ks[:3])
    cq, ck, cv = (jax.random.normal(k, (b, s_ctx, h, d)) for k in ks[3:])

    q = jnp.concatenate([xq, cq], axis=1)
    k = jnp.concatenate([xk, ck], axis=1)
    v = jnp.concatenate([xv, cv], axis=1)
    want = dot_product_attention(q, k, v)

    got_img, got_ctx = jax.jit(
        lambda *a: sp_joint_attention(*a, mesh=mesh))(xq, xk, xv, cq, ck, cv)
    np.testing.assert_allclose(np.asarray(got_img),
                               np.asarray(want[:, :s_img]),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_ctx),
                               np.asarray(want[:, s_img:]),
                               atol=1e-6, rtol=1e-6)


def test_mmdit_sp_matches_unsharded():
    """Full MMDiT forward with sp_mesh == the plain forward (the S=16 image
    sequence shards 4 rows/device over the seq axis)."""
    mesh = _mesh_2x4()

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    t = jnp.array([500.0, 500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 48))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (2, 40))

    model = MMDiT(TINY)
    params = model.init(jax.random.PRNGKey(3), x, t, ctx, pooled)
    want = model.apply(params, x, t, ctx, pooled)

    sp_model = MMDiT(TINY, sp_mesh=mesh)
    # param trees are identical — SP shards activations, not weights
    got = jax.jit(sp_model.apply)(params, x, t, ctx, pooled)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_mmdit_sp_full_scan_matches_unsharded():
    """SP through the whole SD3 sampling scan: shard_map per block under
    lax.scan + repellency + flow scheduler."""
    from safe_denoiser_tpu.pipeline import RepellencyWindow
    from safe_denoiser_tpu.pipeline.sampler import sample_sd3
    from safe_denoiser_tpu.repellency import RepellencyConfig
    from safe_denoiser_tpu.schedulers import FlowMatchEulerScheduler

    mesh = _mesh_2x4()
    rng = jax.random.PRNGKey(0)
    b = 2
    latents = jax.random.normal(rng, (b, 8, 8, 16), dtype=jnp.float32)
    text = jax.random.normal(jax.random.fold_in(rng, 1), (2, b, 12, 48))
    pooled = jax.random.normal(jax.random.fold_in(rng, 2), (2, b, 40))
    refs = jax.random.normal(jax.random.fold_in(rng, 3), (5, 16, 8, 8))
    model = MMDiT(TINY)
    params = model.init(jax.random.fold_in(rng, 4), latents[:1],
                        jnp.asarray(1.0), text[0, :1], pooled[0, :1])
    sched = FlowMatchEulerScheduler()
    rep = RepellencyConfig(method="kernel_fast", sigma=100.0, scale=0.03,
                           use_beta_gate=False, normalize_x=True)

    def run(model, lat, txt, pool, rfs):
        def tf_apply(l, t, c, p):
            return model.apply(params, l, t, c, p)
        return sample_sd3(tf_apply, sched, txt, pool, lat,
                          jax.random.PRNGKey(5), 3, guidance_scale=2.5,
                          repellency=rep, refs_nchw=rfs,
                          window=RepellencyWindow(1000.0, 0.0))

    want, want_applied = jax.jit(
        lambda *a: run(model, *a))(latents, text, pooled, refs)
    sp_model = MMDiT(TINY, sp_mesh=mesh)
    got, got_applied = jax.jit(
        lambda *a: run(sp_model, *a))(latents, text, pooled, refs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got_applied),
                                  np.asarray(want_applied))


def test_constrain_seq_places_shards():
    mesh = _mesh_2x4()
    x = jnp.zeros((2, 16, 8))
    got = jax.jit(lambda x: constrain_seq(x, mesh))(x)
    assert got.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data", "seq", None)), ndim=3)
