"""Pipeline-parallel MMDiT (GPipe over a 'pipe' mesh axis) on the virtual
8-device mesh.

parallel/pp.py stacks the homogeneous blocks 0..L-2 into [Lpad, ...] leaves
sharded over 'pipe' and streams microbatches through the stages with
lax.ppermute. Everything must reproduce the sequential forward exactly —
bubble-step compute is masked by the inject/emit selects and the zero-padded
blocks are exact identities (AdaLN-zero gates)."""

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, PartitionSpec as P
from safe_denoiser_tpu.models import MMDiT, MMDiTConfig
from safe_denoiser_tpu.models.mmdit import JointBlock
from safe_denoiser_tpu.parallel import (pp_blocks, shard_stacked_pp,
                                        stack_block_params)

# 4 homogeneous blocks + 1 context_pre_only: one block per pipe stage
TINY5 = MMDiTConfig(sample_size=8, num_layers=5, num_heads=4, head_dim=8,
                    joint_attention_dim=48, caption_projection_dim=32,
                    pooled_projection_dim=40, pos_embed_max_size=16)
# 3 homogeneous blocks: stack pads to 4 with one zero (identity) block
TINY4 = MMDiTConfig(sample_size=8, num_layers=4, num_heads=4, head_dim=8,
                    joint_attention_dim=48, caption_projection_dim=32,
                    pooled_projection_dim=40, pos_embed_max_size=16)


def _mesh_2x4():
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devices, ("data", "pipe"))


def _inputs(b=4):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, 8, 8, 16))
    t = jnp.full((b,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 12, 48))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (b, 40))
    return x, t, ctx, pooled


def test_zero_joint_block_is_identity():
    """The padding trick's load-bearing fact: a zero-param JointBlock is an
    exact identity on both streams (every residual is AdaLN-zero gated)."""
    cfg = TINY5
    dim = cfg.num_heads * cfg.head_dim
    block = JointBlock(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, dim))
    c = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, dim))
    e = jax.random.normal(jax.random.fold_in(rng, 2), (2, dim))
    params = jax.tree.map(jnp.zeros_like,
                          block.init(rng, x, c, e))
    xo, co = block.apply(params, x, c, e)
    np.testing.assert_array_equal(np.asarray(xo), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(co), np.asarray(c))


def test_pp_blocks_matches_sequential():
    """pp_blocks over 4 stages == applying the homogeneous blocks in order,
    both with an even split (TINY5) and with zero-block padding (TINY4)."""
    mesh = _mesh_2x4()
    rng = jax.random.PRNGKey(3)
    for cfg in (TINY5, TINY4):
        dim = cfg.num_heads * cfg.head_dim
        model = MMDiT(cfg)
        x, t, ctx, pooled = _inputs()
        variables = model.init(rng, x, t, ctx, pooled)

        xs = jax.random.normal(rng, (4, 16, dim))
        cs = jax.random.normal(jax.random.fold_in(rng, 1), (4, 5, dim))
        es = jax.random.normal(jax.random.fold_in(rng, 2), (4, dim))

        block = JointBlock(cfg)
        want_x, want_c = xs, cs
        for i in range(cfg.num_layers - 1):
            want_x, want_c = block.apply(
                {"params": variables["params"][f"blocks_{i}"]},
                want_x, want_c, es)

        stacked = stack_block_params(variables, cfg.num_layers, 4)
        assert jax.tree.leaves(stacked)[0].shape[0] % 4 == 0
        got_x, got_c = jax.jit(lambda s, a, b, c: pp_blocks(
            cfg, s, a, b, c, mesh, n_micro=2, pipe_axis="pipe",
            data_axis="data"))(stacked, xs, cs, es)
        np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                                   atol=1e-5, rtol=1e-5)


def test_mmdit_pp_matches_unsharded():
    """Full MMDiT forward with pp_mesh + stacked params == plain forward;
    param tree is the STANDARD one (converters untouched)."""
    mesh = _mesh_2x4()
    x, t, ctx, pooled = _inputs()
    model = MMDiT(TINY5)
    variables = model.init(jax.random.PRNGKey(4), x, t, ctx, pooled)
    want = model.apply(variables, x, t, ctx, pooled)

    pp_model = MMDiT(TINY5, pp_mesh=mesh)
    stacked = shard_stacked_pp(
        stack_block_params(variables, TINY5.num_layers, 4), mesh)
    got = jax.jit(lambda v, s, *a: pp_model.apply(v, *a, pp_params=s))(
        variables, stacked, x, t, ctx, pooled)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_mmdit_pp_full_scan_matches_unsharded():
    """PP through the whole SD3 sampling scan: shard_map pipeline under
    lax.scan + repellency + flow scheduler."""
    from safe_denoiser_tpu.pipeline import RepellencyWindow
    from safe_denoiser_tpu.pipeline.sampler import sample_sd3
    from safe_denoiser_tpu.repellency import RepellencyConfig
    from safe_denoiser_tpu.schedulers import FlowMatchEulerScheduler

    mesh = _mesh_2x4()
    rng = jax.random.PRNGKey(0)
    b = 2  # CFG folds to batch 4 inside the scan = 2 microbatches of 2
    latents = jax.random.normal(rng, (b, 8, 8, 16), dtype=jnp.float32)
    text = jax.random.normal(jax.random.fold_in(rng, 1), (2, b, 12, 48))
    pooled = jax.random.normal(jax.random.fold_in(rng, 2), (2, b, 40))
    refs = jax.random.normal(jax.random.fold_in(rng, 3), (5, 16, 8, 8))
    model = MMDiT(TINY5)
    variables = model.init(jax.random.fold_in(rng, 4), latents[:1],
                           jnp.asarray(1.0), text[0, :1], pooled[0, :1])
    sched = FlowMatchEulerScheduler()
    rep = RepellencyConfig(method="kernel_fast", sigma=100.0, scale=0.03,
                           use_beta_gate=False, normalize_x=True)

    def run(apply_fn, lat, txt, pool, rfs):
        return sample_sd3(apply_fn, sched, txt, pool, lat,
                          jax.random.PRNGKey(5), 3, guidance_scale=2.5,
                          repellency=rep, refs_nchw=rfs,
                          window=RepellencyWindow(1000.0, 0.0))

    def plain_apply(l, t, c, p):
        return model.apply(variables, l, t, c, p)

    want, want_applied = jax.jit(
        lambda *a: run(plain_apply, *a))(latents, text, pooled, refs)

    pp_model = MMDiT(TINY5, pp_mesh=mesh)
    stacked = shard_stacked_pp(
        stack_block_params(variables, TINY5.num_layers, 4), mesh)

    def pp_apply(l, t, c, p):
        return pp_model.apply(variables, l, t, c, p, pp_params=stacked)

    got, got_applied = jax.jit(
        lambda *a: run(pp_apply, *a))(latents, text, pooled, refs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got_applied),
                                  np.asarray(want_applied))
