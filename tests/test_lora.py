"""LoRA adapter overlay (training/lora.py): parameter-efficient erasure.

Verifies the functional-overlay contract: zero-init B => merged tree is
bit-identical to the base; only targeted 2-D kernels change; the fused
LoRA-ESD step trains the adapter alone (base untouched, loss decreases);
adapters round-trip through both file formats; the merged export matches
the in-memory merge; and the step runs unchanged under the (data, model)
mesh (GSPMD shards the base, replicates the adapter).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from safe_denoiser_tpu.models import UNet2DCondition, UNetConfig
from safe_denoiser_tpu.training import (ESDConfig, apply_lora,
                                        init_lora_params, load_lora,
                                        lora_scale, lora_target_paths,
                                        make_lora_esd_train_step,
                                        make_lora_train_step, make_optimizer,
                                        save_lora)

TINY = UNetConfig(sample_size=8, block_out_channels=(16, 32),
                  layers_per_block=1, cross_attention_dim=16,
                  num_attention_heads=4, norm_num_groups=8)


def _tiny_setup(b=2, rng=0):
    model = UNet2DCondition(TINY)
    key = jax.random.PRNGKey(rng)
    x = jax.random.normal(key, (b, 8, 8, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (b, 7, 16))
    params = model.init(key, x[:1], jnp.asarray(1), ctx[:1])
    return model, params, x, ctx


def _leaf_paths(tree):
    out = {}

    def visit(path, leaf):
        out["/".join(str(getattr(k, "key", k)) for k in path)] = leaf
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    return out


def test_target_paths_xattn_only_crossattn_kernels():
    _, params, _, _ = _tiny_setup()
    paths = lora_target_paths(params, "xattn")
    assert paths and all("attn2" in p for p in paths)
    assert all(p.endswith("/kernel") for p in paths)
    # q/k/v/out per cross-attn block, and no biases swept in
    assert any(p.endswith("to_q/kernel") for p in paths)
    leaves = _leaf_paths(params)
    assert all(leaves[p].ndim == 2 for p in paths)


def test_target_paths_noxattn_mirrors_esd_mask():
    _, params, _, _ = _tiny_setup()
    paths = lora_target_paths(params, "noxattn")
    assert paths
    assert all("attn2" not in p for p in paths)
    # top-level time embedding frozen, per-resnet time_emb_proj trainable
    assert not any("time_emb_1" in p or "time_emb_2" in p for p in paths)
    assert any("time_emb_proj" in p for p in paths)


def test_unknown_named_target_is_substring_and_empty_raises():
    _, params, _, _ = _tiny_setup()
    paths = lora_target_paths(params, "to_q")
    assert paths and all("to_q" in p for p in paths)
    with pytest.raises(ValueError, match="matched no"):
        lora_target_paths(params, "no_such_module_anywhere")


def test_zero_init_merge_is_bit_identical():
    model, params, x, ctx = _tiny_setup()
    lora = init_lora_params(params, jax.random.PRNGKey(1), rank=4,
                            targets="xattn")
    assert all(float(jnp.abs(ab["b"]).max()) == 0.0 for ab in lora.values())
    merged = apply_lora(params, lora, scale=1.0)
    for (pa, la), (pb, lb) in zip(_leaf_paths(params).items(),
                                  _leaf_paths(merged).items()):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_merge_touches_only_targets():
    _, params, _, _ = _tiny_setup()
    lora = init_lora_params(params, jax.random.PRNGKey(1), rank=2,
                            targets="xattn")
    # make the delta nonzero
    lora = jax.tree_util.tree_map(lambda v: v + 0.1, lora)
    merged = apply_lora(params, lora, scale=1.0)
    base, after = _leaf_paths(params), _leaf_paths(merged)
    for p in base:
        if p in lora:
            assert float(jnp.abs(after[p] - base[p]).max()) > 0
        else:
            np.testing.assert_array_equal(np.asarray(after[p]),
                                          np.asarray(base[p]))


def test_scale_is_linear_in_delta():
    _, params, _, _ = _tiny_setup()
    lora = init_lora_params(params, jax.random.PRNGKey(1), rank=2,
                            targets="xattn")
    lora = jax.tree_util.tree_map(lambda v: v + 0.05, lora)
    m1 = _leaf_paths(apply_lora(params, lora, scale=1.0))
    m2 = _leaf_paths(apply_lora(params, lora, scale=2.0))
    base = _leaf_paths(params)
    p = next(iter(lora))
    np.testing.assert_allclose(np.asarray(m2[p] - base[p]),
                               2.0 * np.asarray(m1[p] - base[p]),
                               rtol=1e-5, atol=1e-7)
    assert lora_scale(8) == 1.0 and lora_scale(8, 16.0) == 2.0


def test_lora_esd_step_trains_adapter_only_and_reduces_loss():
    model, params, x_t, ctx_c = _tiny_setup(b=2)
    ctx_u = jnp.zeros_like(ctx_c)
    t = jnp.asarray([100, 500])

    def apply_fn(p, x, t_, c):
        return model.apply(p, x, t_, c)

    cfg = ESDConfig(learning_rate=1e-3, negative_guidance=1.0)
    lora = init_lora_params(params, jax.random.PRNGKey(2), rank=4,
                            targets="xattn")
    step = make_lora_esd_train_step(apply_fn, cfg, scale=1.0, donate=False)
    opt_state = make_optimizer(cfg).init(lora)

    base_before = jax.tree_util.tree_map(np.asarray, params)
    losses = []
    for _ in range(10):
        lora, opt_state, loss = step(lora, opt_state, params, x_t, t,
                                     ctx_c, ctx_u)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # gradients reached the adapter: B is no longer zero
    assert any(float(jnp.abs(ab["b"]).max()) > 0 for ab in lora.values())
    # the base tree was never updated
    for a, b in zip(jax.tree_util.tree_leaves(base_before),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_generic_lora_train_step_runs():
    """make_lora_train_step wraps any loss over merged params."""
    model, params, x, ctx = _tiny_setup(b=2)
    t = jnp.asarray([10, 20])

    def loss_of_merged(p, x_, t_, c_):
        return jnp.mean(jnp.square(model.apply(p, x_, t_, c_)))

    cfg = ESDConfig(learning_rate=1e-3)
    lora = init_lora_params(params, jax.random.PRNGKey(0), rank=2,
                            targets="attn")
    step = make_lora_train_step(loss_of_merged, cfg, donate=False)
    opt_state = make_optimizer(cfg).init(lora)
    lora2, _, loss = step(lora, opt_state, params, x, t, ctx)
    assert np.isfinite(float(loss))
    changed = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), lora, lora2)
    assert max(jax.tree_util.tree_leaves(changed)) > 0


def test_lora_flow_step_on_tiny_mmdit():
    """The generic LoRA step composes with the SD3 flow-matching loss: the
    adapter alone reduces the velocity MSE on a fixed batch, base frozen."""
    from safe_denoiser_tpu.training import flow_matching_loss
    from tests.test_training import _tiny_mmdit_setup

    model, params, x0, ctx, pooled = _tiny_mmdit_setup()
    sigma = jnp.asarray([0.3, 0.7])
    rng = jax.random.PRNGKey(5)

    def loss_of_merged(p, *batch):
        return flow_matching_loss(lambda pp, *a: model.apply(pp, *a),
                                  p, *batch)

    cfg = ESDConfig(learning_rate=1e-2)
    lora = init_lora_params(params, jax.random.PRNGKey(6), rank=4,
                            targets="full")
    step = make_lora_train_step(loss_of_merged, cfg, donate=False)
    opt_state = make_optimizer(cfg).init(lora)
    base_before = jax.tree_util.tree_map(np.asarray, params)
    first = None
    for _ in range(15):
        lora, opt_state, loss = step(lora, opt_state, params, x0, ctx,
                                     pooled, sigma, rng)
        if first is None:
            first = float(loss)
    assert float(loss) < first, (first, float(loss))
    for a, b in zip(jax.tree_util.tree_leaves(base_before),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(a, np.asarray(b))


@pytest.mark.parametrize("ext", [".safetensors", ".pt"])
def test_adapter_save_load_roundtrip(tmp_path, ext):
    _, params, _, _ = _tiny_setup()
    lora = init_lora_params(params, jax.random.PRNGKey(3), rank=3,
                            targets="xattn")
    lora = jax.tree_util.tree_map(lambda v: v + 0.25, lora)
    path = os.path.join(tmp_path, "adapter" + ext)
    save_lora(path, lora, rank=3, alpha=6.0, targets="xattn",
              metadata={"prompt": "nudity"})
    back, meta = load_lora(path)
    assert int(meta["rank"]) == 3 and float(meta["alpha"]) == 6.0
    assert set(back) == set(lora)
    for p in lora:
        np.testing.assert_array_equal(np.asarray(lora[p]["a"]),
                                      np.asarray(back[p]["a"]))
        np.testing.assert_array_equal(np.asarray(lora[p]["b"]),
                                      np.asarray(back[p]["b"]))


def test_pipeline_load_lora_matches_in_memory_merge(tmp_path):
    """A saved adapter merged via the pipeline surface == apply_lora."""
    from safe_denoiser_tpu.pipeline.diffusion import SafeDiffusionPipeline

    model, params, x, ctx = _tiny_setup()
    lora = init_lora_params(params, jax.random.PRNGKey(4), rank=2,
                            targets="xattn")
    lora = jax.tree_util.tree_map(lambda v: v + 0.1, lora)
    path = os.path.join(tmp_path, "erase.lora.safetensors")
    save_lora(path, lora, rank=2, alpha=2.0, targets="xattn")

    pipe = SafeDiffusionPipeline.__new__(SafeDiffusionPipeline)
    pipe.unet = model
    pipe.unet_params = params
    pipe.load_lora(path)
    want = _leaf_paths(apply_lora(params, lora, scale=1.0))
    got = _leaf_paths(pipe.unet_params)
    for p in want:
        np.testing.assert_allclose(np.asarray(got[p]), np.asarray(want[p]),
                                   rtol=1e-6, atol=1e-7)


def test_int8_kernels_refused():
    _, params, _, _ = _tiny_setup()
    bad = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.int8) if v.ndim == 2 else v, params)
    with pytest.raises(ValueError, match="int"):
        lora_target_paths(bad, "xattn")


def test_train_esd_cli_lora_end_to_end(tmp_path):
    """train_esd.py --lora_rank: trains only the adapter, exports BOTH the
    merged UNet and the standalone adapter; loading the merged checkpoint
    (load_unet_state_dict) equals loading base + adapter (load_lora), and
    only xattn kernels differ from the originals."""
    from tests.test_e2e_pipeline import _tiny_tokenizer
    from tests.test_runner_cli import _write_checkpoint

    tok = _tiny_tokenizer()
    ckpt = _write_checkpoint(tmp_path, tok)
    merged_path = tmp_path / "esd_lora_merged.safetensors"
    adapter_path = tmp_path / "esd.lora.safetensors"

    from safe_denoiser_tpu.runners.train_esd import main
    main(["--model_dir", str(ckpt), "--prompt", "a cat",
          "--train_method", "xattn", "--lora_rank", "2",
          "--iterations", "3", "--lr", "1e-2", "--image_length", "32",
          "--denoise_steps", "2", "--save_path", str(merged_path),
          "--save_lora_path", str(adapter_path), "--log_every", "1"])
    assert merged_path.exists() and adapter_path.exists()
    logs = (tmp_path / "train_logs.txt").read_text()
    assert "lora rank=2" in logs

    from safe_denoiser_tpu.pipeline.diffusion import SafeDiffusionPipeline
    pipe_m = SafeDiffusionPipeline.from_pretrained(str(ckpt))
    orig = _leaf_paths(jax.tree_util.tree_map(jnp.copy, pipe_m.unet_params))
    pipe_m.load_unet_state_dict(str(merged_path))
    pipe_a = SafeDiffusionPipeline.from_pretrained(str(ckpt))
    pipe_a.load_lora(str(adapter_path))

    merged, via_adapter = (_leaf_paths(pipe_m.unet_params),
                           _leaf_paths(pipe_a.unet_params))
    changed = 0
    for p in orig:
        np.testing.assert_allclose(np.asarray(merged[p]),
                                   np.asarray(via_adapter[p]),
                                   rtol=1e-5, atol=1e-6)
        if "attn2" in p and p.endswith("/kernel"):
            changed += not np.array_equal(np.asarray(merged[p]),
                                          np.asarray(orig[p]))
        else:
            np.testing.assert_allclose(np.asarray(merged[p]),
                                       np.asarray(orig[p]),
                                       rtol=0, atol=1e-6)
    assert changed > 0


def test_lora_step_under_mesh_matches_unsharded():
    """The LoRA-ESD step under a (data, model) mesh: base params TP-sharded
    per UNET_TP_RULES, adapter replicated, batch data-sharded — same adapter
    update as the unsharded step."""
    from safe_denoiser_tpu.parallel import UNET_TP_RULES, shard_params_tp

    model, params, x_t, ctx_c = _tiny_setup(b=4)
    ctx_u = jnp.zeros_like(ctx_c)
    t = jnp.asarray([100, 200, 300, 400])

    def apply_fn(p, x, t_, c):
        return model.apply(p, x, t_, c)

    cfg = ESDConfig(learning_rate=1e-3)
    lora = init_lora_params(params, jax.random.PRNGKey(5), rank=2,
                            targets="xattn")
    opt_state = make_optimizer(cfg).init(lora)
    step = make_lora_esd_train_step(apply_fn, cfg, donate=False)

    lora_ref, _, loss_ref = step(lora, opt_state, params, x_t, t,
                                 ctx_c, ctx_u)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    params_s = shard_params_tp(params, mesh, UNET_TP_RULES)
    bsh = NamedSharding(mesh, P("data"))
    x_s = jax.device_put(x_t, bsh)
    lora_s, _, loss_s = step(lora, opt_state, params_s, x_s,
                             jax.device_put(t, bsh),
                             jax.device_put(ctx_c, bsh),
                             jax.device_put(ctx_u, bsh))
    np.testing.assert_allclose(float(loss_s), float(loss_ref),
                               rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(lora_ref),
                    jax.tree_util.tree_leaves(lora_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_apply_lora_strict_raises_on_unmatched_paths():
    """A path-mismatched adapter must raise, not merge as a silent no-op
    (the user would sample from an un-erased model believing the adapter
    is active)."""
    _, params, _, _ = _tiny_setup()
    lora = init_lora_params(params, jax.random.PRNGKey(0), rank=2,
                            targets="xattn")
    bad = {("wrong/" + k): v for k, v in lora.items()}
    with pytest.raises(ValueError, match="matching no param leaf"):
        apply_lora(params, bad)
    # strict=False keeps the trainable-overlay semantics (always-matching
    # paths by construction) available without the trace-time set check
    merged = apply_lora(params, bad, strict=False)
    for a, b in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_lora_into_rejects_wrong_family_adapter(tmp_path):
    """Pipeline-surface merge must validate adapter paths against the tree
    BEFORE compiling the merge (wrong model family / foreign file)."""
    from safe_denoiser_tpu.training import merge_lora_into
    _, params, _, _ = _tiny_setup()
    lora = init_lora_params(params, jax.random.PRNGKey(0), rank=2,
                            targets="xattn")
    bad = {("sd3_block/" + k): v for k, v in lora.items()}
    p = str(tmp_path / "bad.safetensors")
    save_lora(p, bad, rank=2)
    with pytest.raises(ValueError, match="matching no param leaf"):
        merge_lora_into(params, p)
    # and the matched adapter still merges identically to apply_lora
    good = str(tmp_path / "good.safetensors")
    save_lora(good, lora, rank=2)
    merged = merge_lora_into(params, good)
    expect = apply_lora(params, lora, 1.0)
    for a, b in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(expect)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_lora_rejects_non_adapter_file(tmp_path):
    """A .safetensors that is not an adapter (keys end in neither .lora_a
    nor .lora_b) must raise instead of loading an empty/partial tree."""
    from safetensors.numpy import save_file
    p = str(tmp_path / "unet.safetensors")
    save_file({"conv_in.weight": np.zeros((4, 4), np.float32)}, p)
    with pytest.raises(ValueError, match="not a LoRA adapter"):
        load_lora(p)


def test_resume_with_changed_rank_raises(tmp_path):
    """restore_train_state must reject shape-mismatched snapshots (flax's
    from_state_dict silently restores ANY shape into the template): a
    --lora_rank 4 resume of a rank-8 run must fail loudly, not continue
    with a wrong merge scale and lying export metadata."""
    from safe_denoiser_tpu.training import (restore_train_state,
                                            save_train_state)
    _, params, _, _ = _tiny_setup()
    cfg = ESDConfig()
    lora8 = init_lora_params(params, jax.random.PRNGKey(0), rank=8,
                             targets="xattn")
    opt8 = make_optimizer(cfg).init(lora8)
    p = str(tmp_path / "ck.train_state")
    save_train_state(p, lora8, opt8, 10, jax.random.PRNGKey(1),
                     metadata={"lora_rank": 8})
    lora4 = init_lora_params(params, jax.random.PRNGKey(0), rank=4,
                             targets="xattn")
    opt4 = make_optimizer(cfg).init(lora4)
    with pytest.raises(ValueError, match="different hyperparameters"):
        restore_train_state(p, lora4, opt4)
    # same-rank restore still round-trips
    got, _, step, _, meta = restore_train_state(p, lora8, opt8)
    assert step == 10 and int(meta["lora_rank"]) == 8
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(lora8)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
