"""AOT deployment bundles (serving/aot.py): export → serialize → reload →
generate must reproduce the live pipeline bit-for-bit on the same platform,
stay weight-independent (one artifact, many checkpoints), and fail loudly
on platform/shape mismatches."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from safe_denoiser_tpu.serving.aot import (AotBundle, export_pipeline,
                                           load_bundle, save_bundle)
from tests.test_e2e_pipeline import _tiny_tokenizer
from tests.test_runner_cli import _write_checkpoint


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    from safe_denoiser_tpu.pipeline.diffusion import SafeDiffusionPipeline
    ckpt = _write_checkpoint(tmp_path_factory.mktemp("ck"), _tiny_tokenizer())
    return SafeDiffusionPipeline.from_pretrained(str(ckpt))


def test_aot_roundtrip_matches_live_pipeline(pipe, tmp_path):
    bundle = export_pipeline(pipe, batch_size=2, num_inference_steps=2,
                             height=32, width=32)
    path = str(tmp_path / "bundle.sdt")
    save_bundle(bundle, path)
    loaded = load_bundle(path)
    assert loaded.meta["batch_size"] == 2

    prompts = ["a cat", "a dog"]
    seeds = [7, 8]
    gs = [7.5, 6.0]
    imgs = loaded.generate(pipe.unet_params, pipe.vae_params,
                           pipe.text_params, pipe.tokenizer,
                           prompts, seeds, gs)
    live = pipe.generate_batch(prompts, seeds=seeds, guidance_scales=gs,
                               num_inference_steps=2, height=32, width=32)
    assert len(imgs) == 2 and imgs[0].shape == live[0].shape
    for a, b in zip(imgs, live):
        np.testing.assert_array_equal(a, b)


def test_aot_is_weight_independent(pipe, tmp_path):
    """The artifact bakes shapes/statics only: the same bundle must serve a
    different checkpoint of the same architecture (e.g. an erased UNet)."""
    bundle = export_pipeline(pipe, batch_size=1, num_inference_steps=2,
                             height=32, width=32)
    p2 = jax.tree_util.tree_map(lambda x: x + 0.01 * jnp.ones_like(x)
                                if jnp.issubdtype(x.dtype, jnp.floating)
                                else x, pipe.unet_params)
    a = bundle.generate(pipe.unet_params, pipe.vae_params, pipe.text_params,
                        pipe.tokenizer, ["x"], [1], [7.5])
    b = bundle.generate(p2, pipe.vae_params, pipe.text_params,
                        pipe.tokenizer, ["x"], [1], [7.5])
    assert not np.array_equal(a[0], b[0])


def test_aot_batch_and_platform_guards(pipe, tmp_path):
    bundle = export_pipeline(pipe, batch_size=2, num_inference_steps=2,
                             height=32, width=32)
    with pytest.raises(ValueError, match="compiled for batch 2"):
        bundle.generate(pipe.unet_params, pipe.vae_params, pipe.text_params,
                        pipe.tokenizer, ["one"], [1], [7.5])
    # platform lock: a bundle stamped for another platform refuses to load
    path = str(tmp_path / "bundle.sdt")
    bundle.meta["platform"] = "tpu" if jax.devices()[0].platform != "tpu" \
        else "cpu"
    save_bundle(bundle, path)
    with pytest.raises(ValueError, match="platform-locked"):
        load_bundle(path)


def test_aot_with_repellency_bank(pipe, tmp_path):
    """Repellency statics + the bank shape bake into the sampling program;
    the bank itself stays a call-time input and must be supplied."""
    from safe_denoiser_tpu.pipeline.diffusion import ERASE_SPECS
    from safe_denoiser_tpu.repellency.methods import RepellencyConfig

    rng = np.random.RandomState(0)
    refs = jnp.asarray(rng.randn(3, 4, 16, 16).astype(np.float32))
    cfg = RepellencyConfig(sigma=100.0, scale=0.33, beta_threshold=1e-12,
                           use_beta_gate=True)
    spec = ERASE_SPECS["std_rep"]
    bundle = export_pipeline(pipe, batch_size=1, num_inference_steps=2,
                             height=32, width=32, erase_spec=spec,
                             repellency_cfg=cfg, refs=refs)
    path = str(tmp_path / "rep.sdt")
    save_bundle(bundle, path)
    loaded = load_bundle(path)
    # the baked statics are recorded in meta (and JSON round-trip exactly)
    # so serve.py can refuse a mismatched serving config instead of
    # silently running the export-time values
    import dataclasses
    assert loaded.meta["repellency_cfg"] == dataclasses.asdict(cfg)
    assert loaded.meta["erase_spec"] == dataclasses.asdict(spec)
    imgs = loaded.generate(pipe.unet_params, pipe.vae_params,
                           pipe.text_params, pipe.tokenizer,
                           ["a cat"], [7], [7.5], refs=refs)
    assert imgs[0].shape == (32, 32, 3)
    with pytest.raises(ValueError, match="refs must match"):
        loaded.generate(pipe.unet_params, pipe.vae_params, pipe.text_params,
                        pipe.tokenizer, ["a cat"], [7], [7.5])
