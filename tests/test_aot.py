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


def test_aot_sld_bundle_matches_live(pipe, tmp_path):
    """3-branch SLD momentum guidance baked into the exported scan: the
    prepared-embeddings serving path (live text prep + artifact scan) must
    match the live generate_batch bit-for-bit."""
    from safe_denoiser_tpu.pipeline.diffusion import ERASE_SPECS, SLD_CONFIGS

    spec = ERASE_SPECS["sld"]
    bundle = export_pipeline(pipe, batch_size=2, num_inference_steps=2,
                             height=32, width=32, erase_spec=spec,
                             safe_level="STRONG")
    path = str(tmp_path / "sld.sdt")
    save_bundle(bundle, path)
    loaded = load_bundle(path)
    assert loaded.meta["branches"] == 3
    assert loaded.meta["text_method"] == "sld"
    assert loaded.meta["safe_level"] == "STRONG"

    prompts, seeds, gs = ["a cat", "a dog"], [3, 4], [7.5, 7.5]
    # live host text prep, exactly as serve.py's prepared path does it
    sf = {"safree": False, "logger": None}
    per = [pipe._prepare_text(p, None, None, sf, spec,
                              SLD_CONFIGS["STRONG"], 2, None)
           for p in prompts]
    import jax.numpy as jnp
    text_embeds = jnp.concatenate([t for t, _, _, _ in per], axis=1)
    embeds_alt = jnp.concatenate([a for _, a, _, _ in per], axis=1)
    use_alt = jnp.stack([u for _, _, u, _ in per], axis=1)
    imgs = loaded.generate_prepared(pipe.unet_params, pipe.vae_params,
                                    text_embeds, embeds_alt, use_alt,
                                    seeds, gs)
    live = pipe.generate_batch(prompts, seeds=seeds, guidance_scales=gs,
                               num_inference_steps=2, height=32, width=32,
                               erase_spec=spec,
                               safe_config=SLD_CONFIGS["STRONG"])
    for a, b in zip(imgs, live):
        np.testing.assert_array_equal(a, b)
    # a 2-branch embed stack into a 3-branch program is refused loudly
    with pytest.raises(ValueError, match="branches"):
        loaded.generate_prepared(pipe.unet_params, pipe.vae_params,
                                 text_embeds[:2], embeds_alt[:2], use_alt,
                                 seeds, gs)
    # the plain generate() path (bundle-side tokenize) refuses text methods
    with pytest.raises(ValueError, match="generate_prepared"):
        loaded.generate(pipe.unet_params, pipe.vae_params, pipe.text_params,
                        pipe.tokenizer, prompts, seeds, gs)


def test_aot_safree_bundle_matches_live(pipe, tmp_path):
    """SAFREE: the adaptive-window/alt-embeddings inputs of the exported
    scan carry the live host projection — artifact output == live output."""
    from safe_denoiser_tpu.pipeline.diffusion import ERASE_SPECS

    spec = ERASE_SPECS["safree"]
    bundle = export_pipeline(pipe, batch_size=1, num_inference_steps=3,
                             height=32, width=32, erase_spec=spec)
    loaded = load_bundle_roundtrip(bundle, str(tmp_path / "sf.sdt"))
    assert loaded.meta["branches"] == 2

    space = ["naked", "nsfw"]
    sf = {"safree": True, "logger": None, "alpha": 0.01}
    per = [pipe._prepare_text("a cat", None, space, sf, spec, None, 3, None)]
    import jax.numpy as jnp
    text_embeds = jnp.concatenate([t for t, _, _, _ in per], axis=1)
    embeds_alt = jnp.concatenate([a for _, a, _, _ in per], axis=1)
    use_alt = jnp.stack([u for _, _, u, _ in per], axis=1)
    imgs = loaded.generate_prepared(pipe.unet_params, pipe.vae_params,
                                    text_embeds, embeds_alt, use_alt,
                                    [11], [7.5])
    live = pipe.generate_batch(["a cat"], seeds=[11], guidance_scales=[7.5],
                               num_inference_steps=3, height=32, width=32,
                               erase_spec=spec, negative_prompt_space=space,
                               safree_dict=sf)
    np.testing.assert_array_equal(imgs[0], live[0])


def load_bundle_roundtrip(bundle, path):
    save_bundle(bundle, path)
    return load_bundle(path)


def test_aot_sd3_bundle_matches_live(tmp_path):
    """SD3 family bundle: exported triple-encode + flow scan + decode match
    the live pipeline; family recorded in meta for the serve-side guard."""
    from tests.test_sd3_from_pretrained import write_sd3_checkpoint

    from safe_denoiser_tpu.pipeline.diffusion_sd3 import SafeDiffusion3Pipeline
    from safe_denoiser_tpu.serving.aot import export_pipeline_sd3

    ckpt = write_sd3_checkpoint(tmp_path / "sd3ckpt", _tiny_tokenizer())
    p3 = SafeDiffusion3Pipeline.from_pretrained(str(ckpt))
    bundle = export_pipeline_sd3(p3, batch_size=2, num_inference_steps=2,
                                 height=16, width=16)
    loaded = load_bundle_roundtrip(bundle, str(tmp_path / "sd3.sdt"))
    assert loaded.meta["family"] == "sd3"

    prompts, seeds, gs = ["a cat", "a dog"], [5, 9], [7.0, 2.5]
    imgs = loaded.generate(p3.transformer_params, p3.vae_params,
                           p3.clip_l_params, p3.clip_g_params, p3.t5_params,
                           p3.tokenizer, p3.tokenizer_2, p3.tokenizer_3,
                           prompts, seeds, gs)
    live = p3.generate_batch(prompts, seeds=seeds, guidance_scales=gs,
                             num_inference_steps=2, height=16, width=16)
    assert len(imgs) == 2
    for a, b in zip(imgs, live):
        np.testing.assert_array_equal(a, b)
