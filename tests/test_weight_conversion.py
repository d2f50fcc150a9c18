"""Golden parity tests: tiny HF transformers models (torch CPU, random
weights) vs. this framework's Flax modules after state-dict conversion.

This is the activation-level golden-test strategy SURVEY.md §4 calls for:
the reference has no tests, so numeric parity with the upstream encoder
implementations is our ground truth for attention/norm conventions.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from safe_denoiser_tpu.models import CLIPTextConfig, CLIPTextModel, T5Config, T5Encoder
from safe_denoiser_tpu.models.weights import convert_clip_text, convert_t5


def _to_np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_clip_text_parity_with_hf():
    # NOTE: eos_token_id=119 (not 2) so HF takes its modern first-EOS pooling
    # path; with eos_token_id==2 HF falls back to legacy argmax(input_ids)
    # pooling, which only coincides with first-EOS for real CLIP vocabularies
    # where EOS (49407) is the largest token id.
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=120, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu",
        projection_dim=24, eos_token_id=119, bos_token_id=0, pad_token_id=1)
    torch.manual_seed(0)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()

    cfg = CLIPTextConfig(vocab_size=120, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64,
                         max_position_embeddings=16, hidden_act="quick_gelu",
                         projection_dim=24, eos_token_id=119)
    params = convert_clip_text(_to_np_sd(hf), cfg)

    ids = np.array([[0, 5, 9, 119, 1, 1, 1, 1], [0, 7, 119, 1, 1, 1, 1, 1]])
    with torch.no_grad():
        out = hf(torch.tensor(ids), output_hidden_states=True)
    last, penult, pooled, projected = CLIPTextModel(cfg).apply(
        params, jnp.asarray(ids))

    np.testing.assert_allclose(np.asarray(last),
                               out.last_hidden_state.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(penult),
                               out.hidden_states[-2].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(projected),
                               out.text_embeds.numpy(), atol=2e-5)


def test_t5_encoder_parity_with_hf():
    hf_cfg = transformers.T5Config(
        vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj="gated-gelu",
        is_encoder_decoder=False, use_cache=False, dropout_rate=0.0)
    torch.manual_seed(0)
    hf = transformers.T5EncoderModel(hf_cfg).eval()

    cfg = T5Config(vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4, relative_attention_num_buckets=8,
                   relative_attention_max_distance=20)
    params = convert_t5(_to_np_sd(hf), cfg)

    ids = np.array([[3, 14, 15, 9, 2, 6, 5, 1]])
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).last_hidden_state.numpy()
    out = T5Encoder(cfg).apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_clip_vision_parity_with_hf():
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, hidden_act="quick_gelu",
        projection_dim=24)
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()

    from safe_denoiser_tpu.models import CLIPVisionConfig, CLIPVisionModel
    from safe_denoiser_tpu.models.weights import convert_clip_vision
    cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                           num_layers=2, num_heads=4, intermediate_size=64,
                           hidden_act="quick_gelu", projection_dim=24)
    params = convert_clip_vision(_to_np_sd(hf), cfg)

    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 3, 32, 32).astype(np.float32)  # torch NCHW
    with torch.no_grad():
        out = hf(torch.tensor(imgs))
    _, pooled, projected = CLIPVisionModel(cfg).apply(
        params, jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(projected),
                               out.image_embeds.numpy(), atol=3e-5)


def test_mmdit_conversion_roundtrip():
    """Flax → torch-style sd → convert_mmdit → identical params + outputs."""
    import jax

    from safe_denoiser_tpu.models import MMDiT, MMDiTConfig
    from safe_denoiser_tpu.models.weights import convert_mmdit
    from tests.helpers_invert import invert_mmdit

    cfg = MMDiTConfig(sample_size=8, num_layers=2, num_heads=4, head_dim=8,
                      joint_attention_dim=48, caption_projection_dim=32,
                      pooled_projection_dim=40, pos_embed_max_size=16)
    model = MMDiT(cfg)
    x = jnp.ones((1, 8, 8, 16))
    t = jnp.array([500.0])
    ctx = jnp.ones((1, 12, 48))
    pooled = jnp.ones((1, 40))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, pooled)

    sd = invert_mmdit(params["params"], cfg)
    params2 = convert_mmdit(sd, cfg)
    want = model.apply(params, x, t, ctx, pooled)
    got = model.apply(params2, x, t, ctx, pooled)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_vae_conversion_roundtrip():
    import jax

    from safe_denoiser_tpu.models import AutoencoderKL, VAEConfig
    from safe_denoiser_tpu.models.weights import convert_vae
    from tests.helpers_invert import invert_vae

    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                    norm_num_groups=4, sample_size=16)
    model = AutoencoderKL(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 16, 16, 3)) * 0.3
    params = model.init({"params": rng}, x, rng)
    sd = invert_vae(params["params"], cfg)
    params2 = convert_vae(sd, cfg)
    want = model.apply(params, x, rng, method=AutoencoderKL.sample_latent)
    got = model.apply(params2, x, rng, method=AutoencoderKL.sample_latent)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_vae_legacy_attention_key_naming():
    """The 2022-era SD-1.x hub vae .bin names the mid-block attention
    query/key/value/proj_attn (legacy diffusers AttentionBlock); the modern
    naming is to_q/to_k/to_v/to_out.0. convert_vae must accept both and
    produce the identical param tree."""
    import jax

    from safe_denoiser_tpu.models import AutoencoderKL, VAEConfig
    from safe_denoiser_tpu.models.weights import convert_vae
    from tests.helpers_invert import invert_vae

    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                    norm_num_groups=4, sample_size=16)
    model = AutoencoderKL(cfg)
    rng = jax.random.PRNGKey(1)
    params = model.init({"params": rng}, jnp.zeros((1, 16, 16, 3)), rng)
    sd = invert_vae(params["params"], cfg)

    rename = {".to_q.": ".query.", ".to_k.": ".key.", ".to_v.": ".value.",
              ".to_out.0.": ".proj_attn."}
    legacy = {}
    for k, v in sd.items():
        if ".attentions.0." in k:
            for new, old in rename.items():
                k = k.replace(new, old)
        legacy[k] = v
    assert any(".query.weight" in k for k in legacy)

    a = convert_vae(sd, cfg)
    b = convert_vae(legacy, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(leaf, flat_b[path])


def test_bf16_safetensors_loading(tmp_path):
    """safetensors.numpy raises on BF16 files; the manual reader must load
    them (real SD3.5-era / redistributed-T5 checkpoints ship bf16 shards).
    Fixture written by safetensors.torch — the same writer HF uses."""
    from safetensors.torch import save_file

    from safe_denoiser_tpu.models.weights import load_state_dict

    t = {
        "a.weight": torch.randn(4, 6, dtype=torch.float32).to(torch.bfloat16),
        "b.bias": torch.randn(8, dtype=torch.float16),
        "c.scalar": torch.tensor(2.5, dtype=torch.bfloat16),
        "d.ints": torch.arange(12, dtype=torch.int64).reshape(3, 4),
    }
    path = tmp_path / "model.safetensors"
    save_file(t, str(path))

    sd = load_state_dict(str(path))
    assert set(sd) == set(t)
    for k, v in t.items():
        got = sd[k]
        assert tuple(got.shape) == tuple(v.shape)
        np.testing.assert_array_equal(
            np.asarray(got, dtype=np.float32),
            v.to(torch.float32).numpy())
    # bf16 arrays must survive the converter idioms (transpose + contiguous)
    # and feed jnp directly
    kt = np.ascontiguousarray(sd["a.weight"].T)
    assert jnp.asarray(kt).dtype == jnp.bfloat16
    # an all-numpy-dtype file still takes the battle-tested library path
    save_file({"x": torch.randn(3, 3)}, str(tmp_path / "f32.safetensors"))
    sd2 = load_state_dict(str(tmp_path / "f32.safetensors"))
    assert sd2["x"].dtype == np.float32


def test_sharded_dir_idioms(tmp_path):
    """Real HF directories: an index.json names the shard set; fp16/non_ema
    variant files sit next to the base weights and must not be merged in."""
    from safetensors.torch import save_file

    from safe_denoiser_tpu.models.weights import load_sharded_state_dict

    # variant next to base: base wins, variant untouched
    d1 = tmp_path / "clip"
    d1.mkdir()
    save_file({"w": torch.ones(2, 2)}, str(d1 / "model.safetensors"))
    save_file({"w": torch.zeros(2, 2, dtype=torch.float16)},
              str(d1 / "model.fp16.safetensors"))
    sd = load_sharded_state_dict(str(d1))
    assert sd["w"].dtype == np.float32 and sd["w"][0, 0] == 1.0

    # only a variant present: it is loaded (some repos ship fp16-only)
    d2 = tmp_path / "fp16only"
    d2.mkdir()
    save_file({"w": torch.ones(2, dtype=torch.float16)},
              str(d2 / "model.fp16.safetensors"))
    assert load_sharded_state_dict(str(d2))["w"].dtype == np.float16

    # index.json selects the exact shard set (stale extra file ignored)
    import json as _json
    d3 = tmp_path / "t5"
    d3.mkdir()
    save_file({"a": torch.ones(2)},
              str(d3 / "model-00001-of-00002.safetensors"))
    save_file({"b": torch.ones(3)},
              str(d3 / "model-00002-of-00002.safetensors"))
    save_file({"stale": torch.ones(1)}, str(d3 / "extra.safetensors"))
    (d3 / "model.safetensors.index.json").write_text(_json.dumps({
        "metadata": {}, "weight_map": {
            "a": "model-00001-of-00002.safetensors",
            "b": "model-00002-of-00002.safetensors"}}))
    sd3 = load_sharded_state_dict(str(d3))
    assert set(sd3) == {"a", "b"}

    # BOTH index files present (real SD3-medium text_encoder_3 ships
    # model.safetensors.index.json AND model.fp16.safetensors.index.json):
    # sorted() puts the fp16 one first ('f' < 's'), but base must win —
    # regression for a silent half-precision downgrade of the T5 tower
    d4 = tmp_path / "t5_both"
    d4.mkdir()
    save_file({"a": torch.ones(2)}, str(d4 / "model-00001-of-00001.safetensors"))
    save_file({"a": torch.ones(2, dtype=torch.float16)},
              str(d4 / "model.fp16-00001-of-00001.safetensors"))
    (d4 / "model.safetensors.index.json").write_text(_json.dumps({
        "metadata": {}, "weight_map": {
            "a": "model-00001-of-00001.safetensors"}}))
    (d4 / "model.fp16.safetensors.index.json").write_text(_json.dumps({
        "metadata": {}, "weight_map": {
            "a": "model.fp16-00001-of-00001.safetensors"}}))
    assert load_sharded_state_dict(str(d4))["a"].dtype == np.float32

    # fp16-only repo with an index: the variant index is still honored
    d5 = tmp_path / "fp16_index_only"
    d5.mkdir()
    save_file({"a": torch.ones(2, dtype=torch.float16)},
              str(d5 / "model.fp16-00001-of-00001.safetensors"))
    (d5 / "model.fp16.safetensors.index.json").write_text(_json.dumps({
        "metadata": {}, "weight_map": {
            "a": "model.fp16-00001-of-00001.safetensors"}}))
    assert load_sharded_state_dict(str(d5))["a"].dtype == np.float16
