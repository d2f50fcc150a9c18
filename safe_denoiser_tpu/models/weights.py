"""Torch-checkpoint → Flax param-tree converters.

Maps the HF/diffusers state-dict key layout of every checkpoint the reference
loads (run_nudity.py:117-130 SD-v1.4 + ESD/RECE UNet swaps;
run_nudity_sdv3.py:64-91 SD3-medium) onto this framework's module trees.

Pure numpy — no torch import needed: state dicts come from ``.safetensors``
(via the safetensors lib) or torch-pickle ``.pt``/``.bin`` files (via
safe_denoiser_tpu.io.load_pt). Conversions:
  * Linear: torch [out, in]  → flax kernel [in, out]
  * Conv:   torch OIHW       → flax HWIO
"""

from __future__ import annotations

import os
from typing import Mapping

import numpy as np

from ..io import load_pt
from .clip_text import CLIPTextConfig
from .mmdit import MMDiTConfig
from .t5 import T5Config
from .unet import UNetConfig
from .vae import VAEConfig

Array = np.ndarray
StateDict = Mapping[str, Array]


def load_component_config(model_dir: str, kind: str):
    """Build a model config dataclass from an HF/diffusers ``config.json``.

    Falls back to the SD-v1.4 presets when no config file is present.
    kind: 'unet' | 'vae' | 'clip_text' | 'mmdit' | 't5'.
    """
    import dataclasses
    import json

    from .clip_text import CLIP_VIT_L_14
    from .mmdit import SD3_MEDIUM
    from .t5 import T5_XXL
    from .unet import SD14_UNET
    from .vae import SD14_VAE

    path = os.path.join(model_dir, "config.json")
    defaults = {"unet": SD14_UNET, "vae": SD14_VAE, "clip_text": CLIP_VIT_L_14,
                "mmdit": SD3_MEDIUM, "t5": T5_XXL}[kind]
    if not os.path.exists(path):
        return defaults
    with open(path) as f:
        cfg = json.load(f)

    if kind == "unet":
        heads = cfg.get("attention_head_dim", 8)
        if isinstance(heads, list):
            heads = heads[0]
        return dataclasses.replace(
            defaults,
            sample_size=cfg.get("sample_size", 64),
            in_channels=cfg.get("in_channels", 4),
            out_channels=cfg.get("out_channels", 4),
            block_out_channels=tuple(cfg.get("block_out_channels",
                                             (320, 640, 1280, 1280))),
            layers_per_block=cfg.get("layers_per_block", 2),
            cross_attention_dim=cfg.get("cross_attention_dim", 768),
            # SD-v1 configs store attention_head_dim = number of heads
            num_attention_heads=heads,
            norm_num_groups=cfg.get("norm_num_groups", 32),
            norm_eps=cfg.get("norm_eps", 1e-5),
            freq_shift=cfg.get("freq_shift", 0),
            flip_sin_to_cos=cfg.get("flip_sin_to_cos", True))
    if kind == "vae":
        return dataclasses.replace(
            defaults,
            in_channels=cfg.get("in_channels", 3),
            out_channels=cfg.get("out_channels", 3),
            latent_channels=cfg.get("latent_channels", 4),
            block_out_channels=tuple(cfg.get("block_out_channels",
                                             (128, 256, 512, 512))),
            layers_per_block=cfg.get("layers_per_block", 2),
            norm_num_groups=cfg.get("norm_num_groups", 32),
            scaling_factor=cfg.get("scaling_factor", 0.18215),
            shift_factor=cfg.get("shift_factor") or 0.0,
            sample_size=cfg.get("sample_size", 512),
            use_quant_conv=cfg.get("use_quant_conv", True),
            use_post_quant_conv=cfg.get("use_post_quant_conv", True))
    if kind == "clip_text":
        return dataclasses.replace(
            defaults,
            vocab_size=cfg.get("vocab_size", 49408),
            hidden_size=cfg.get("hidden_size", 768),
            num_layers=cfg.get("num_hidden_layers", 12),
            num_heads=cfg.get("num_attention_heads", 12),
            max_position_embeddings=cfg.get("max_position_embeddings", 77),
            intermediate_size=cfg.get("intermediate_size", 3072),
            hidden_act=cfg.get("hidden_act", "quick_gelu"),
            projection_dim=cfg.get("projection_dim", 768),
            eos_token_id=cfg.get("eos_token_id", 49407))
    if kind == "mmdit":
        return dataclasses.replace(
            defaults,
            sample_size=cfg.get("sample_size", 128),
            patch_size=cfg.get("patch_size", 2),
            in_channels=cfg.get("in_channels", 16),
            out_channels=cfg.get("out_channels", 16),
            num_layers=cfg.get("num_layers", 24),
            num_heads=cfg.get("num_attention_heads", 24),
            head_dim=cfg.get("attention_head_dim", 64),
            joint_attention_dim=cfg.get("joint_attention_dim", 4096),
            caption_projection_dim=cfg.get("caption_projection_dim", 1536),
            pooled_projection_dim=cfg.get("pooled_projection_dim", 2048),
            pos_embed_max_size=cfg.get("pos_embed_max_size", 192),
            qk_norm=cfg.get("qk_norm"))
    if kind == "t5":
        return dataclasses.replace(
            defaults,
            vocab_size=cfg.get("vocab_size", 32128),
            d_model=cfg.get("d_model", 4096),
            d_kv=cfg.get("d_kv", 64),
            d_ff=cfg.get("d_ff", 10240),
            num_layers=cfg.get("num_layers", 24),
            num_heads=cfg.get("num_heads", 64),
            relative_attention_num_buckets=cfg.get(
                "relative_attention_num_buckets", 32),
            relative_attention_max_distance=cfg.get(
                "relative_attention_max_distance", 128))
    raise ValueError(kind)


# safetensors dtype tags that numpy can represent natively; anything else
# (BF16, F8_*) routes through the manual reader below
_ST_NUMPY_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def _read_safetensors_header(path: str) -> tuple[dict, int]:
    import json
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n))
    return header, 8 + n


def _load_safetensors_raw(path: str, header: dict, base: int) -> dict[str, Array]:
    """Self-contained safetensors reader for dtypes ``safetensors.numpy``
    refuses (it raises on BF16 because numpy has no native bfloat16 — real
    SD3.5-era / redistributed-T5 checkpoints ship bf16 shards, so first
    contact with one must not fail). BF16 buffers are viewed through
    ``ml_dtypes.bfloat16`` (jax's own extension dtype — ``jnp.asarray``
    consumes it zero-copy). The file is memory-mapped: a 4.5 GB T5 shard
    pages in lazily instead of doubling host RAM."""
    import mmap

    import ml_dtypes

    with open(path, "rb") as f:
        buf = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    out: dict[str, Array] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        tag = meta["dtype"]
        if tag == "BF16":
            dt = np.dtype(ml_dtypes.bfloat16)
        elif tag in ("F8_E4M3", "F8_E5M2"):
            dt = np.dtype(getattr(ml_dtypes,
                                  "float8_e4m3fn" if tag == "F8_E4M3"
                                  else "float8_e5m2"))
        elif tag in _ST_NUMPY_DTYPES:
            dt = np.dtype(_ST_NUMPY_DTYPES[tag])
        else:
            raise NotImplementedError(f"safetensors dtype {tag} in {path}")
        o0, o1 = meta["data_offsets"]
        count = (o1 - o0) // dt.itemsize
        out[name] = np.frombuffer(buf, dtype=dt, count=count,
                                  offset=base + o0).reshape(meta["shape"])
    return out


def load_state_dict(path: str) -> dict[str, Array]:
    """Load a flat {key: np.ndarray} state dict from .safetensors/.pt/.bin."""
    if path.endswith(".safetensors"):
        header, base = _read_safetensors_header(path)
        tags = {m["dtype"] for k, m in header.items() if k != "__metadata__"}
        if tags <= set(_ST_NUMPY_DTYPES):
            from safetensors.numpy import load_file
            return dict(load_file(path))
        return _load_safetensors_raw(path, header, base)
    obj = load_pt(path)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: np.asarray(v) for k, v in obj.items()}


def load_sharded_state_dict(model_dir: str) -> dict[str, Array]:
    """Load the .safetensors shard set of a HF model directory.

    Real HF directories need two idioms beyond a bare glob: a
    ``*.safetensors.index.json`` names the exact shard set (sharded T5 in
    SD3 repos), and precision variants (``model.fp16.safetensors``,
    ``*.non_ema.*``) sit NEXT TO the base weights — merging those into one
    dict would interleave dtypes, so when base files exist the variants are
    skipped (diffusers' from_pretrained picks one variant the same way)."""
    import json

    names = sorted(os.listdir(model_dir))
    is_variant = lambda n: any(f".{v}." in n for v in ("fp16", "non_ema"))
    index = [n for n in names if n.endswith(".safetensors.index.json")]
    # Base-wins applies to index files too: sorted() puts
    # model.fp16.safetensors.index.json BEFORE model.safetensors.index.json,
    # so without this filter a variant index silently shadows the base one.
    if any(not is_variant(n) for n in index):
        index = [n for n in index if not is_variant(n)]
    if index:
        with open(os.path.join(model_dir, index[0])) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
        out: dict[str, Array] = {}
        for fname in shards:
            out.update(load_state_dict(os.path.join(model_dir, fname)))
        return out

    st = [n for n in names if n.endswith(".safetensors")]
    if any(not is_variant(n) for n in st):
        st = [n for n in st if not is_variant(n)]
    out = {}
    for fname in st:
        out.update(load_state_dict(os.path.join(model_dir, fname)))
    if not out:
        for fname in names:
            if fname.endswith((".bin", ".pt")):
                out.update(load_state_dict(os.path.join(model_dir, fname)))
    return out


def _lin(sd: StateDict, key: str, bias: bool = True) -> dict:
    out = {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T)}
    if bias and f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _conv(sd: StateDict, key: str) -> dict:
    w = sd[f"{key}.weight"]
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _gn(sd: StateDict, key: str) -> dict:
    return {"GroupNorm_0": {"scale": sd[f"{key}.weight"],
                            "bias": sd[f"{key}.bias"]}}


def _ln(sd: StateDict, key: str) -> dict:
    return {"LayerNorm_0": {"scale": sd[f"{key}.weight"],
                            "bias": sd[f"{key}.bias"]}}


def _attn(sd: StateDict, key: str, out_key: str = "to_out.0") -> dict:
    return {"to_q": _lin(sd, f"{key}.to_q"),
            "to_k": _lin(sd, f"{key}.to_k"),
            "to_v": _lin(sd, f"{key}.to_v"),
            "to_out": _lin(sd, f"{key}.{out_key}")}


# ---------------------------------------------------------------------------
# CLIP text encoder (HF transformers CLIPTextModel[WithProjection] keys)
# ---------------------------------------------------------------------------


def convert_clip_text(sd: StateDict, cfg: CLIPTextConfig) -> dict:
    p = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    params: dict = {
        "token_embedding": {
            "embedding": sd[f"{p}embeddings.token_embedding.weight"]},
        "position_embedding": sd[f"{p}embeddings.position_embedding.weight"],
        "final_layer_norm": _ln(sd, f"{p}final_layer_norm"),
    }
    if "text_projection.weight" in sd:
        params["text_projection"] = {
            "kernel": np.ascontiguousarray(sd["text_projection.weight"].T)}
    else:  # checkpoint without projection head (SD-v1 text encoder)
        params["text_projection"] = {
            "kernel": np.eye(cfg.hidden_size, cfg.projection_dim,
                             dtype=np.float32)}
    for i in range(cfg.num_layers):
        lk = f"{p}encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "layer_norm1": _ln(sd, f"{lk}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{lk}.layer_norm2"),
            "self_attn": {
                "to_q": _lin(sd, f"{lk}.self_attn.q_proj"),
                "to_k": _lin(sd, f"{lk}.self_attn.k_proj"),
                "to_v": _lin(sd, f"{lk}.self_attn.v_proj"),
                "to_out": _lin(sd, f"{lk}.self_attn.out_proj"),
            },
            "mlp_fc1": _lin(sd, f"{lk}.mlp.fc1"),
            "mlp_fc2": _lin(sd, f"{lk}.mlp.fc2"),
        }
    return {"params": params}


def convert_clip_vision(sd: StateDict, cfg) -> dict:
    """HF transformers CLIPVisionModel[WithProjection] keys → CLIPVisionModel."""
    p = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    # HF ships the pre-LN under a historical typo key ("pre_layrnorm")
    pre_key = f"{p}pre_layrnorm" if f"{p}pre_layrnorm.weight" in sd \
        else f"{p}pre_layernorm"
    params: dict = {
        "class_embedding": sd[f"{p}embeddings.class_embedding"].reshape(-1),
        "position_embedding": sd[f"{p}embeddings.position_embedding.weight"],
        "patch_embedding": _conv(sd, f"{p}embeddings.patch_embedding"),
        "pre_layernorm": _ln(sd, pre_key),
        "post_layernorm": _ln(sd, f"{p}post_layernorm"),
    }
    if "visual_projection.weight" in sd:
        params["visual_projection"] = {
            "kernel": np.ascontiguousarray(sd["visual_projection.weight"].T)}
    else:
        params["visual_projection"] = {
            "kernel": np.eye(cfg.hidden_size, cfg.projection_dim,
                             dtype=np.float32)}
    for i in range(cfg.num_layers):
        lk = f"{p}encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "layer_norm1": _ln(sd, f"{lk}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{lk}.layer_norm2"),
            "self_attn": {
                "to_q": _lin(sd, f"{lk}.self_attn.q_proj"),
                "to_k": _lin(sd, f"{lk}.self_attn.k_proj"),
                "to_v": _lin(sd, f"{lk}.self_attn.v_proj"),
                "to_out": _lin(sd, f"{lk}.self_attn.out_proj"),
            },
            "mlp_fc1": _lin(sd, f"{lk}.mlp.fc1"),
            "mlp_fc2": _lin(sd, f"{lk}.mlp.fc2"),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# T5 encoder (HF transformers T5EncoderModel keys)
# ---------------------------------------------------------------------------


def convert_t5(sd: StateDict, cfg: T5Config) -> dict:
    p = "encoder." if any(k.startswith("encoder.") for k in sd) else ""
    embed_key = "shared.weight" if "shared.weight" in sd else f"{p}embed_tokens.weight"
    params: dict = {
        "token_embedding": {"embedding": sd[embed_key]},
        "relative_attention_bias": sd[
            f"{p}block.0.layer.0.SelfAttention.relative_attention_bias.weight"],
        "final_layer_norm": {"scale": sd[f"{p}final_layer_norm.weight"]},
    }
    for i in range(cfg.num_layers):
        lk = f"{p}block.{i}"
        params[f"blocks_{i}"] = {
            "ln_attn": {"scale": sd[f"{lk}.layer.0.layer_norm.weight"]},
            "attn": {
                "q": _lin(sd, f"{lk}.layer.0.SelfAttention.q", bias=False),
                "k": _lin(sd, f"{lk}.layer.0.SelfAttention.k", bias=False),
                "v": _lin(sd, f"{lk}.layer.0.SelfAttention.v", bias=False),
                "o": _lin(sd, f"{lk}.layer.0.SelfAttention.o", bias=False),
            },
            "ln_ff": {"scale": sd[f"{lk}.layer.1.layer_norm.weight"]},
            "wi_0": _lin(sd, f"{lk}.layer.1.DenseReluDense.wi_0", bias=False),
            "wi_1": _lin(sd, f"{lk}.layer.1.DenseReluDense.wi_1", bias=False),
            "wo": _lin(sd, f"{lk}.layer.1.DenseReluDense.wo", bias=False),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# OpenCLIP / OpenAI-CLIP checkpoints (reference vendors the full OpenCLIP
# fork, open_clip/; used by run_coco30k.py's ViT-H-14 scorer and clip.load)
# ---------------------------------------------------------------------------


def _openclip_layer(sd: StateDict, lk: str) -> dict:
    inw = sd[f"{lk}.attn.in_proj_weight"]
    inb = sd[f"{lk}.attn.in_proj_bias"]
    d = inw.shape[0] // 3
    qw, kw, vw = inw[:d], inw[d:2 * d], inw[2 * d:]
    qb, kb, vb = inb[:d], inb[d:2 * d], inb[2 * d:]
    return {
        "layer_norm1": {"LayerNorm_0": {"scale": sd[f"{lk}.ln_1.weight"],
                                        "bias": sd[f"{lk}.ln_1.bias"]}},
        "layer_norm2": {"LayerNorm_0": {"scale": sd[f"{lk}.ln_2.weight"],
                                        "bias": sd[f"{lk}.ln_2.bias"]}},
        "self_attn": {
            "to_q": {"kernel": np.ascontiguousarray(qw.T), "bias": qb},
            "to_k": {"kernel": np.ascontiguousarray(kw.T), "bias": kb},
            "to_v": {"kernel": np.ascontiguousarray(vw.T), "bias": vb},
            "to_out": _lin(sd, f"{lk}.attn.out_proj"),
        },
        "mlp_fc1": _lin(sd, f"{lk}.mlp.c_fc"),
        "mlp_fc2": _lin(sd, f"{lk}.mlp.c_proj"),
    }


def convert_open_clip_vision(sd: StateDict, cfg) -> dict:
    """OpenCLIP/OpenAI-CLIP `visual.*` keys → CLIPVisionModel params
    (packed in_proj qkv split; visual.proj matrix used directly)."""
    p = "visual."
    params: dict = {
        "class_embedding": np.asarray(sd[f"{p}class_embedding"]).reshape(-1),
        "position_embedding": sd[f"{p}positional_embedding"],
        "patch_embedding": {"kernel": np.ascontiguousarray(
            np.transpose(sd[f"{p}conv1.weight"], (2, 3, 1, 0)))},
        "pre_layernorm": {"LayerNorm_0": {"scale": sd[f"{p}ln_pre.weight"],
                                          "bias": sd[f"{p}ln_pre.bias"]}},
        "post_layernorm": {"LayerNorm_0": {"scale": sd[f"{p}ln_post.weight"],
                                           "bias": sd[f"{p}ln_post.bias"]}},
        "visual_projection": {"kernel": np.asarray(sd[f"{p}proj"])},
    }
    for i in range(cfg.num_layers):
        params[f"layers_{i}"] = _openclip_layer(
            sd, f"{p}transformer.resblocks.{i}")
    return {"params": params}


def convert_open_clip_text(sd: StateDict, cfg) -> dict:
    """OpenCLIP/OpenAI-CLIP text-tower keys → CLIPTextModel params."""
    params: dict = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "position_embedding": sd["positional_embedding"],
        "final_layer_norm": {"LayerNorm_0": {"scale": sd["ln_final.weight"],
                                             "bias": sd["ln_final.bias"]}},
        "text_projection": {"kernel": np.asarray(sd["text_projection"])},
    }
    for i in range(cfg.num_layers):
        params[f"layers_{i}"] = _openclip_layer(
            sd, f"transformer.resblocks.{i}")
    return {"params": params}


# ---------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL keys)
# ---------------------------------------------------------------------------


def _resnet(sd: StateDict, key: str) -> dict:
    out = {"norm1": _gn(sd, f"{key}.norm1"), "conv1": _conv(sd, f"{key}.conv1"),
           "norm2": _gn(sd, f"{key}.norm2"), "conv2": _conv(sd, f"{key}.conv2")}
    if f"{key}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{key}.conv_shortcut")
    if f"{key}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _lin(sd, f"{key}.time_emb_proj")
    return out


def _vae_attn(sd: StateDict, key: str) -> dict:
    """The 2022-era SD-1.x hub ``vae/diffusion_pytorch_model.bin`` files
    (what the reference's diffusers ``from_pretrained`` downloads,
    run_nudity.py:105-136) carry the LEGACY diffusers AttentionBlock naming
    ``query/key/value/proj_attn``; diffusers remaps them on load
    (``_convert_deprecated_attention_blocks``). Accept both spellings —
    all four are plain [C, C] Linears in either era."""
    if f"{key}.to_q.weight" in sd:
        return _attn(sd, key)
    return {"to_q": _lin(sd, f"{key}.query"),
            "to_k": _lin(sd, f"{key}.key"),
            "to_v": _lin(sd, f"{key}.value"),
            "to_out": _lin(sd, f"{key}.proj_attn")}


def _vae_mid(sd: StateDict, key: str) -> dict:
    return {
        "resnets_0": _resnet(sd, f"{key}.resnets.0"),
        "resnets_1": _resnet(sd, f"{key}.resnets.1"),
        "attentions_0": {
            "group_norm": _gn(sd, f"{key}.attentions.0.group_norm"),
            "attention": _vae_attn(sd, f"{key}.attentions.0"),
        },
    }


def convert_vae(sd: StateDict, cfg: VAEConfig) -> dict:
    n = len(cfg.block_out_channels)
    enc: dict = {"conv_in": _conv(sd, "encoder.conv_in"),
                 "mid_block": _vae_mid(sd, "encoder.mid_block"),
                 "conv_norm_out": _gn(sd, "encoder.conv_norm_out"),
                 "conv_out": _conv(sd, "encoder.conv_out")}
    for i in range(n):
        for j in range(cfg.layers_per_block):
            enc[f"down_{i}_resnets_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")}
    dec: dict = {"conv_in": _conv(sd, "decoder.conv_in"),
                 "mid_block": _vae_mid(sd, "decoder.mid_block"),
                 "conv_norm_out": _gn(sd, "decoder.conv_norm_out"),
                 "conv_out": _conv(sd, "decoder.conv_out")}
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{i}_resnets_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n - 1:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")}
    params = {"encoder": enc, "decoder": dec}
    if cfg.use_quant_conv:
        params["quant_conv"] = _conv(sd, "quant_conv")   # KeyError = loud
    if cfg.use_post_quant_conv:
        params["post_quant_conv"] = _conv(sd, "post_quant_conv")
    return {"params": params}


# ---------------------------------------------------------------------------
# SD UNet (diffusers UNet2DConditionModel keys)
# ---------------------------------------------------------------------------


def _transformer2d(sd: StateDict, key: str, n_layers: int) -> dict:
    out = {"norm": _gn(sd, f"{key}.norm"),
           "proj_in": _conv(sd, f"{key}.proj_in"),
           "proj_out": _conv(sd, f"{key}.proj_out")}
    for k in range(n_layers):
        bk = f"{key}.transformer_blocks.{k}"
        out[f"blocks_{k}"] = {
            "norm1": _ln(sd, f"{bk}.norm1"),
            "norm2": _ln(sd, f"{bk}.norm2"),
            "norm3": _ln(sd, f"{bk}.norm3"),
            "attn1": _attn(sd, f"{bk}.attn1"),
            "attn2": _attn(sd, f"{bk}.attn2"),
            "ff": {"net_0": {"proj": _lin(sd, f"{bk}.ff.net.0.proj")},
                   "net_2": _lin(sd, f"{bk}.ff.net.2")},
        }
    return out


def convert_unet(sd: StateDict, cfg: UNetConfig) -> dict:
    n = len(cfg.block_out_channels)
    params: dict = {
        "conv_in": _conv(sd, "conv_in"),
        "time_emb_1": _lin(sd, "time_embedding.linear_1"),
        "time_emb_2": _lin(sd, "time_embedding.linear_2"),
        "conv_norm_out": _gn(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "mid_resnets_0": _resnet(sd, "mid_block.resnets.0"),
        "mid_resnets_1": _resnet(sd, "mid_block.resnets.1"),
        "mid_attentions_0": _transformer2d(sd, "mid_block.attentions.0",
                                           cfg.transformer_layers),
    }
    for i in range(n):
        has_attn = i < n - 1
        for j in range(cfg.layers_per_block):
            params[f"down_{i}_resnets_{j}"] = _resnet(
                sd, f"down_blocks.{i}.resnets.{j}")
            if has_attn:
                params[f"down_{i}_attentions_{j}"] = _transformer2d(
                    sd, f"down_blocks.{i}.attentions.{j}",
                    cfg.transformer_layers)
        if i < n - 1:
            params[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")}
    for i in range(n):
        has_attn = i > 0  # up_blocks.0 is the plain UpBlock2D in SD-v1
        for j in range(cfg.layers_per_block + 1):
            params[f"up_{i}_resnets_{j}"] = _resnet(
                sd, f"up_blocks.{i}.resnets.{j}")
            if has_attn:
                params[f"up_{i}_attentions_{j}"] = _transformer2d(
                    sd, f"up_blocks.{i}.attentions.{j}",
                    cfg.transformer_layers)
        if i < n - 1:
            params[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")}
    return {"params": params}


# ---------------------------------------------------------------------------
# SD3 MMDiT (diffusers SD3Transformer2DModel keys)
# ---------------------------------------------------------------------------


def convert_mmdit(sd: StateDict, cfg: MMDiTConfig) -> dict:
    params: dict = {
        "pos_embed_proj": _conv(sd, "pos_embed.proj"),
        "time_embed_1": _lin(sd, "time_text_embed.timestep_embedder.linear_1"),
        "time_embed_2": _lin(sd, "time_text_embed.timestep_embedder.linear_2"),
        "text_embed_1": _lin(sd, "time_text_embed.text_embedder.linear_1"),
        "text_embed_2": _lin(sd, "time_text_embed.text_embedder.linear_2"),
        "context_embedder": _lin(sd, "context_embedder"),
        "norm_out": {"linear": _lin(sd, "norm_out.linear")},
        "proj_out": _lin(sd, "proj_out"),
    }
    for i in range(cfg.num_layers):
        bk = f"transformer_blocks.{i}"
        last = i == cfg.num_layers - 1
        blk: dict = {
            "norm1": {"linear": _lin(sd, f"{bk}.norm1.linear")},
            "norm1_context": {"linear": _lin(sd, f"{bk}.norm1_context.linear")},
            "attn_q": _lin(sd, f"{bk}.attn.to_q"),
            "attn_k": _lin(sd, f"{bk}.attn.to_k"),
            "attn_v": _lin(sd, f"{bk}.attn.to_v"),
            "attn_add_q": _lin(sd, f"{bk}.attn.add_q_proj"),
            "attn_add_k": _lin(sd, f"{bk}.attn.add_k_proj"),
            "attn_add_v": _lin(sd, f"{bk}.attn.add_v_proj"),
            "attn_to_out": _lin(sd, f"{bk}.attn.to_out.0"),
            "ff": {"fc1": _lin(sd, f"{bk}.ff.net.0.proj"),
                   "fc2": _lin(sd, f"{bk}.ff.net.2")},
        }
        if cfg.qk_norm == "rms_norm":
            blk["attn_norm_q"] = {"scale": sd[f"{bk}.attn.norm_q.weight"]}
            blk["attn_norm_k"] = {"scale": sd[f"{bk}.attn.norm_k.weight"]}
            blk["attn_add_norm_q"] = {"scale": sd[f"{bk}.attn.norm_added_q.weight"]}
            blk["attn_add_norm_k"] = {"scale": sd[f"{bk}.attn.norm_added_k.weight"]}
        if not last:
            blk["attn_to_add_out"] = _lin(sd, f"{bk}.attn.to_add_out")
            blk["ff_context"] = {"fc1": _lin(sd, f"{bk}.ff_context.net.0.proj"),
                                 "fc2": _lin(sd, f"{bk}.ff_context.net.2")}
        params[f"blocks_{i}"] = blk
    return {"params": params}
