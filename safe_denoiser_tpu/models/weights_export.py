"""Test helpers: invert the weight converters (Flax params → torch-style
state dicts) so tests can fabricate authentic HF-layout checkpoints and
round-trip them through models.weights converters."""

import numpy as np


def _inv_lin(node, key, sd):
    sd[f"{key}.weight"] = np.ascontiguousarray(np.asarray(node["kernel"]).T)
    if "bias" in node:
        sd[f"{key}.bias"] = np.asarray(node["bias"])


def _inv_conv(node, key, sd):
    sd[f"{key}.weight"] = np.ascontiguousarray(
        np.transpose(np.asarray(node["kernel"]), (3, 2, 0, 1)))
    if "bias" in node:
        sd[f"{key}.bias"] = np.asarray(node["bias"])


def _inv_gn(node, key, sd):
    inner = node["GroupNorm_0"]
    sd[f"{key}.weight"] = np.asarray(inner["scale"])
    sd[f"{key}.bias"] = np.asarray(inner["bias"])


def _inv_ln(node, key, sd):
    inner = node["LayerNorm_0"]
    sd[f"{key}.weight"] = np.asarray(inner["scale"])
    sd[f"{key}.bias"] = np.asarray(inner["bias"])


def _inv_attn(node, key, sd, out_key="to_out.0"):
    _inv_lin(node["to_q"], f"{key}.to_q", sd)
    _inv_lin(node["to_k"], f"{key}.to_k", sd)
    _inv_lin(node["to_v"], f"{key}.to_v", sd)
    _inv_lin(node["to_out"], f"{key}.{out_key}", sd)


def _inv_resnet(node, key, sd):
    _inv_gn(node["norm1"], f"{key}.norm1", sd)
    _inv_conv(node["conv1"], f"{key}.conv1", sd)
    _inv_gn(node["norm2"], f"{key}.norm2", sd)
    _inv_conv(node["conv2"], f"{key}.conv2", sd)
    if "conv_shortcut" in node:
        _inv_conv(node["conv_shortcut"], f"{key}.conv_shortcut", sd)
    if "time_emb_proj" in node:
        _inv_lin(node["time_emb_proj"], f"{key}.time_emb_proj", sd)


def _inv_transformer2d(node, key, sd, n_layers=1):
    _inv_gn(node["norm"], f"{key}.norm", sd)
    _inv_conv(node["proj_in"], f"{key}.proj_in", sd)
    _inv_conv(node["proj_out"], f"{key}.proj_out", sd)
    for k in range(n_layers):
        bk = f"{key}.transformer_blocks.{k}"
        blk = node[f"blocks_{k}"]
        _inv_ln(blk["norm1"], f"{bk}.norm1", sd)
        _inv_ln(blk["norm2"], f"{bk}.norm2", sd)
        _inv_ln(blk["norm3"], f"{bk}.norm3", sd)
        _inv_attn(blk["attn1"], f"{bk}.attn1", sd)
        _inv_attn(blk["attn2"], f"{bk}.attn2", sd)
        _inv_lin(blk["ff"]["net_0"]["proj"], f"{bk}.ff.net.0.proj", sd)
        _inv_lin(blk["ff"]["net_2"], f"{bk}.ff.net.2", sd)


def invert_unet(params, cfg) -> dict:
    sd: dict = {}
    n = len(cfg.block_out_channels)
    _inv_conv(params["conv_in"], "conv_in", sd)
    _inv_lin(params["time_emb_1"], "time_embedding.linear_1", sd)
    _inv_lin(params["time_emb_2"], "time_embedding.linear_2", sd)
    _inv_gn(params["conv_norm_out"], "conv_norm_out", sd)
    _inv_conv(params["conv_out"], "conv_out", sd)
    _inv_resnet(params["mid_resnets_0"], "mid_block.resnets.0", sd)
    _inv_resnet(params["mid_resnets_1"], "mid_block.resnets.1", sd)
    _inv_transformer2d(params["mid_attentions_0"], "mid_block.attentions.0",
                       sd, cfg.transformer_layers)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _inv_resnet(params[f"down_{i}_resnets_{j}"],
                        f"down_blocks.{i}.resnets.{j}", sd)
            if i < n - 1:
                _inv_transformer2d(params[f"down_{i}_attentions_{j}"],
                                   f"down_blocks.{i}.attentions.{j}", sd,
                                   cfg.transformer_layers)
        if i < n - 1:
            _inv_conv(params[f"down_{i}_downsample"]["conv"],
                      f"down_blocks.{i}.downsamplers.0.conv", sd)
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            _inv_resnet(params[f"up_{i}_resnets_{j}"],
                        f"up_blocks.{i}.resnets.{j}", sd)
            if i > 0:
                _inv_transformer2d(params[f"up_{i}_attentions_{j}"],
                                   f"up_blocks.{i}.attentions.{j}", sd,
                                   cfg.transformer_layers)
        if i < n - 1:
            _inv_conv(params[f"up_{i}_upsample"]["conv"],
                      f"up_blocks.{i}.upsamplers.0.conv", sd)
    return sd


def _inv_vae_mid(node, key, sd):
    _inv_resnet(node["resnets_0"], f"{key}.resnets.0", sd)
    _inv_resnet(node["resnets_1"], f"{key}.resnets.1", sd)
    _inv_gn(node["attentions_0"]["group_norm"],
            f"{key}.attentions.0.group_norm", sd)
    _inv_attn(node["attentions_0"]["attention"], f"{key}.attentions.0", sd)


def invert_vae(params, cfg) -> dict:
    sd: dict = {}
    n = len(cfg.block_out_channels)
    enc = params["encoder"]
    _inv_conv(enc["conv_in"], "encoder.conv_in", sd)
    _inv_vae_mid(enc["mid_block"], "encoder.mid_block", sd)
    _inv_gn(enc["conv_norm_out"], "encoder.conv_norm_out", sd)
    _inv_conv(enc["conv_out"], "encoder.conv_out", sd)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _inv_resnet(enc[f"down_{i}_resnets_{j}"],
                        f"encoder.down_blocks.{i}.resnets.{j}", sd)
        if i < n - 1:
            _inv_conv(enc[f"down_{i}_downsample"]["conv"],
                      f"encoder.down_blocks.{i}.downsamplers.0.conv", sd)
    dec = params["decoder"]
    _inv_conv(dec["conv_in"], "decoder.conv_in", sd)
    _inv_vae_mid(dec["mid_block"], "decoder.mid_block", sd)
    _inv_gn(dec["conv_norm_out"], "decoder.conv_norm_out", sd)
    _inv_conv(dec["conv_out"], "decoder.conv_out", sd)
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            _inv_resnet(dec[f"up_{i}_resnets_{j}"],
                        f"decoder.up_blocks.{i}.resnets.{j}", sd)
        if i < n - 1:
            _inv_conv(dec[f"up_{i}_upsample"]["conv"],
                      f"decoder.up_blocks.{i}.upsamplers.0.conv", sd)
    if "quant_conv" in params:
        _inv_conv(params["quant_conv"], "quant_conv", sd)
    if "post_quant_conv" in params:
        _inv_conv(params["post_quant_conv"], "post_quant_conv", sd)
    return sd


def invert_mmdit(params, cfg) -> dict:
    """MMDiT Flax params → diffusers SD3Transformer2DModel state dict."""
    sd: dict = {}
    _inv_conv(params["pos_embed_proj"], "pos_embed.proj", sd)
    _inv_lin(params["time_embed_1"], "time_text_embed.timestep_embedder.linear_1", sd)
    _inv_lin(params["time_embed_2"], "time_text_embed.timestep_embedder.linear_2", sd)
    _inv_lin(params["text_embed_1"], "time_text_embed.text_embedder.linear_1", sd)
    _inv_lin(params["text_embed_2"], "time_text_embed.text_embedder.linear_2", sd)
    _inv_lin(params["context_embedder"], "context_embedder", sd)
    _inv_lin(params["norm_out"]["linear"], "norm_out.linear", sd)
    _inv_lin(params["proj_out"], "proj_out", sd)
    for i in range(cfg.num_layers):
        bk = f"transformer_blocks.{i}"
        blk = params[f"blocks_{i}"]
        last = i == cfg.num_layers - 1
        _inv_lin(blk["norm1"]["linear"], f"{bk}.norm1.linear", sd)
        _inv_lin(blk["norm1_context"]["linear"], f"{bk}.norm1_context.linear", sd)
        _inv_lin(blk["attn_q"], f"{bk}.attn.to_q", sd)
        _inv_lin(blk["attn_k"], f"{bk}.attn.to_k", sd)
        _inv_lin(blk["attn_v"], f"{bk}.attn.to_v", sd)
        _inv_lin(blk["attn_add_q"], f"{bk}.attn.add_q_proj", sd)
        _inv_lin(blk["attn_add_k"], f"{bk}.attn.add_k_proj", sd)
        _inv_lin(blk["attn_add_v"], f"{bk}.attn.add_v_proj", sd)
        _inv_lin(blk["attn_to_out"], f"{bk}.attn.to_out.0", sd)
        _inv_lin(blk["ff"]["fc1"], f"{bk}.ff.net.0.proj", sd)
        _inv_lin(blk["ff"]["fc2"], f"{bk}.ff.net.2", sd)
        if not last:
            _inv_lin(blk["attn_to_add_out"], f"{bk}.attn.to_add_out", sd)
            _inv_lin(blk["ff_context"]["fc1"], f"{bk}.ff_context.net.0.proj", sd)
            _inv_lin(blk["ff_context"]["fc2"], f"{bk}.ff_context.net.2", sd)
    return sd
