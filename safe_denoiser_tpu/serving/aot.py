"""AOT deployment bundles: serialize the compiled generation programs.

Beyond-reference deployment surface. A bundle captures the three device
programs of a ``SafeDiffusionPipeline`` serving configuration — text
encode, the 50-step sampling scan, and the VAE decode — as
``jax.export`` artifacts (StableHLO + calling convention), with every
static (batch size, step count, erase spec, repellency config, window,
image size) baked in at export time. Weights are NOT baked in: params
stay call-time inputs (the same design rule as the live pipeline —
closing over an 860M-param UNet inlines it into the HLO and blows the
compile request limit, pipeline/diffusion.py:289-294), so the artifact is
megabytes, not gigabytes, and one artifact serves many fine-tuned/erased
checkpoints of the same architecture.

Production story: ``serve.py --aot_bundle bundle.sdt`` starts without any
Flax tracing — tokenize on host, then ``Exported.call`` per program.
Caveats (inherent to jax.export): a bundle is platform-locked (a TPU
bundle will not run on CPU and vice versa — recorded in meta and checked
at load), and the sampling program contains Mosaic (Pallas) custom calls
whose stability across major runtime upgrades is not guaranteed; we opt
in via DisabledSafetyCheck and record the jax version in meta.
"""

from __future__ import annotations

import dataclasses
import io
import json
import zipfile
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_PROGRAMS = ("text_encode", "sample", "decode")
_SD3_PROGRAMS = ("encode", "sample", "decode")


def _struct_of(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        tree)


@dataclasses.dataclass
class AotBundle:
    """Three exported programs + the static serving configuration."""

    text_encode: Any  # jax.export.Exported
    sample: Any
    decode: Any
    meta: dict

    # ---- generation --------------------------------------------------
    def generate(self, unet_params, vae_params, text_params, tokenizer,
                 prompts: Sequence[str], seeds: Sequence[int],
                 guidance_scales: Sequence[float],
                 negative_prompt: Optional[str] = None,
                 refs=None) -> list:
        """Batched generation through the exported programs only (no Flax
        tracing). Mirrors ``SafeDiffusionPipeline.generate_batch`` for the
        erase spec the bundle was exported with (text-method 'none'
        specs; SAFREE/SLD text prep is host logic that needs the live
        pipeline). Returns a list of uint8 [H, W, 3] images.
        """
        if self.meta.get("text_method", "none") != "none":
            raise ValueError(
                f"bundle was exported for text_method "
                f"{self.meta['text_method']!r}: its SAFREE/SLD text prep is "
                "live host logic — prepare embeddings with the live "
                "pipeline and call generate_prepared() instead")
        b = int(self.meta["batch_size"])
        if len(prompts) != b:
            raise ValueError(
                f"bundle compiled for batch {b}, got {len(prompts)} prompts "
                "(pad or re-export)")
        max_length = int(self.meta["max_length"])
        enc = tokenizer(list(prompts), padding="max_length",
                        max_length=max_length)
        ids_c = jnp.asarray(enc["input_ids"])
        un = tokenizer([negative_prompt or ""] * b, padding="max_length",
                       max_length=max_length)
        ids_u = jnp.asarray(un["input_ids"])
        emb_c = self.text_encode.call(text_params, ids_c)[0]
        emb_u = self.text_encode.call(text_params, ids_u)[0]
        text_embeds = jnp.stack([emb_u, emb_c])          # [2, B, L, D]
        use_alt = jnp.zeros((int(self.meta["num_inference_steps"]), b),
                            dtype=bool)
        return self.generate_prepared(
            unet_params, vae_params, text_embeds, text_embeds, use_alt,
            seeds, guidance_scales, refs=refs)

    def generate_prepared(self, unet_params, vae_params, text_embeds,
                          text_embeds_alt, use_alt,
                          seeds: Sequence[int],
                          guidance_scales: Sequence[float],
                          refs=None) -> list:
        """Generation from ALREADY-PREPARED embeddings — the serving path
        for safree/sld erase ids: their text prep (SAFREE projection /
        SLD safety-concept encode) is live host logic on the small text
        tower, while the expensive 50-step sampling scan and the VAE decode
        run from the exported artifact. ``text_embeds``/``text_embeds_alt``:
        [branches, B, L, D]; ``use_alt``: [steps, B] bool (the SAFREE
        adaptive window)."""
        branches = int(self.meta.get("branches", 2))
        if int(text_embeds.shape[0]) != branches:
            raise ValueError(
                f"bundle exported for {branches} guidance branches "
                f"(text_method {self.meta.get('text_method', 'none')!r}), "
                f"got text_embeds with {text_embeds.shape[0]}")
        if (refs is None) != bool(self.meta.get("refs_none", True)):
            raise ValueError(
                "bundle exported with"
                + ("out" if self.meta.get("refs_none", True) else "")
                + " a repellency bank; call-time refs must match")
        latents, _applied = self.sample.call(
            unet_params, jnp.asarray(text_embeds),
            jnp.asarray(text_embeds_alt), jnp.asarray(use_alt),
            None if refs is None else jnp.asarray(refs),
            jnp.asarray(list(seeds), dtype=jnp.uint32),
            jnp.asarray(list(guidance_scales), dtype=jnp.float32))
        image = self.decode.call(
            vae_params, latents / float(self.meta["vae_scaling_factor"]))
        image = np.asarray((image / 2 + 0.5).clip(0, 1))
        return [(img * 255).round().astype(np.uint8) for img in image]


def export_pipeline(pipe, batch_size: int, num_inference_steps: int = 50,
                    height: int = 512, width: int = 512,
                    erase_spec=None, repellency_cfg=None, refs=None,
                    guidance=None, freeu=None,
                    safe_level: str = "STRONG") -> AotBundle:
    """Export a serving configuration of ``pipe`` to an :class:`AotBundle`.

    ``refs``: pass the (host) repellency bank array to bake its SHAPE into
    the sampling program (the bank itself remains a call-time input);
    ``repellency_cfg``/``erase_spec.window`` statics come along. With
    ``refs=None`` the exported program has no repellency inputs.

    Text methods: 'none' specs export the 2-branch CFG program served by
    :meth:`AotBundle.generate`. 'sld' bakes the 3-branch SLD momentum
    guidance (``safe_level`` selects the SLD_CONFIGS row); 'safree' keeps
    the 2-branch layout with the alt-embeddings/adaptive-window inputs
    live — both are served via :meth:`AotBundle.generate_prepared` with
    host-side text prep (reference SD3 pipeline surface
    models/sdv3/safe_denoiser_pipeline.py:862).
    """
    from ..pipeline.diffusion import ERASE_SPECS, GuidanceConfig, SLD_CONFIGS
    from ..models.vae import AutoencoderKL

    erase_spec = erase_spec or ERASE_SPECS["std"]
    if guidance is None:
        if erase_spec.text_method == "sld":
            guidance = GuidanceConfig(mode="sld", **SLD_CONFIGS[safe_level])
        else:
            guidance = GuidanceConfig()
    branches = guidance.branches
    export = jax.export.export  # jax >= 0.4.30 stable surface
    checks = [jax.export.DisabledSafetyCheck.custom_call(t)
              for t in ("tpu_custom_call", "Sharding")]

    max_length = pipe.tokenizer.model_max_length
    d = pipe.text_encoder.config.hidden_size
    lshape = jax.ShapeDtypeStruct((branches, batch_size, max_length, d),
                                  jnp.float32)
    ids_s = jax.ShapeDtypeStruct((batch_size, max_length), jnp.int32)
    use_alt_s = jax.ShapeDtypeStruct((num_inference_steps, batch_size),
                                     jnp.bool_)
    seeds_s = jax.ShapeDtypeStruct((batch_size,), jnp.uint32)
    gs_s = jax.ShapeDtypeStruct((batch_size,), jnp.float32)
    refs_s = None if refs is None else _struct_of(refs)

    text_exp = export(
        jax.jit(lambda p, ids: pipe.text_encoder.apply(p, ids)),
        disabled_checks=checks)(_struct_of(pipe.text_params), ids_s)
    sample_exp = export(pipe._jitted_sample_fn, disabled_checks=checks)(
        _struct_of(pipe.unet_params), lshape, lshape, use_alt_s, refs_s,
        seeds_s, gs_s, steps=num_inference_steps, guidance=guidance,
        repellency=repellency_cfg, window=erase_spec.window, freeu=freeu,
        height=height, width=width, rep_bank=None)
    lat = jax.ShapeDtypeStruct(
        (batch_size, height // pipe.vae_scale_factor,
         width // pipe.vae_scale_factor, pipe.unet.config.in_channels),
        jnp.float32)
    dec_exp = export(
        jax.jit(lambda p, z: pipe.vae.apply(p, z,
                                            method=AutoencoderKL.decode)),
        disabled_checks=checks)(_struct_of(pipe.vae_params), lat)

    meta = {
        "batch_size": batch_size,
        "num_inference_steps": num_inference_steps,
        "height": height, "width": width,
        "max_length": int(max_length),
        "vae_scaling_factor": float(pipe.vae.config.scaling_factor),
        "refs_none": refs is None,
        # int8 changes the exported sample program's param-tree aval set
        # ({'params','quant'} vs {'params'}): recorded so serve.py refuses
        # a flag-mismatched load instead of a cryptic pytree error
        "int8": "quant" in pipe.unet_params,
        "int8_min_dim": getattr(pipe, "_int8_min_dim", None),
        # the BAKED statics: the exported sampling program runs THESE
        # regardless of what the serving process is configured with —
        # recorded so serve.py can refuse a mismatched --task_config /
        # --erase_id instead of silently serving the export-time behavior
        "erase_spec": dataclasses.asdict(erase_spec),
        "repellency_cfg": (None if repellency_cfg is None
                           else dataclasses.asdict(repellency_cfg)),
        "text_method": erase_spec.text_method,
        "branches": branches,
        "safe_level": (safe_level if erase_spec.text_method == "sld"
                       else None),
        "family": "sd14",
        "platform": jax.devices()[0].platform,
        "jax_version": jax.__version__,
    }
    return AotBundle(text_encode=text_exp, sample=sample_exp, decode=dec_exp,
                     meta=meta)


@dataclasses.dataclass
class AotSd3Bundle:
    """SD3 deployment bundle: triple-text-encode + flow-matching sample +
    1024² VAE decode as exported programs (VERDICT r3 next #3 — the SD3
    serving path previously could not be AOT'd at all). Same weight-
    independence contract as :class:`AotBundle`; the T5-XXL/CLIP towers'
    params stay call-time inputs."""

    encode: Any  # jax.export.Exported: (p_l, p_g, p_t5, ids_l/g/t) -> (emb, pooled)
    sample: Any
    decode: Any
    meta: dict

    def _tokenize(self, tokenizer, tokenizer_2, tokenizer_3, texts):
        clip_len = int(self.meta["clip_max_length"])
        t5_len = int(self.meta["t5_max_length"])
        ids_l = jnp.asarray(tokenizer(list(texts), padding="max_length",
                                      max_length=clip_len)["input_ids"])
        ids_g = jnp.asarray(tokenizer_2(list(texts), padding="max_length",
                                        max_length=clip_len)["input_ids"])
        t5 = tokenizer_3(list(texts), padding="max_length",
                         max_length=t5_len, truncation=True)
        ids_t = jnp.asarray(np.asarray(t5["input_ids"]))
        return ids_l, ids_g, ids_t

    def generate(self, transformer_params, vae_params, clip_l_params,
                 clip_g_params, t5_params, tokenizer, tokenizer_2,
                 tokenizer_3, prompts: Sequence[str], seeds: Sequence[int],
                 guidance_scales: Sequence[float],
                 negative_prompt: Optional[str] = None, refs=None) -> list:
        """Batched SD3 generation through the exported programs only.
        Mirrors ``SafeDiffusion3Pipeline.generate_batch`` for the non-SAFREE
        path (SAFREE's leave-one-out masked T5 encodes are dynamic-shape
        host logic → use the live pipeline + generate_prepared)."""
        b = int(self.meta["batch_size"])
        if len(prompts) != b:
            raise ValueError(
                f"bundle compiled for batch {b}, got {len(prompts)} prompts "
                "(pad or re-export)")
        if negative_prompt is None:
            from ..pipeline.diffusion_sd3 import SD3_NUDITY_NEGATIVE_PROMPT
            negative_prompt = SD3_NUDITY_NEGATIVE_PROMPT
        toks = (tokenizer, tokenizer_2, tokenizer_3)
        emb_c, pooled_c = self.encode.call(
            clip_l_params, clip_g_params, t5_params,
            *self._tokenize(*toks, prompts))
        emb_u, pooled_u = self.encode.call(
            clip_l_params, clip_g_params, t5_params,
            *self._tokenize(*toks, [negative_prompt or ""] * b))
        embeds = jnp.stack([emb_u, emb_c])
        pooled = jnp.stack([pooled_u, pooled_c])
        return self.generate_prepared(transformer_params, vae_params,
                                      embeds, pooled, seeds,
                                      guidance_scales, refs=refs)

    def generate_prepared(self, transformer_params, vae_params, embeds,
                          pooled, seeds: Sequence[int],
                          guidance_scales: Sequence[float],
                          refs=None) -> list:
        """Sample + decode from already-prepared [2, B, L, D] embeddings
        (the SAFREE serving path: live host text prep, exported scan)."""
        if (refs is None) != bool(self.meta.get("refs_none", True)):
            raise ValueError(
                "bundle exported with"
                + ("out" if self.meta.get("refs_none", True) else "")
                + " a repellency bank; call-time refs must match")
        latents, _applied = self.sample.call(
            transformer_params, jnp.asarray(embeds), jnp.asarray(pooled),
            None if refs is None else jnp.asarray(refs),
            jnp.asarray(list(seeds), dtype=jnp.uint32),
            jnp.asarray(list(guidance_scales), dtype=jnp.float32))
        z = latents / float(self.meta["vae_scaling_factor"]) \
            + float(self.meta["vae_shift_factor"])
        image = self.decode.call(vae_params, z)
        image = np.asarray((image / 2 + 0.5).clip(0, 1))
        return [(img * 255).round().astype(np.uint8) for img in image]


def export_pipeline_sd3(pipe, batch_size: int,
                        num_inference_steps: int = 50,
                        height: int = 1024, width: int = 1024,
                        repellency_cfg=None, refs=None,
                        window=None) -> AotSd3Bundle:
    """Export a ``SafeDiffusion3Pipeline`` serving configuration.

    ``repellency_cfg``: pass the processor's config; the fast_sdv3 parity
    substitutions (sigma=1.0, normalize_x, no β gate) are applied here
    exactly as ``generate_batch`` applies them live, so the baked program
    matches the live path."""
    from ..pipeline.sampler import RepellencyWindow

    window = window or RepellencyWindow(1000.0, 780.0)
    if repellency_cfg is not None:
        repellency_cfg = dataclasses.replace(
            repellency_cfg, sigma=1.0, normalize_x=True, use_beta_gate=False)
    export = jax.export.export
    checks = [jax.export.DisabledSafetyCheck.custom_call(t)
              for t in ("tpu_custom_call", "Sharding")]

    clip_len = pipe.tokenizer.model_max_length
    t5_len = pipe.max_sequence_length
    joint = pipe.joint_dim

    def _encode(p_l, p_g, p_t5, ids_l, ids_g, ids_t):
        from ..pipeline.diffusion_sd3 import joint_text_embed
        _, pen_l, _, proj_l = pipe.clip_l.apply(p_l, ids_l)
        _, pen_g, _, proj_g = pipe.clip_g.apply(p_g, ids_g)
        t5_embed = pipe.t5.apply(p_t5, ids_t)
        return joint_text_embed(pen_l, proj_l, pen_g, proj_g, t5_embed,
                                joint)

    ids_l_s = jax.ShapeDtypeStruct((batch_size, clip_len), jnp.int32)
    ids_t_s = jax.ShapeDtypeStruct((batch_size, t5_len), jnp.int32)
    enc_exp = export(jax.jit(_encode), disabled_checks=checks)(
        _struct_of(pipe.clip_l_params), _struct_of(pipe.clip_g_params),
        _struct_of(pipe.t5_params), ids_l_s, ids_l_s, ids_t_s)

    seq = clip_len + t5_len
    lshape = jax.ShapeDtypeStruct((2, batch_size, seq, joint), jnp.float32)
    pooled_dim = (pipe.clip_l.config.projection_dim
                  + pipe.clip_g.config.projection_dim)
    pshape = jax.ShapeDtypeStruct((2, batch_size, pooled_dim), jnp.float32)
    refs_s = None if refs is None else _struct_of(refs)
    seeds_s = jax.ShapeDtypeStruct((batch_size,), jnp.uint32)
    gs_s = jax.ShapeDtypeStruct((batch_size,), jnp.float32)
    sample_exp = export(pipe._jitted_sample_batch_fn,
                        disabled_checks=checks)(
        _struct_of(pipe.transformer_params), lshape, pshape, refs_s,
        seeds_s, gs_s, steps=num_inference_steps,
        repellency=repellency_cfg, window=window, height=height,
        width=width, rep_bank=None)

    lat = jax.ShapeDtypeStruct(
        (batch_size, height // pipe.vae_scale_factor,
         width // pipe.vae_scale_factor,
         pipe.transformer.config.in_channels), jnp.float32)
    from ..models.vae import AutoencoderKL
    dec_exp = export(
        jax.jit(lambda p, z: pipe.vae.apply(p, z,
                                            method=AutoencoderKL.decode)),
        disabled_checks=checks)(_struct_of(pipe.vae_params), lat)

    meta = {
        "family": "sd3",
        "batch_size": batch_size,
        "num_inference_steps": num_inference_steps,
        "height": height, "width": width,
        "clip_max_length": int(clip_len),
        "t5_max_length": int(t5_len),
        "vae_scaling_factor": float(pipe.vae.config.scaling_factor),
        "vae_shift_factor": float(pipe.vae.config.shift_factor),
        "refs_none": refs is None,
        "int8": "quant" in pipe.transformer_params,
        "repellency_cfg": (None if repellency_cfg is None
                           else dataclasses.asdict(repellency_cfg)),
        "window": dataclasses.asdict(window),
        "platform": jax.devices()[0].platform,
        "jax_version": jax.__version__,
    }
    return AotSd3Bundle(encode=enc_exp, sample=sample_exp, decode=dec_exp,
                        meta=meta)


def _programs_for(meta: dict):
    return _SD3_PROGRAMS if meta.get("family") == "sd3" else _PROGRAMS


def save_bundle(bundle, path: str) -> None:
    """One-file artifact: a zip of the serialized programs + meta."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(bundle.meta, indent=2))
        for name in _programs_for(bundle.meta):
            z.writestr(f"{name}.jaxexport",
                       getattr(bundle, name).serialize())


def load_bundle(path: str):
    """Load + platform-check an artifact written by :func:`save_bundle`.
    Returns :class:`AotBundle` or :class:`AotSd3Bundle` by family."""
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        progs = {name: jax.export.deserialize(
                     bytearray(z.read(f"{name}.jaxexport")))
                 for name in _programs_for(meta)}
    here = jax.devices()[0].platform
    if meta.get("platform") != here:
        raise ValueError(
            f"AOT bundle was exported for platform {meta.get('platform')!r} "
            f"but this process runs on {here!r} — jax.export artifacts are "
            "platform-locked; re-export on the target platform")
    cls = AotSd3Bundle if meta.get("family") == "sd3" else AotBundle
    return cls(meta=meta, **progs)
