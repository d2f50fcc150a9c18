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
        if (refs is None) != bool(self.meta.get("refs_none", True)):
            raise ValueError(
                "bundle exported with"
                + ("out" if self.meta.get("refs_none", True) else "")
                + " a repellency bank; call-time refs must match")
        latents, _applied = self.sample.call(
            unet_params, text_embeds, text_embeds, use_alt,
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
                    guidance=None, freeu=None) -> AotBundle:
    """Export a serving configuration of ``pipe`` to an :class:`AotBundle`.

    ``refs``: pass the (host) repellency bank array to bake its SHAPE into
    the sampling program (the bank itself remains a call-time input);
    ``repellency_cfg``/``erase_spec.window`` statics come along. With
    ``refs=None`` the exported program has no repellency inputs.
    """
    from ..pipeline.diffusion import ERASE_SPECS, GuidanceConfig
    from ..models.vae import AutoencoderKL

    erase_spec = erase_spec or ERASE_SPECS["std"]
    guidance = guidance or GuidanceConfig()
    export = jax.export.export  # jax >= 0.4.30 stable surface
    checks = [jax.export.DisabledSafetyCheck.custom_call(t)
              for t in ("tpu_custom_call", "Sharding")]

    max_length = pipe.tokenizer.model_max_length
    d = pipe.text_encoder.config.hidden_size
    branches = 2  # 'none' text methods: (uncond, cond)
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
        "platform": jax.devices()[0].platform,
        "jax_version": jax.__version__,
    }
    return AotBundle(text_encode=text_exp, sample=sample_exp, decode=dec_exp,
                     meta=meta)


def save_bundle(bundle: AotBundle, path: str) -> None:
    """One-file artifact: a zip of the three serialized programs + meta."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(bundle.meta, indent=2))
        for name in _PROGRAMS:
            z.writestr(f"{name}.jaxexport",
                       getattr(bundle, name).serialize())


def load_bundle(path: str) -> AotBundle:
    """Load + platform-check an artifact written by :func:`save_bundle`."""
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        progs = {name: jax.export.deserialize(
                     bytearray(z.read(f"{name}.jaxexport")))
                 for name in _PROGRAMS}
    here = jax.devices()[0].platform
    if meta.get("platform") != here:
        raise ValueError(
            f"AOT bundle was exported for platform {meta.get('platform')!r} "
            f"but this process runs on {here!r} — jax.export artifacts are "
            "platform-locked; re-export on the target platform")
    return AotBundle(meta=meta, **progs)
