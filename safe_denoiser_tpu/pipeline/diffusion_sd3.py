"""SafeDiffusion3Pipeline — SD3 (MMDiT flow-matching) host orchestration.

Parity target: the reference's four SD3 pipelines (models/sdv3/
sdv3_pipeline.py, safree_pipeline.py, safe_denoiser_pipeline.py and the
``_efficient`` variants) collapsed into one config-driven class:

  * triple text encoding — CLIP-L + CLIP-bigG penultimate states concatenated
    and zero-padded to the T5 width, then sequence-concatenated with T5-XXL
    states; pooled = [CLIP-L pooled ; bigG pooled] (sdv3_pipeline.py:401-520)
  * SD3 SAFREE — projection matrices from T5 first-token states of the
    leave-one-out masked prompts and of the negative space; mask_to_onp over
    the joint [2, 333, 4096] embeddings (safe_denoiser_pipeline.py:72-153,
    1061-1079)
  * the 17-phrase hardcoded nudity negative prompt (sdv3_pipeline.py:985-992)
  * flow-matching repellency renoising inside the 780..1000 window
    (safe_denoiser_pipeline.py:1135-1165) — in pipeline/sampler.sample_sd3
  * the CPU-offload "_efficient" staging is a no-op on TPU (weights stay in
    HBM); the flag is accepted for CLI compatibility.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import (
    CLIP_BIG_G,
    CLIP_VIT_L_14,
    SD3_MEDIUM,
    SD3_VAE,
    AutoencoderKL,
    CLIPTextModel,
    MMDiT,
    T5Encoder,
)
from ..repellency.methods import RepellencyConfig
from .safree import projection_matrix, safree_projection
from .sampler import RepellencyWindow, sample_sd3

# reference models/sdv3/sdv3_pipeline.py:985-992
SD3_NUDITY_NEGATIVE_PROMPT = (
    "Sexual Acts, Content Meant to Arouse Sexual Excitement, Nudity, "
    "Pornography, Erotic Art, Lustful, Seductive, Orgasmic, Libido, Kinky, "
    "Sexual Orientation, Sexual Attraction, Sexual Intercourse, Sexual "
    "Pleasure, Sexual Fantasy, Carnal Desires, Sexual Gratification")


def joint_text_embed(pen_l, proj_l, pen_g, proj_g, t5_states, joint_dim):
    """THE SD3 joint text-embed convention (reference
    sdv3_pipeline.py:401-520): CLIP-L + CLIP-bigG penultimate states
    concatenated and zero-padded to ``joint_dim``, sequence-concatenated
    with the T5 states; pooled = [CLIP-L proj ; bigG proj]. Single-sourced
    for :meth:`SafeDiffusion3Pipeline._encode_one`, the AOT export
    (serving/aot.py::export_pipeline_sd3) and bench.py's sd3_e2e leg — a
    desynchronized copy would silently measure/serve a different program.

    Returns (embeds [B, L_clip + S_t5, joint_dim], pooled [B, P_l + P_g]).
    """
    clip_embed = jnp.concatenate([pen_l, pen_g], axis=-1)
    clip_embed = jnp.pad(
        clip_embed,
        ((0, 0), (0, 0), (0, joint_dim - clip_embed.shape[-1])))
    emb = jnp.concatenate(
        [clip_embed, t5_states.astype(clip_embed.dtype)], axis=1)
    return emb, jnp.concatenate([proj_l, proj_g], axis=-1)


class SafeDiffusion3Pipeline:
    def __init__(self, transformer: MMDiT, transformer_params,
                 vae: AutoencoderKL, vae_params,
                 clip_l: CLIPTextModel, clip_l_params,
                 clip_g: CLIPTextModel, clip_g_params,
                 t5: T5Encoder, t5_params,
                 tokenizer, tokenizer_2, tokenizer_3,
                 scheduler, logger=None,
                 max_sequence_length: int = 256):
        self.transformer = transformer
        # device-resident ONCE: the converters return numpy trees, and
        # numpy args to a jitted function re-upload on EVERY call — for the
        # 2B-param MMDiT + 4.7B-param T5 that is the whole checkpoint per
        # sampling call (see the measured note in diffusion.py.__init__)
        _put = lambda tree: jax.tree_util.tree_map(jax.device_put, tree)
        self.transformer_params = _put(transformer_params)
        self.vae = vae
        self.vae_params = _put(vae_params)
        self.clip_l, self.clip_l_params = clip_l, _put(clip_l_params)
        self.clip_g, self.clip_g_params = clip_g, _put(clip_g_params)
        self.t5, self.t5_params = t5, _put(t5_params)
        self.tokenizer = tokenizer
        self.tokenizer_2 = tokenizer_2
        self.tokenizer_3 = tokenizer_3
        self.scheduler = scheduler
        self.logger = logger
        self.max_sequence_length = max_sequence_length
        self.vae_scale_factor = 2 ** (len(vae.config.block_out_channels) - 1)
        self.joint_dim = transformer.config.joint_attention_dim

        # params as jit arguments, never closed over (closed-over arrays are
        # inlined into the HLO as constants; at real scale the T5-XXL alone
        # would blow the remote-compile request limit — see the HTTP 413
        # note in diffusion.py)
        _el = jax.jit(lambda p, ids: self.clip_l.apply(p, ids))
        self._enc_l = lambda ids: _el(self.clip_l_params, ids)
        _eg = jax.jit(lambda p, ids: self.clip_g.apply(p, ids))
        self._enc_g = lambda ids: _eg(self.clip_g_params, ids)
        _et = jax.jit(lambda p, ids: self.t5.apply(p, ids))
        self._enc_t5 = lambda ids: _et(self.t5_params, ids)
        self._vae_decode_jit = jax.jit(
            lambda p, z: self.vae.apply(p, z, method=AutoencoderKL.decode))

    @classmethod
    def from_pretrained(cls, model_dir: str, logger=None):
        """Load an HF-layout SD3 checkpoint dir."""
        import os

        from ..models.weights import (
            convert_clip_text, convert_mmdit, convert_t5, convert_vae,
            load_component_config, load_sharded_state_dict)
        from ..schedulers import FlowMatchEulerScheduler
        from ..text import CLIPTokenizer

        sub_cfg = lambda sub, kind: load_component_config(
            os.path.join(model_dir, sub), kind)
        tf_cfg = sub_cfg("transformer", "mmdit")
        vae_cfg = sub_cfg("vae", "vae")
        l_cfg = sub_cfg("text_encoder", "clip_text")
        g_cfg = sub_cfg("text_encoder_2", "clip_text")
        t5_cfg = sub_cfg("text_encoder_3", "t5")
        tf = MMDiT(tf_cfg, dtype=jnp.bfloat16)
        vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
        clip_l = CLIPTextModel(l_cfg)
        clip_g = CLIPTextModel(g_cfg)
        t5 = T5Encoder(t5_cfg, dtype=jnp.bfloat16)

        load = lambda sub: load_sharded_state_dict(os.path.join(model_dir, sub))
        tf_params = convert_mmdit(load("transformer"), tf_cfg)
        vae_params = convert_vae(load("vae"), vae_cfg)
        clip_l_params = convert_clip_text(load("text_encoder"), l_cfg)
        clip_g_params = convert_clip_text(load("text_encoder_2"), g_cfg)
        t5_params = convert_t5(load("text_encoder_3"), t5_cfg)

        tok = CLIPTokenizer.from_pretrained(os.path.join(model_dir, "tokenizer"))
        tok2 = CLIPTokenizer.from_pretrained(
            os.path.join(model_dir, "tokenizer_2"))
        tok3_dir = os.path.join(model_dir, "tokenizer_3")
        try:  # the real T5 SentencePiece tokenizer when transformers can load it
            import transformers
            tok3 = transformers.AutoTokenizer.from_pretrained(tok3_dir)
        except Exception:
            tok3 = CLIPTokenizer.from_pretrained(tok3_dir)

        # honor the checkpoint's scheduler_config.json (the reference keeps
        # whatever FlowMatchEuler from_pretrained loads — sdv3 runners pass
        # no custom scheduler); the defaults match SD3-medium (shift=3.0)
        # but must not silently override a checkpoint that differs
        from ..schedulers.flow_match import FlowMatchEulerConfig
        sched_cfg = FlowMatchEulerConfig()
        sched_path = os.path.join(model_dir, "scheduler",
                                  "scheduler_config.json")
        if os.path.exists(sched_path):
            import dataclasses
            import json
            with open(sched_path) as f:
                raw = json.load(f)
            fields = {f.name for f in dataclasses.fields(FlowMatchEulerConfig)}
            sched_cfg = FlowMatchEulerConfig(
                **{k: v for k, v in raw.items() if k in fields})

        return cls(tf, tf_params, vae, vae_params, clip_l, clip_l_params,
                   clip_g, clip_g_params, t5, t5_params, tok, tok2, tok3,
                   FlowMatchEulerScheduler(sched_cfg), logger=logger)

    # -- text encoding ------------------------------------------------------
    def _t5_ids(self, texts, padding="max_length", max_length=None):
        out = self.tokenizer_3(texts, padding=padding,
                               max_length=max_length or self.max_sequence_length,
                               truncation=True)
        return np.asarray(out["input_ids"])

    def _encode_one(self, text: str):
        """Single-text triple-tower joint embedding: CLIP-L + CLIP-bigG
        penultimate states (zero-padded to the joint dim) concatenated with
        T5 states along seq; pooled = concat of the two CLIP projections."""
        clip_len = self.tokenizer.model_max_length
        ids_l = jnp.asarray(self.tokenizer([text], padding="max_length",
                                           max_length=clip_len)["input_ids"])
        ids_g = jnp.asarray(self.tokenizer_2([text], padding="max_length",
                                             max_length=clip_len)["input_ids"])
        _, pen_l, _, proj_l = self._enc_l(ids_l)
        _, pen_g, _, proj_g = self._enc_g(ids_g)
        t5_embed = self._enc_t5(jnp.asarray(self._t5_ids([text])))
        return joint_text_embed(pen_l, proj_l, pen_g, proj_g, t5_embed,
                                self.joint_dim)

    def encode_prompt(self, prompt: str, negative_prompt: str = ""):
        """Triple-tower joint embedding (reference sdv3_pipeline.py:401-520).

        Returns (prompt_embeds [2, 1, L_clip+S_t5, joint], pooled [2, 1, 2048])."""
        cond, pooled_c = self._encode_one(prompt)
        uncond, pooled_u = self._encode_one(negative_prompt or "")
        return (jnp.stack([uncond, cond]), jnp.stack([pooled_u, pooled_c]))

    def _masked_encode_prompt_t5(self, prompt: str):
        """T5 first-token states of leave-one-out masked prompts
        (reference safe_denoiser_pipeline.py:773-833)."""
        ids = self._t5_ids([prompt], padding="longest")[0]
        n_real = max(len(ids) - 2, 1)
        masked = np.tile(ids, (n_real, 1))
        for i in range(n_real):
            masked[i, i + 1] = 0
        states = self._enc_t5(jnp.asarray(masked))
        return states[:, 0, :]

    def _neg_space_embeds_t5(self, negative_prompt_space: Sequence[str]):
        ids = self._t5_ids(list(negative_prompt_space))
        return self._enc_t5(jnp.asarray(ids))[:, 0, :]

    # -- generation ---------------------------------------------------------
    @functools.cached_property
    def _jitted_sample_fn(self):
        """Transformer/VAE params enter as jit arguments (HTTP 413 note in
        diffusion.py — the 2B-param MMDiT must not inline into the HLO)."""
        @functools.partial(
            jax.jit,
            static_argnames=("steps", "repellency", "window", "height",
                            "width", "rep_bank"))
        def run(transformer_params, text_embeds, pooled, refs,
                rng, guidance_scale, steps, repellency, window, height,
                width, rep_bank=None):
            b = text_embeds.shape[1]
            lat_rng, samp_rng = jax.random.split(rng)
            c = self.transformer.config.in_channels
            shape = (b, height // self.vae_scale_factor,
                     width // self.vae_scale_factor, c)
            latents = jax.random.normal(lat_rng, shape, dtype=jnp.float32)
            latents, applied = sample_sd3(
                lambda l, t, ctx, p: self.transformer.apply(
                    transformer_params, l, t, ctx, p),
                self.scheduler, text_embeds, pooled, latents, samp_rng, steps,
                guidance_scale=guidance_scale, repellency=repellency,
                refs_nchw=refs, window=window, rep_bank=rep_bank)
            return latents, applied

        return run

    @functools.cached_property
    def _jitted_sample_batch_fn(self):
        """Serving-mode runner: per-sample ``seeds``/``guidance_scales`` are
        traced inputs (same convention as SafeDiffusionPipeline's run —
        latents from fold_in(key, 0), scan stream from fold_in(key, 1)), so
        the DynamicBatcher's padded partial batches reuse one XLA program
        and each row reproduces its own single-row run."""
        @functools.partial(
            jax.jit,
            static_argnames=("steps", "repellency", "window", "height",
                             "width", "rep_bank"))
        def run(transformer_params, text_embeds, pooled, refs, seeds,
                guidance_scales, steps, repellency, window, height, width,
                rep_bank=None):
            c = self.transformer.config.in_channels
            single = (height // self.vae_scale_factor,
                      width // self.vae_scale_factor, c)
            keys = jax.vmap(jax.random.PRNGKey)(seeds)
            latents = jax.vmap(
                lambda k: jax.random.normal(jax.random.fold_in(k, 0), single,
                                            dtype=jnp.float32))(keys)
            samp_rng = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
            latents, applied = sample_sd3(
                lambda l, t, ctx, p: self.transformer.apply(
                    transformer_params, l, t, ctx, p),
                self.scheduler, text_embeds, pooled, latents, samp_rng,
                steps, guidance_scale=guidance_scales,
                repellency=repellency, refs_nchw=refs, window=window,
                rep_bank=rep_bank)
            return latents, applied

        return run

    def _prepare_batch_embeds(self, prompts: Sequence[str],
                              negative_prompt: Optional[str] = None,
                              negative_prompt2: Optional[str] = None,
                              safree: bool = False, sf_alpha: float = 0.01):
        """Host-side batched embed assembly shared by :meth:`generate_batch`
        and the AOT serving path (serving/aot.py — SAFREE's leave-one-out
        masked T5 encodes are dynamic-shape host logic, so they always run
        live even when the scan comes from an artifact).

        Returns (embeds [2, B, L, D], pooled [2, B, P])."""
        if negative_prompt is None:
            negative_prompt = SD3_NUDITY_NEGATIVE_PROMPT
        # the uncond row is the same string for every request: encode the
        # triple tower once and broadcast, instead of B redundant
        # CLIP-L/CLIP-bigG/T5 forwards on the serving-latency path
        uncond, pooled_u = self._encode_one(negative_prompt or "")
        per = [self._encode_one(p) for p in prompts]
        cond = jnp.concatenate([e for e, _ in per], axis=0)     # [B, L, D]
        pooled_c = jnp.concatenate([pl for _, pl in per], axis=0)
        embeds = jnp.stack([jnp.broadcast_to(uncond[0], cond.shape), cond])
        pooled = jnp.stack(
            [jnp.broadcast_to(pooled_u[0], pooled_c.shape), pooled_c])

        if safree:
            neg_space = negative_prompt2 or SD3_NUDITY_NEGATIVE_PROMPT
            neg_embeds = self._neg_space_embeds_t5(
                [p.strip() for p in neg_space.split(",")])
            concept_proj = projection_matrix(neg_embeds.T)
            rows = []
            for j, p in enumerate(prompts):
                masked = self._masked_encode_prompt_t5(p)
                masked_proj = projection_matrix(masked.T)
                pair = jnp.stack([embeds[0, j], embeds[1, j]])
                rescaled, n_removed, _ = safree_projection(
                    pair, masked, masked_proj, concept_proj, alpha=sf_alpha,
                    max_length=pair.shape[1])
                if self.logger is not None:
                    self.logger.log(
                        f"Among {masked.shape[0]} tokens, we remove "
                        f"{int(n_removed)}.")
                rows.append(rescaled)
            embeds = jnp.stack(rows, axis=1)                    # [2, B, L, D]
        return embeds, pooled

    def generate_batch(self, prompts: Sequence[str],
                       seeds: Sequence[int],
                       guidance_scales: Sequence[float],
                       num_inference_steps: int = 50,
                       negative_prompt: Optional[str] = None,
                       negative_prompt2: Optional[str] = None,
                       height: int = 1024, width: int = 1024,
                       safree: bool = False, sf_alpha: float = 0.01,
                       repellency_processor=None,
                       window: RepellencyWindow = RepellencyWindow(
                           1000.0, 780.0)):
        """Batched multi-prompt SD3 generation — the throughput mode behind
        ``serve.py --sd3`` (the reference's SD3 loop is batch 1). Each row
        keeps its own seed and guidance scale as traced inputs; SAFREE
        projection is computed per prompt, then stacked.

        Returns a list of uint8 [H, W, 3] images, one per prompt.
        ``generate_batch == dispatch_batch(...).fetch()`` byte-for-byte.
        """
        return self.dispatch_batch(
            prompts, seeds, guidance_scales,
            num_inference_steps=num_inference_steps,
            negative_prompt=negative_prompt,
            negative_prompt2=negative_prompt2, height=height, width=width,
            safree=safree, sf_alpha=sf_alpha,
            repellency_processor=repellency_processor,
            window=window).fetch()

    def dispatch_batch(self, prompts: Sequence[str],
                       seeds: Sequence[int],
                       guidance_scales: Sequence[float],
                       num_inference_steps: int = 50,
                       negative_prompt: Optional[str] = None,
                       negative_prompt2: Optional[str] = None,
                       height: int = 1024, width: int = 1024,
                       safree: bool = False, sf_alpha: float = 0.01,
                       repellency_processor=None,
                       window: RepellencyWindow = RepellencyWindow(
                           1000.0, 780.0)) -> "Sd3PendingGeneration":
        """Async :meth:`generate_batch`: host text prep + enqueued scan AND
        decode, handle returned immediately (the batcher's two-phase
        pipelining and any batched runner overlap use this)."""
        b = len(prompts)
        assert len(seeds) == b and len(guidance_scales) == b
        embeds, pooled = self._prepare_batch_embeds(
            prompts, negative_prompt, negative_prompt2, safree, sf_alpha)

        repellency_cfg = None
        refs = None
        if repellency_processor is not None:
            # fast_sdv3 parity statics — same substitutions as __call__
            repellency_cfg = dataclasses.replace(
                repellency_processor.config(),
                sigma=1.0, normalize_x=True, use_beta_gate=False)
            refs = self._maybe_shard_refs(repellency_processor.get_proj_ref())

        embeds, pooled, seeds_a, gs_a = self._shard_batch_inputs(
            embeds, pooled, jnp.asarray(list(seeds), dtype=jnp.uint32),
            jnp.asarray(list(guidance_scales), dtype=jnp.float32))
        latents, applied = self._jitted_sample_batch_fn(
            self.transformer_params, embeds, pooled, refs, seeds_a, gs_a,
            num_inference_steps, repellency_cfg, window, height, width,
            rep_bank=self._rep_bank)
        # decode enqueued immediately (async) — nothing here blocks
        z = latents / self.vae.config.scaling_factor \
            + self.vae.config.shift_factor
        image = self._vae_decode_jit(self.vae_params, z)
        return Sd3PendingGeneration(self, num_inference_steps, latents,
                                    image, applied)

    def load_lora(self, path: str, scale: Optional[float] = None) -> None:
        """Merge a LoRA adapter (training/lora.py) into the MMDiT weights.
        Same contract as ``SafeDiffusionPipeline.load_lora``: adapters apply
        to float kernels, so call this BEFORE :meth:`enable_int8`."""
        from ..training.lora import merge_lora_into
        self.transformer_params = merge_lora_into(self.transformer_params,
                                                  path, scale)

    def enable_int8(self) -> None:
        """Opt-in W8A8 int8 for the MMDiT block dots (ops/quant.py): weights
        re-quantized once here (per-output-channel scales, load-time
        transform — checkpoints unaffected), activations per-token in-graph.
        Measured 1.30-1.76x per dot on v5e (tools_int8_probe.py) at ~1.5e-2
        relative error per dot; the reference has no quantized path, so this
        is beyond-parity and default OFF. Idempotent: a second call is a
        no-op (re-quantizing int8 kernels would destroy the scales)."""
        if "quant" in self.transformer_params:
            return
        from ..ops.quant import quantize_mmdit_params
        pq, qt = jax.jit(quantize_mmdit_params)(
            self.transformer_params["params"])
        self.transformer_params = {"params": pq, "quant": qt}

    # M-sharded repellency bank (the SD3 bank is the big one: 10k rows of
    # 16*128*128 f32 is ~10 GB — see parallel/bank.py); same surface as
    # SafeDiffusionPipeline.enable_bank_sharding
    _rep_bank = None

    def enable_bank_sharding(self, mesh, axis: str = "data",
                             batch_axis: Optional[str] = None) -> None:
        if self._data_mesh is not None:
            # both call orders must hit the conflict guard (see
            # enable_data_mesh)
            raise ValueError(
                "enable_bank_sharding with enable_data_mesh is not "
                "supported: shard the bank's M axis or the served batch, "
                "not both (needs a 2-D mesh)")
        from ..parallel.bank import ShardedBank
        self._rep_bank = ShardedBank(mesh, axis=axis, batch_axis=batch_axis)

    def _maybe_shard_refs(self, refs):
        if refs is None or self._rep_bank is None:
            return refs
        from ..parallel.bank import shard_bank
        return shard_bank(refs, self._rep_bank.mesh, self._rep_bank.axis)

    _data_mesh = None

    def enable_data_mesh(self, n_devices=None, mesh=None) -> None:
        """Data-parallel serving for the SD3 family: batched calls shard
        the batch dim over a 1-D data mesh with MMDiT/VAE weights
        replicated (same contract as
        ``SafeDiffusionPipeline.enable_data_mesh`` — see there). The text
        towers run per-prompt on the host-prep path and stay unreplicated."""
        from ..parallel import make_mesh, replicate
        if mesh is None:
            mesh = make_mesh(n_devices)
        if self._rep_bank is not None:
            raise ValueError(
                "enable_data_mesh with enable_bank_sharding is not "
                "supported: shard the bank's M axis or the served batch, "
                "not both (needs a 2-D mesh)")
        self.transformer_params = replicate(self.transformer_params, mesh)
        self.vae_params = replicate(self.vae_params, mesh)
        self._data_mesh = mesh

    def _shard_batch_inputs(self, embeds, pooled, seeds, guidance_scales):
        """Place a prepared batch over the serving data mesh (no-op without
        :meth:`enable_data_mesh`): embeds/pooled carry the batch at dim 1
        ([2, B, ...]); seeds/guidance at dim 0."""
        if self._data_mesh is None:
            return embeds, pooled, seeds, guidance_scales
        from ..parallel import shard_batch
        n = self._data_mesh.devices.size
        b = seeds.shape[0]
        if b % n != 0:
            raise ValueError(
                f"served batch size {b} must be divisible by the data "
                f"mesh's {n} devices (pick --batch_size a multiple of "
                f"--mesh)")
        mesh = self._data_mesh
        return (shard_batch(embeds, mesh, batch_dim=1),
                shard_batch(pooled, mesh, batch_dim=1),
                shard_batch(seeds, mesh), shard_batch(guidance_scales, mesh))

    def _jitted_sample(self, *args, **kwargs):
        """Scan and decode as separate jits (SIGKILL note in diffusion.py)."""
        latents, applied = self._jitted_sample_fn(self.transformer_params,
                                                  *args, **kwargs)
        z = latents / self.vae.config.scaling_factor \
            + self.vae.config.shift_factor
        image = self._vae_decode_jit(self.vae_params, z)
        return latents, image, applied

    def dispatch(self, prompt: str,
                 negative_prompt: Optional[str] = None,
                 negative_prompt2: Optional[str] = None,
                 num_inference_steps: int = 50,
                 guidance_scale: float = 7.0,
                 height: int = 1024, width: int = 1024,
                 seed: int = 42,
                 safree: bool = False,
                 sf_alpha: float = 0.01,
                 repellency_processor=None,
                 window: RepellencyWindow = RepellencyWindow(1000.0, 780.0),
                 efficient: bool = False,  # CPU-offload no-op on TPU
                 ) -> "Sd3PendingGeneration":
        """Async form of :meth:`__call__` (same contract as
        SafeDiffusionPipeline.dispatch): host text prep + enqueued device
        programs, returning a handle immediately so the sdv3 runner loop
        can overlap case i's PNG save / NudeNet gate with case i+1's scan."""
        # The reference SD3 pipelines rebind the CFG negative prompt to the
        # joined 17-phrase nudity string REGARDLESS of the caller's argument
        # (safe_denoiser_pipeline.py:989-996); None reproduces that default.
        if negative_prompt is None:
            negative_prompt = SD3_NUDITY_NEGATIVE_PROMPT
        embeds, pooled = self.encode_prompt(prompt, negative_prompt)

        if safree:
            neg_space = negative_prompt2 or SD3_NUDITY_NEGATIVE_PROMPT
            neg_embeds = self._neg_space_embeds_t5(
                [p.strip() for p in neg_space.split(",")])
            concept_proj = projection_matrix(neg_embeds.T)
            masked = self._masked_encode_prompt_t5(prompt)
            masked_proj = projection_matrix(masked.T)
            pair = jnp.stack([embeds[0, 0], embeds[1, 0]])
            rescaled, n_removed, _ = safree_projection(
                pair, masked, masked_proj, concept_proj, alpha=sf_alpha,
                max_length=pair.shape[1])
            if self.logger is not None:
                self.logger.log(f"Among {masked.shape[0]} tokens, we remove "
                                f"{int(n_removed)}.")
            embeds = rescaled[:, None]

        repellency_cfg = None
        refs = None
        if repellency_processor is not None:
            # fast_sdv3 parity: x is channel-normalized, there is no β gate,
            # and conditioning_1 never threads the configured sigma into
            # empirical_denoiser — the reference always runs its default
            # sigma=1.0 (repellency_methods_fast_sdv3.py:129-137,146)
            repellency_cfg = dataclasses.replace(
                repellency_processor.config(),
                sigma=1.0,
                normalize_x=True,
                use_beta_gate=False)
            refs = self._maybe_shard_refs(repellency_processor.get_proj_ref())

        latents, image, applied = self._jitted_sample(
            embeds, pooled, refs, jax.random.PRNGKey(seed),
            jnp.float32(guidance_scale), num_inference_steps, repellency_cfg,
            window, height, width, rep_bank=self._rep_bank)
        return Sd3PendingGeneration(self, num_inference_steps, latents,
                                    image, applied)

    def __call__(self, prompt: str,
                 negative_prompt: Optional[str] = None,
                 negative_prompt2: Optional[str] = None,
                 num_inference_steps: int = 50,
                 guidance_scale: float = 7.0,
                 height: int = 1024, width: int = 1024,
                 seed: int = 42,
                 safree: bool = False,
                 sf_alpha: float = 0.01,
                 repellency_processor=None,
                 window: RepellencyWindow = RepellencyWindow(1000.0, 780.0),
                 efficient: bool = False,  # CPU-offload no-op on TPU
                 return_latents: bool = False):
        return self.dispatch(
            prompt, negative_prompt=negative_prompt,
            negative_prompt2=negative_prompt2,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, height=height, width=width,
            seed=seed, safree=safree, sf_alpha=sf_alpha,
            repellency_processor=repellency_processor, window=window,
            efficient=efficient).fetch(return_latents=return_latents)


class Sd3PendingGeneration:
    """Handle for an in-flight :meth:`SafeDiffusion3Pipeline.dispatch` —
    same contract as pipeline.diffusion.PendingGeneration: nothing blocks
    until :meth:`fetch`, which reproduces the old ``__call__`` tail
    byte-for-byte (repellency log lines, uint8 conversion)."""

    def __init__(self, pipe, num_inference_steps, latents, image, applied):
        self._pipe = pipe
        self._steps = num_inference_steps
        self._latents = latents
        self._image = image
        self._applied = applied

    def fetch(self, return_latents: bool = False):
        if self._pipe.logger is not None:
            ts, _ = self._pipe.scheduler.timesteps_and_sigmas(self._steps)
            for i in np.nonzero(np.asarray(self._applied).any(axis=-1))[0]:
                self._pipe.logger.log(
                    "-" * 10 + f" Repellency applied at timestep {ts[i]} "
                    + "-" * 10)
        if return_latents:
            return self._latents
        # host-side postprocess: fetch must only transfer, never dispatch
        # device ops (serving finisher-thread contract — see
        # diffusion.postprocess_image_host)
        from .diffusion import postprocess_image_host
        image = postprocess_image_host(self._image)
        return [(img * 255).round().astype(np.uint8) for img in image]
