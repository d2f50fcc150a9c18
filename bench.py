"""Benchmarks: safe-denoiser sampling throughput per chip, one JSON line each.

Covers ALL the driver's benchmark configurations (BASELINE.md 1-5), eleven
JSON lines in the default run:
  * sd14_10step_ddim   — config #1: 10-step DDIM nudity scan
  * sd14_e2e           — whole pipeline: tokenize → CLIP encode → 50-step
                         scan → VAE decode (the reference's per-image
                         wall-clock region, run_nudity.py:414-464); the
                         scan runs the quality-cleared int8 wide-block path
                         (docs/QUALITY_INT8.md; SDT_E2E_INT8=0 → bf16),
                         and a bf16 CONTROL line precedes it so both
                         precisions are in every record (ADVICE r4)
  * sd14_sparse        — config #3: artist-erasure sparse (SPELL) repellency
  * sd14_bank3k        — config #4: CoPro's 3,000-image kernel_fast bank
  * sd3_50step         — config #5: SD3-medium MMDiT flow-matching scan with
                         the fast_sdv3 repellency renoising
  * sd3_e2e            — SD3 full pipeline (triple text encode incl.
                         T5-XXL + 50-step scan + 1024² VAE decode), staged
                         timings summed (HBM can't hold T5-XXL and MMDiT at
                         once); recorded path = quality-cleared int8 MMDiT
                         scan, with a composed bf16 control line
                         (VERDICT r4 #1 / ADVICE r4)
  * sd3_int8_50step    — informational beyond-parity config: #5 with W8A8
                         int8 MMDiT block dots (ops/quant.py, +16.3% ABA)
  * sd14_int8_50step   — informational beyond-parity config: the headline
                         with W8A8 int8 UNet wide-block (level-2/mid) dots
                         (quantize_unet_params, +2.56% ABA)
  * sd14_50step (LAST) — the headline metric the driver parses: SD-v1.4
                         50-step safe-denoiser scan, CFG folded into batch,
                         bf16 weights. The reference runs batch=1 fp32 on one
                         CUDA GPU; A100-class 50-step SD-v1.4 fp16 batched is
                         ~1.5 img/s (diffusers A100 benchmarks) — the
                         vs_baseline denominator.

The driver records the tail and parses the LAST JSON line, so the headline
prints last. BENCH_ONLY=sd14|sd14_10|sd14_e2e|sd14_sparse|sd14_bank3k|sd3|
sd3_e2e|sd3_int8|sd14_int8 runs a single config; BENCH_FAST=1 skips
everything but the headline. Every line carries ``mfu`` — analytic
matmul+conv model FLOPs (utils/flops.py) against the v5e 197-TFLOP/s bf16
peak.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_IMG_PER_SEC = 1.5       # A100-class 50-step SD-v1.4 fp16 batched
BASELINE_10STEP = 7.5            # 5x the 50-step rate (per-step parity)
BASELINE_SD3 = 0.125             # A100-class SD3-medium 50-step 1024^2
STEPS = 50
BATCH = int(os.environ.get("BENCH_BATCH", "4"))
BANK_M = int(os.environ.get("BENCH_BANK_M", "515"))  # i2p_sexual bank
# (reference caches/sd/i2p_sexual); CoPro uses a 3,000-image bank -> set
# BENCH_BANK_M=3000 for BASELINE config 4


class LegResult(float):
    """img/s that also carries the leg's MFU (+ extra JSON fields, e.g. the
    e2e leg's precision marker). A float subclass so every existing caller
    (tools_ab_*.py same-session A/B harnesses format and divide these)
    keeps working unchanged."""

    mfu = None
    extra = None

    def __new__(cls, value, mfu=None, **extra):
        out = super().__new__(cls, value)
        out.mfu = mfu
        out.extra = extra
        return out


def _emit(metric, value, baseline):
    line = {"metric": metric, "value": round(float(value), 4),
            "unit": "images/sec/chip",
            "vs_baseline": round(float(value) / baseline, 4)}
    mfu = getattr(value, "mfu", None)
    if mfu is not None:
        # analytic matmul+conv model FLOPs (utils/flops.py) over the v5e
        # 197-TFLOP/s bf16 peak — auditable, implementation-independent
        line["mfu"] = round(mfu, 4)
    line.update(getattr(value, "extra", None) or {})
    print(json.dumps(line), flush=True)


def _safe_mfu(img_per_sec, flops_fn):
    """MFU from an analytic per-image FLOP count; never kills the leg."""
    try:
        from safe_denoiser_tpu.utils.flops import mfu
        return mfu(img_per_sec, flops_fn())
    except Exception:
        import sys
        import traceback
        print("[bench] mfu computation failed (leg value unaffected):",
              file=sys.stderr)
        traceback.print_exc()
        return None


def _sd14_setup():
    from safe_denoiser_tpu.models import SD14_UNET, UNet2DCondition

    rng = jax.random.PRNGKey(0)
    model = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    latents = jax.random.normal(rng, (BATCH, 64, 64, 4), dtype=jnp.float32)
    text = jax.random.normal(jax.random.fold_in(rng, 1), (2, BATCH, 77, 768))
    refs = jax.random.normal(jax.random.fold_in(rng, 2), (BANK_M, 4, 64, 64))
    refs = refs / jnp.linalg.norm(refs, axis=1, keepdims=True)

    # throughput only needs correctly-shaped weights; skip the init compile
    shapes = jax.eval_shape(
        lambda: model.init(rng, latents[:1], jnp.asarray(1), text[0, :1]))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02,
                           jnp.bfloat16 if (s.dtype == jnp.float32
                                            and len(s.shape) > 1) else s.dtype),
        shapes)

    if os.environ.get("SDT_INT8") == "1":
        # Opt-in W8A8 int8 for the UNet's wide (level-2/mid, C=1280)
        # transformer dots (ops/quant.py::quantize_unet_params; --int8 on
        # the SD-v1 runners). Selective by shape: level-0 dots LOSE under
        # int8 on v5e (probe 0.66-0.77x), level-2 wins (1.33-1.70x).
        from safe_denoiser_tpu.ops.quant import quantize_unet_params
        min_dim = int(os.environ.get("SDT_INT8_MIN_DIM", "1280"))
        pq, qt = jax.jit(functools.partial(
            quantize_unet_params, min_dim=min_dim))(params["params"])
        params = {"params": pq, "quant": qt}

    # params are RETURNED and passed through jit args — closing over them
    # inlines gigabytes of constants into the lowered HLO and multiplies
    # compile time (measured: the SD3 bench never finished compiling)
    def unet_apply(params, lat, t, ctx, freeu=None):
        return model.apply(params, lat, t, ctx, freeu=freeu)

    return unet_apply, params, latents, text, refs


def _time_run(run, args, n_rounds=3, min_seconds=6.0):
    import numpy as np

    def _arr(out):
        return out[0] if isinstance(out, tuple) else out

    np.asarray(_arr(run(*args, jax.random.PRNGKey(1))))  # warmup, fully real
    # pilot round: short runs (10-step DDIM is ~0.5 s) must amortize the
    # fixed dispatch/sync overhead over enough rounds or the throughput
    # number measures the harness, not the scan. The pilot is timed via a
    # host transfer (block_until_ready can lie through the tunnel), which
    # overestimates by ~0.4 s of tunnel latency — conservative.
    t0 = time.perf_counter()
    np.asarray(_arr(run(*args, jax.random.PRNGKey(2))))
    pilot = time.perf_counter() - t0
    n_rounds = max(n_rounds, min(12, int(min_seconds / max(pilot, 1e-3))))

    def _window():
        t0 = time.perf_counter()
        for i in range(n_rounds):
            out = run(*args, jax.random.PRNGKey(2 + i))
        _arr(out).block_until_ready()
        t1 = time.perf_counter()
        # block_until_ready through the axon tunnel can return before the
        # computation finishes (measured a 28s SD3 scan "completing" in
        # 8 ms). A host transfer cannot lie, but it adds ~0.4s of tunnel
        # latency — so time with the block, then use the transfer only as a
        # lie detector.
        np.asarray(_arr(out))
        t2 = time.perf_counter()
        dt_block, extra = t1 - t0, t2 - t1
        return t2 - t0 if extra > 0.25 * dt_block else dt_block

    # best-of-2 windows: the compute is identical each window, so the faster
    # one is the truer throughput — the slower carries transient host load /
    # tunnel-RPC jitter (measured same-HLO spread up to 4% across a day)
    dt = min(_window(), _window())
    return dt, n_rounds


def bench_sd14(steps=STEPS, scheduler_kind="ddpm", rep=None):
    from safe_denoiser_tpu.pipeline import (
        GuidanceConfig, RepellencyWindow, sample_sd)
    from safe_denoiser_tpu.repellency import RepellencyConfig
    from safe_denoiser_tpu.schedulers import (
        DDIMConfig, DDIMScheduler, DDPMScheduler)

    unet_apply, params, latents, text, refs = _sd14_setup()
    sched = DDPMScheduler() if scheduler_kind == "ddpm" \
        else DDIMScheduler(DDIMConfig())
    if rep is None:
        rep = RepellencyConfig(method="kernel_fast", sigma=3.15, scale=0.33,
                               beta_threshold=7.0, use_beta_gate=True)

    @jax.jit
    def run(params, latents, text, refs, rng):
        import functools
        lat, applied = sample_sd(
            functools.partial(unet_apply, params), sched, text, latents, rng,
            steps, guidance=GuidanceConfig(guidance_scale=7.5),
            repellency=rep, refs_nchw=refs,
            window=RepellencyWindow(1000.0, 780.0))
        return lat, jnp.sum(applied)

    dt, n = _time_run(run, (params, latents, text, refs))
    ips = (n * BATCH) / dt

    def _flops_per_img():
        from safe_denoiser_tpu.utils.flops import model_flops
        latent_in = jnp.concatenate([latents] * 2, axis=0)
        ctx = text.reshape(2 * BATCH, *text.shape[2:])
        per_step = model_flops(unet_apply, params, latent_in,
                               jnp.asarray(500), ctx)
        return steps * per_step / BATCH

    return LegResult(ips, _safe_mfu(ips, _flops_per_img))


def _e2e_setup():
    """Models + fabricated real-size params + the three stage fns for the
    e2e pipeline. SINGLE-SOURCED on purpose: tools_ab_e2e.py A/Bs this very
    leg, so both must measure the same pipeline — import from here, never
    copy (a desynchronized copy invalidates the A/B).

    Returns (clip_params, unet_params, vae_params, latents, refs,
    encode, scan, decode) — the stage fns are un-jitted."""
    from safe_denoiser_tpu.models import (
        CLIP_VIT_L_14, SD14_VAE, AutoencoderKL, CLIPTextModel)
    from safe_denoiser_tpu.pipeline import (
        GuidanceConfig, RepellencyWindow, sample_sd)
    from safe_denoiser_tpu.repellency import RepellencyConfig
    from safe_denoiser_tpu.schedulers import DDPMScheduler

    unet_apply, unet_params, latents, _, refs = _sd14_setup()
    rng = jax.random.PRNGKey(3)

    clip = CLIPTextModel(CLIP_VIT_L_14)
    clip_shapes = jax.eval_shape(
        lambda: clip.init(rng, jnp.zeros((1, 77), jnp.int32)))
    clip_params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02, s.dtype), clip_shapes)
    vae = AutoencoderKL(SD14_VAE, dtype=jnp.bfloat16)
    vae_shapes = jax.eval_shape(
        lambda: vae.init({"params": rng}, jnp.zeros((1, 512, 512, 3)), rng))
    vae_params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02,
                           jnp.bfloat16 if (s.dtype == jnp.float32
                                            and len(s.shape) > 1) else s.dtype),
        vae_shapes)

    sched = DDPMScheduler()
    rep = RepellencyConfig(method="kernel_fast", sigma=3.15, scale=0.33,
                           beta_threshold=7.0, use_beta_gate=True)

    def _encode(clip_params, ids):
        ctx, _, _, _ = clip.apply(clip_params, ids)
        return jnp.stack([ctx[:BATCH], ctx[BATCH:]])

    def _scan(unet_params, text, latents, refs, rng):
        import functools
        lat, _ = sample_sd(functools.partial(unet_apply, unet_params), sched,
                           text, latents, rng, STEPS,
                           guidance=GuidanceConfig(guidance_scale=7.5),
                           repellency=rep, refs_nchw=refs,
                           window=RepellencyWindow(1000.0, 780.0))
        return lat

    def _decode(vae_params, lat):
        img = vae.apply(vae_params, lat / SD14_VAE.scaling_factor,
                        method=vae.decode)
        img = jnp.clip(img / 2 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255).astype(jnp.uint8)

    return (clip_params, unet_params, vae_params, latents, refs,
            _encode, _scan, _decode)


def bench_sd14_e2e(int8=None):
    """Whole pipeline wall-clock: tokenize + CLIP-L encode + 50-step scan +
    VAE decode (fabricated real-size weights).

    The scan runs the W8A8 int8 wide-block path by default
    (quantize_unet_params min_dim=1280; SDT_E2E_INT8=0 or ``int8=False``
    restores bf16): the bf16 e2e is device-time-bound at 0.9997× the bar
    (tools_profile_e2e: scan 2579.5 + decode 87.3 + encode 1.0 ms), so
    only a scan win can put the pipeline over 1.0×, and the int8 wide
    blocks are a measured +2.56% scan win with image-level quality
    evidence: 0/64 NudeNet decision flips, repellency-activation agreement
    1.0, latent rel-l2 2.2% (calibrated gate) / 5.7% (forced renoise path)
    on full-size real-random-init towers — tools_quality_int8.py,
    docs/QUALITY_INT8.md, within the ≤2% BASELINE.md budget. main() also
    records a bf16 CONTROL line in the default run (ADVICE r4: both
    precisions visible in every record, the int8 number never stands
    alone)."""
    import numpy as np

    e2e_int8 = (os.environ.get("SDT_E2E_INT8", "1") == "1"
                if int8 is None else bool(int8))
    # save/restore rather than pop: callers importing this leg directly
    # (tools harnesses) may run under their own ambient SDT_INT8 (ADVICE r4).
    # The env is forced BOTH ways — a bf16 control under ambient SDT_INT8=1
    # would otherwise silently measure the int8 scan under a bf16 label.
    prior_int8 = os.environ.get("SDT_INT8")
    if e2e_int8:
        os.environ["SDT_INT8"] = "1"
    else:
        os.environ.pop("SDT_INT8", None)
    try:
        (clip_params, unet_params, vae_params, latents, refs,
         _encode, _scan, _decode) = _e2e_setup()
    finally:
        if prior_int8 is None:
            os.environ.pop("SDT_INT8", None)
        else:
            os.environ["SDT_INT8"] = prior_int8

    rs = np.random.RandomState(0)

    # SDT_E2E_FUSED=1 (default): encode+scan+decode as ONE jitted program —
    # 1 dispatch RPC/round instead of 3 (tools_ab_e2e.py ABA: fused
    # 1.4921/1.4904 vs staged 1.4855/1.4779, +0.44%). The round-1 "mega-jit
    # never finished compiling" failure was the close-over-params
    # constant-inlining trap; with params as jit ARGUMENTS it compiles in
    # ~30 s cold and hits the persistent cache after. =0 restores the
    # 3-stage dispatch (how the real runner stages the pipeline).
    if os.environ.get("SDT_E2E_FUSED", "1") == "1":
        @jax.jit
        def fused(clip_params, unet_params, vae_params, ids, latents, refs,
                  rng):
            text = _encode(clip_params, ids)
            return _decode(vae_params,
                           _scan(unet_params, text, latents, refs, rng))

        def dispatch(rng_key):
            # host-side tokenize stand-in: BPE cost is microseconds/prompt
            ids = jnp.asarray(rs.randint(0, 49408, (2 * BATCH, 77)),
                              dtype=jnp.int32)
            return fused(clip_params, unet_params, vae_params, ids, latents,
                         refs, rng_key)
    else:
        encode, scan, decode = map(jax.jit, (_encode, _scan, _decode))

        def dispatch(rng_key):
            ids = jnp.asarray(rs.randint(0, 49408, (2 * BATCH, 77)),
                              dtype=jnp.int32)
            text = encode(clip_params, ids)
            lat = scan(unet_params, text, latents, refs, rng_key)
            return decode(vae_params, lat)

    # double-buffered: batch i's host transfer (np.asarray, the PIL-save
    # stand-in) overlaps batch i+1's on-device scan — jax dispatch is async,
    # so only the LAST conversion waits on the device (VERDICT r2 item 2:
    # the serial np.asarray between stages was dead time)
    np.asarray(dispatch(jax.random.PRNGKey(1)))  # warmup, fully real
    # 10 rounds (~27 s): the final round's exposed device->host transfer +
    # conversion (~150 ms, the one the double-buffering cannot overlap) is
    # fixed cost, so doubling the rounds halves its per-round share
    # (5-round legs measured 0.988x vs a 0.9995x device-time bound —
    # tools_profile_e2e 2026-08-19: scan 2579.5 + decode 87.3 + encode 1.0)
    n_rounds = int(os.environ.get("BENCH_E2E_ROUNDS", "10"))
    t0 = time.perf_counter()
    pending = None
    for i in range(n_rounds):
        img = dispatch(jax.random.PRNGKey(2 + i))
        if pending is not None:
            np.asarray(pending)
        pending = img
    np.asarray(pending)
    dt = time.perf_counter() - t0
    ips = (n_rounds * BATCH) / dt

    def _flops_per_img():
        from safe_denoiser_tpu.utils.flops import model_flops
        ids = jax.ShapeDtypeStruct((2 * BATCH, 77), jnp.int32)
        enc = model_flops(_encode, clip_params, ids)
        # per-step UNet at the CFG-folded batch, × 50 steps
        lat_s = jax.ShapeDtypeStruct((2 * BATCH, 64, 64, 4), jnp.float32)

        def _unet_step(p, lat, t, ctx):
            from safe_denoiser_tpu.models import SD14_UNET, UNet2DCondition
            return UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16).apply(
                p, lat, t, ctx)

        ctx_s = jax.ShapeDtypeStruct((2 * BATCH, 77, 768), jnp.float32)
        step = model_flops(_unet_step, unet_params, lat_s,
                           jnp.asarray(500), ctx_s)
        dec = model_flops(_decode, vae_params,
                          jax.ShapeDtypeStruct((BATCH, 64, 64, 4),
                                               jnp.float32))
        return (enc + STEPS * step + dec) / BATCH

    # the precision marker keeps the recorded JSON line honest about WHICH
    # scan this leg ran (session-12 lesson: an int8 number under a metric
    # name readers take as the bf16 parity path is a mislabel)
    return LegResult(ips, _safe_mfu(ips, _flops_per_img),
                     precision="int8_w8a8_wide" if e2e_int8 else "bf16")


def _sd3_setup():
    """MMDiT model + fabricated real-size params + scan inputs (shared by
    the sd3 scan leg and the sd3_e2e stage timings)."""
    from safe_denoiser_tpu.models import SD3_MEDIUM, MMDiT

    b = int(os.environ.get("BENCH_SD3_BATCH", "1"))
    rng = jax.random.PRNGKey(0)
    model = MMDiT(SD3_MEDIUM, dtype=jnp.bfloat16)
    latents = jax.random.normal(rng, (b, 128, 128, 16), dtype=jnp.float32)
    text = jax.random.normal(jax.random.fold_in(rng, 1), (2, b, 333, 4096),
                             dtype=jnp.float32).astype(jnp.bfloat16)
    pooled = jax.random.normal(jax.random.fold_in(rng, 2), (2, b, 2048))
    refs = jax.random.normal(jax.random.fold_in(rng, 3), (16, 16, 128, 128))
    refs = refs / jnp.linalg.norm(refs, axis=1, keepdims=True)

    shapes = jax.eval_shape(
        lambda: model.init(rng, latents[:1], jnp.asarray(1.0),
                           text[0, :1], pooled[0, :1]))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02,
                           jnp.bfloat16 if (s.dtype == jnp.float32
                                            and len(s.shape) > 1) else s.dtype),
        shapes)
    return model, params, latents, text, pooled, refs, b


def bench_sd3(steps=STEPS):
    """SD3-medium MMDiT 50-step flow-matching scan with fast_sdv3
    repellency (channel-normalized x), 1024x1024 latents, CFG pair."""
    model, params, latents, text, pooled, refs, b = _sd3_setup()

    if os.environ.get("SDT_INT8") == "1":
        # Opt-in W8A8 int8 for the MMDiT block dots (ops/quant.py): weights
        # quantized ONCE here, outside the scan; activations dynamically
        # per-token in-graph. Informational config — the parity-tested bf16
        # path above is what the recorded sd3 line measures.
        from safe_denoiser_tpu.ops.quant import quantize_mmdit_params
        pq, qt = jax.jit(quantize_mmdit_params)(params["params"])
        params = {"params": pq, "quant": qt}

    run, tf_apply = _sd3_scan_run(model, steps)
    dt, n = _time_run(run, (params, latents, text, pooled, refs))
    ips = (n * b) / dt

    def _flops_per_img():
        return _sd3_step_flops(tf_apply, params, latents, text,
                               pooled) * steps / b

    return LegResult(ips, _safe_mfu(ips, _flops_per_img))


def _sd3_scan_run(model, steps):
    """The jitted SD3 sampling-scan program — single-sourced so the sd3 and
    sd3_e2e legs measure the identical scan. Returns (run, tf_apply)."""
    from safe_denoiser_tpu.pipeline import RepellencyWindow
    from safe_denoiser_tpu.pipeline.sampler import sample_sd3
    from safe_denoiser_tpu.repellency import RepellencyConfig
    from safe_denoiser_tpu.schedulers import FlowMatchEulerScheduler

    def tf_apply(params, lat, t, ctx, pool):
        return model.apply(params, lat, t, ctx, pool)

    sched = FlowMatchEulerScheduler()
    # SD3 nudity task hyperparameters (configs/, SURVEY config table)
    rep = RepellencyConfig(method="kernel_fast", sigma=2.75, scale=0.03,
                           use_beta_gate=False, normalize_x=True)

    @jax.jit
    def run(params, latents, text, pooled, refs, rng):
        import functools
        lat, applied = sample_sd3(
            functools.partial(tf_apply, params), sched, text, pooled,
            latents, rng, steps,
            guidance_scale=2.5, repellency=rep, refs_nchw=refs,
            window=RepellencyWindow(1000.0, 780.0))
        return lat, jnp.sum(applied)

    return run, tf_apply


def _sd3_step_flops(tf_apply, params, latents, text, pooled):
    """Analytic matmul+conv FLOPs of ONE CFG-folded MMDiT denoise step."""
    from safe_denoiser_tpu.utils.flops import model_flops
    b = latents.shape[0]
    latent_in = jnp.concatenate([latents] * 2, axis=0)
    return model_flops(
        tf_apply, params, latent_in, jnp.zeros((2 * b,)),
        text.reshape(2 * b, *text.shape[2:]),
        pooled.reshape(2 * b, *pooled.shape[2:]))


def bench_sd3_e2e():
    """Whole SD3 pipeline wall-clock: triple text encode (CLIP-L +
    CLIP-bigG penultimate states padded to the joint dim, T5-XXL — the
    reference's encode, diffusion_sd3.py::_encode_one) + the 50-step
    MMDiT scan + the 1024² 16-channel VAE decode.

    STAGED: the three programs are timed separately and the per-batch times
    summed. The full fabricated tower set (T5-XXL ~9.4 GB bf16 + MMDiT
    ~4.2 GB + CLIP-G/L + VAE) cannot co-reside in 16 GB HBM, so the encode
    towers are freed before the scan — which matches the reference's serial
    stage order anyway (run_nudity_sdv3.py:351-360); on one chip there is
    no encode/scan overlap to lose, only the ~once-per-batch dispatch gap.

    The recorded line runs the W8A8 int8 MMDiT scan (SDT_E2E_INT8=0
    restores bf16-only), mirroring the sd14 e2e move: the bf16 SD3 e2e is
    0.99× the bar (BENCH_r04) while int8 is a measured +16-21% scan win
    (sd3_int8 leg 1.2156×) with image-level quality evidence — 0/32
    NudeNet decision flips, 736/736 renoise-activation agreement, within the ≤2%
    BASELINE.md budget (tools_quality_int8.py sd3, docs/QUALITY_INT8.md).
    The encode/decode stages are precision-independent, so the bf16
    CONTROL scan is timed in the same session and the composed bf16 e2e
    number rides along as ``bf16_control`` (+ its own control line in
    main()) — the int8 number never stands alone (ADVICE r4).
    """
    import gc

    from safe_denoiser_tpu.models import (
        CLIP_BIG_G, CLIP_VIT_L_14, SD3_VAE, T5_XXL, AutoencoderKL,
        CLIPTextModel, T5Encoder)
    from safe_denoiser_tpu.utils.flops import model_flops

    b = int(os.environ.get("BENCH_SD3_BATCH", "1"))
    rng = jax.random.PRNGKey(0)

    def _fab(module, *init_args):
        shapes = jax.eval_shape(lambda: module.init(rng, *init_args))
        return jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.02,
                               jnp.bfloat16 if (s.dtype == jnp.float32
                                                and len(s.shape) > 1)
                               else s.dtype), shapes)

    # ---- stage 1: triple text encode (then FREE the towers) ---------------
    clip_l = CLIPTextModel(CLIP_VIT_L_14)
    clip_g = CLIPTextModel(CLIP_BIG_G)
    t5 = T5Encoder(T5_XXL, dtype=jnp.bfloat16)
    p_l = _fab(clip_l, jnp.zeros((1, 77), jnp.int32))
    p_g = _fab(clip_g, jnp.zeros((1, 77), jnp.int32))
    p_t5 = _fab(t5, jnp.zeros((1, 256), jnp.int32))

    joint = 4096

    def _encode(p_l, p_g, p_t5, ids_l, ids_g, ids_t):
        # the joint-embed convention is single-sourced with the pipeline
        # and the AOT export — this leg must measure the served program
        from safe_denoiser_tpu.pipeline.diffusion_sd3 import joint_text_embed
        _, pen_l, _, proj_l = clip_l.apply(p_l, ids_l)
        _, pen_g, _, proj_g = clip_g.apply(p_g, ids_g)
        t5_embed = t5.apply(p_t5, ids_t)
        return joint_text_embed(pen_l, proj_l, pen_g, proj_g, t5_embed,
                                joint)

    import numpy as np
    rs = np.random.RandomState(0)
    ids_l = jnp.asarray(rs.randint(0, 49408, (2 * b, 77)), jnp.int32)
    ids_g = jnp.asarray(rs.randint(0, 49408, (2 * b, 77)), jnp.int32)
    ids_t = jnp.asarray(rs.randint(0, 32128, (2 * b, 256)), jnp.int32)

    enc = jax.jit(_encode)
    dt_enc, n_enc = _time_run(
        lambda *a: enc(*a[:-1]), (p_l, p_g, p_t5, ids_l, ids_g, ids_t))
    t_enc = dt_enc / n_enc
    enc_flops = model_flops(_encode, p_l, p_g, p_t5, ids_l, ids_g, ids_t)
    del p_l, p_g, p_t5, enc
    gc.collect()

    # ---- stage 2: the 50-step scan (identical program to the sd3 leg) -----
    model, params, latents, text, pooled, refs, _ = _sd3_setup()
    run, tf_apply = _sd3_scan_run(model, STEPS)
    dt_scan, n_scan = _time_run(run, (params, latents, text, pooled, refs))
    t_scan = dt_scan / n_scan
    step_flops = _sd3_step_flops(tf_apply, params, latents, text, pooled)

    # int8 scan (recorded path; same quantize as the sd3_int8 leg / the
    # runners' --int8). Timed in the SAME session as the bf16 control above
    # so the two composed e2e numbers share the encode/decode measurements.
    # An int8 failure (Mosaic remote-compile crash, wedged tunnel — both
    # documented failure modes) must NOT lose the already-measured bf16
    # control: fall back to recording the bf16 composition.
    e2e_int8 = os.environ.get("SDT_E2E_INT8", "1") == "1"
    t_scan_i8 = step_flops_i8 = None
    if e2e_int8:
        try:
            from safe_denoiser_tpu.ops.quant import quantize_mmdit_params
            pq, qt = jax.jit(quantize_mmdit_params)(params["params"])
            qparams = {"params": pq, "quant": qt}
            dt_i8, n_i8 = _time_run(run,
                                    (qparams, latents, text, pooled, refs))
            t_scan_i8 = dt_i8 / n_i8
            step_flops_i8 = _sd3_step_flops(tf_apply, qparams, latents,
                                            text, pooled)
        except Exception:
            import sys
            import traceback
            print("[bench] sd3_e2e int8 scan FAILED — recording the bf16 "
                  "composition instead:", file=sys.stderr)
            traceback.print_exc()
            e2e_int8 = False

    # ---- stage 3: 1024² VAE decode ----------------------------------------
    vae = AutoencoderKL(SD3_VAE, dtype=jnp.bfloat16)
    p_vae = _fab(vae, jnp.zeros((1, 256, 256, 3)), rng)

    def _decode(p, z):
        # scaling + shift exactly as the pipeline decodes
        # (diffusion_sd3.py generate_batch: z/scaling + shift)
        z = z / SD3_VAE.scaling_factor + SD3_VAE.shift_factor
        img = vae.apply(p, z, method=vae.decode)
        img = jnp.clip(img / 2 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255).astype(jnp.uint8)

    dec = jax.jit(_decode)
    dec_flops = model_flops(_decode, p_vae, latents)
    dt_dec, n_dec = _time_run(lambda p, z, rng: dec(p, z), (p_vae, latents))
    t_dec = dt_dec / n_dec

    ips_bf16 = b / (t_enc + t_scan + t_dec)
    flops_bf16 = (enc_flops + STEPS * step_flops + dec_flops) / b
    if not e2e_int8:
        return LegResult(ips_bf16, _safe_mfu(ips_bf16, lambda: flops_bf16),
                         precision="bf16")
    ips = b / (t_enc + t_scan_i8 + t_dec)
    flops_i8 = (enc_flops + STEPS * step_flops_i8 + dec_flops) / b
    return LegResult(ips, _safe_mfu(ips, lambda: flops_i8),
                     precision="int8_w8a8",
                     bf16_control=round(ips_bf16, 4))


def main():
    import sys
    import traceback

    only = os.environ.get("BENCH_ONLY")
    fast = os.environ.get("BENCH_FAST") == "1"

    # An ambient SDT_INT8=1 must NOT silently quantize the parity legs: the
    # driver parses the final headline line as the bf16 parity record, and an
    # int8 number under that name would be mislabeled. The int8 legs below
    # set/pop the var around their own setup; everything else runs bf16.
    # (tools_ab_int8_sd14.py calls bench_sd14() directly, not main(), so its
    # env-driven A/B is unaffected.)
    if os.environ.pop("SDT_INT8", None) == "1":
        print("[bench] ignoring ambient SDT_INT8=1 — int8 runs only in the "
              "dedicated sd14_int8/sd3_int8 legs (BENCH_ONLY selects them)",
              file=sys.stderr)

    def _try(name, fn, baseline):
        # a secondary benchmark failing (compile crash, OOM) must never
        # prevent the headline metric from printing
        try:
            _emit(name, fn(), baseline)
        except Exception:
            print(f"[bench] {name} FAILED:", file=sys.stderr)
            traceback.print_exc()

    def _sd14_sparse():
        # BASELINE config 3: artist-erasure sparse (SPELL) repellency
        from safe_denoiser_tpu.repellency import RepellencyConfig
        return bench_sd14(rep=RepellencyConfig(
            method="sparse", radius=38.746, scale=1.6))

    def _sd14_bank3k():
        # BASELINE config 4: CoPro's 3,000-image kernel_fast bank
        global BANK_M
        saved, BANK_M = BANK_M, 3000
        try:
            return bench_sd14()
        finally:
            BANK_M = saved

    # headline FIRST as a hedge, re-printed LAST for the driver's last-line
    # parse: the axon tunnel can wedge indefinitely mid-run (2026-08-17: the
    # first RPC of a full run blocked >40 min until the timeout killed it) —
    # measuring the headline before the secondaries means a mid-run wedge
    # still leaves the headline line in the recorded tail.
    headline = None
    if only in (None, "sd14") and not fast:
        headline = bench_sd14()
        _emit("sd14_50step_safe_denoiser_throughput", headline,
              BASELINE_IMG_PER_SEC)

    if not fast:
        if only in (None, "sd14_10"):
            _try("sd14_10step_ddim_safe_denoiser_throughput",
                 lambda: bench_sd14(steps=10, scheduler_kind="ddim"),
                 BASELINE_10STEP)
        if only in (None, "sd14_e2e"):
            # BASELINE config 2. Default: int8 wide-block scan under the
            # BASELINE metric name (precision marker) PLUS a bf16 control
            # line — both precisions in every default record (ADVICE r4);
            # the control's failure must never kill the BASELINE line.
            def _sd14_e2e():
                if os.environ.get("SDT_E2E_INT8", "1") != "1":
                    return bench_sd14_e2e()
                ctrl = None
                try:
                    ctrl = bench_sd14_e2e(int8=False)
                    _emit("sd14_50step_e2e_bf16_control_throughput", ctrl,
                          BASELINE_IMG_PER_SEC)
                except Exception:
                    print("[bench] sd14 e2e bf16 control FAILED "
                          "(BASELINE leg still runs):", file=sys.stderr)
                    traceback.print_exc()
                res = bench_sd14_e2e(int8=True)
                if ctrl is not None:
                    res.extra["bf16_control"] = round(float(ctrl), 4)
                return res
            _try("sd14_50step_e2e_pipeline_throughput", _sd14_e2e,
                 BASELINE_IMG_PER_SEC)
        if only in (None, "sd14_sparse"):
            _try("sd14_50step_sparse_repellency_throughput", _sd14_sparse,
                 BASELINE_IMG_PER_SEC)
        if only in (None, "sd14_bank3k"):
            _try("sd14_50step_bank3000_throughput", _sd14_bank3k,
                 BASELINE_IMG_PER_SEC)
        if only in (None, "sd3"):
            _try("sd3_50step_safe_denoiser_throughput", bench_sd3,
                 BASELINE_SD3)
        if only in (None, "sd3_e2e"):
            # the biggest model's full pipeline cost (triple text encode
            # incl. T5-XXL + scan + 1024² VAE decode), staged. Recorded
            # path = quality-cleared int8 scan (VERDICT r4 #1); the bf16
            # control composed from the same encode/decode measurements
            # gets its own line so both precisions are in every record.
            def _sd3_e2e():
                res = bench_sd3_e2e()
                ctrl = (res.extra or {}).get("bf16_control")
                if ctrl is not None:
                    _emit("sd3_50step_e2e_bf16_control_throughput",
                          LegResult(ctrl, None, precision="bf16"),
                          BASELINE_SD3)
                return res
            _try("sd3_50step_e2e_pipeline_throughput", _sd3_e2e,
                 BASELINE_SD3)
        if only in (None, "sd3_int8"):
            # informational beyond-parity config: W8A8 int8 MMDiT block
            # dots (ops/quant.py; --int8 on the SD3 runners). Same-session
            # ABA 2026-08-19: 0.1519 vs 0.1307/0.1307 controls = +16.3%.
            def _sd3_int8():
                os.environ["SDT_INT8"] = "1"
                try:
                    return bench_sd3()
                finally:
                    os.environ.pop("SDT_INT8", None)
            _try("sd3_int8_50step_safe_denoiser_throughput", _sd3_int8,
                 BASELINE_SD3)
        if only in (None, "sd14_int8"):
            # informational beyond-parity config: W8A8 int8 UNet wide-block
            # (level-2/mid C=1280) dots (quantize_unet_params; --int8 on the
            # SD-v1 runners). Same-session ABA 2026-08-19: 1.5844 vs
            # 1.5448/1.5447 controls = +2.56% (drift -0.01%).
            def _sd14_int8():
                os.environ["SDT_INT8"] = "1"
                try:
                    return bench_sd14()
                finally:
                    os.environ.pop("SDT_INT8", None)
            _try("sd14_int8_50step_safe_denoiser_throughput", _sd14_int8,
                 BASELINE_IMG_PER_SEC)
    if only in (None, "sd14"):
        # headline LAST: the driver parses the final JSON line (the value
        # re-printed from the up-front measurement when one exists)
        if headline is None:
            headline = bench_sd14()
        _emit("sd14_50step_safe_denoiser_throughput", headline,
              BASELINE_IMG_PER_SEC)


def _supervise():
    """Watchdog wrapper: run the benchmarks in a timed child process.

    The axon tunnel can wedge indefinitely on ANY RPC (sessions 4-6: a
    256x256 matmul blocked >4 min repeatedly; a full run blocked >40 min
    producing nothing). A blocked RPC cannot be interrupted in-process —
    the thread is stuck inside the client — so the only robust watchdog is
    a parent that kills and respawns. Protocol: stream the child's stdout
    through verbatim (the driver parses our last JSON line); if the full
    run times out, fall back to headline-only (BENCH_FAST=1) retries —
    the tunnel sometimes recovers on a fresh process minutes later. The
    last seen headline JSON line is re-printed LAST either way. No line is
    ever fabricated: every JSON line printed was measured by some child."""
    import subprocess
    import sys
    import threading

    lines: list[str] = []

    def _run_child(env_extra, timeout_s):
        env = dict(os.environ, BENCH_CHILD="1", **env_extra)
        p = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                             stdout=subprocess.PIPE, text=True, env=env)

        def _reader():
            for line in p.stdout:
                line = line.rstrip("\n")
                print(line, flush=True)
                if line.startswith("{"):
                    lines.append(line)

        t = threading.Thread(target=_reader, daemon=True)
        t.start()
        try:
            p.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            print(f"[bench] child exceeded {timeout_s}s (tunnel wedge?), "
                  "killing", file=sys.stderr, flush=True)
            p.kill()
            p.wait()
        t.join(timeout=10)
        return p.returncode

    def _headline_lines():
        return [l for l in lines if "sd14_50step_safe_denoiser" in l]

    # 7 legs ran in ~1,830 s warm-cache (2026-08-19); sd14_int8 and sd3_e2e
    # compile their own HLO (int8 dtypes / T5-XXL + CLIP-G towers — NOT
    # cache hits on the headline program). Round 5 adds the bf16 sd14 e2e
    # control (one more fused-program measure; its HLO is the pre-r4
    # default, usually a persistent-cache hit) and the int8 SD3 scan inside
    # sd3_e2e (makes the later sd3_int8 leg a cache hit). 5,400 leaves
    # headroom for a cold compile cache without letting a wedged tunnel eat
    # the round
    rc = _run_child({}, timeout_s=int(os.environ.get("BENCH_TIMEOUT",
                                                     "5400")))
    if os.environ.get("BENCH_ONLY") not in (None, "sd14"):
        return rc   # headline not expected under this BENCH_ONLY
    attempts = 0
    while not _headline_lines() and attempts < 3:
        attempts += 1
        print(f"[bench] no headline yet; headline-only retry {attempts}/3",
              file=sys.stderr, flush=True)
        time.sleep(int(os.environ.get("BENCH_RETRY_SLEEP", "300")))
        rc = _run_child({"BENCH_FAST": "1"}, timeout_s=1800)
    hl = _headline_lines()
    if hl and lines and lines[-1] != hl[-1]:
        print(hl[-1], flush=True)   # driver parses the LAST JSON line
    return 0 if hl else (rc or 1)


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") == "1" or \
            os.environ.get("BENCH_SUPERVISE", "1") == "0":
        main()
    else:
        raise SystemExit(_supervise())
