"""Image-level bf16-vs-int8 quality A/B (VERDICT r3 item 1 / next #1).

Question: does the W8A8 int8 path (``quantize_unet_params`` wide blocks for
SD-v1, ``quantize_mmdit_params`` for SD3) change the *decisions* the
pipeline exists to make — the NudeNet unsafe gate (reference
run_nudity.py:215-227, threshold 0.6) and the repellency activation
pattern — or only pixels below the decision noise floor?

Protocol (per family):
  * full-size towers, REAL random init (flax initializers, seeded on the
    TPU) — NOT the constant-fill bench fabrications: constant kernels
    quantize exactly, so a constant-fill A/B would be vacuous;
  * a negative bank seeded from the model's OWN trajectory latents (a
    repellency-free pre-pass); the β gate threshold comes from an EXACT
    in-window β trajectory probe (CFG-combined x̂₀ at every window step).
    Measured finding (docs/QUALITY_INT8.md): on random-weight trajectories
    β underflows to exactly 0 in f32 — the calibrated gate is
    deterministically closed in both arms (and int8 cannot open it), so
    the forced run below carries the open-gate evidence;
  * same seeds / text embeddings / bank in both arms; N samples each;
  * measured: NudeNet decision flip rate at 0.6 (structurally-faithful
    fabricated classifier — tests/test_nudenet_graph.py — since the real
    classifier_model.onnx is env-blocked), repellency activation agreement
    per step × sample, latent rel-l2, decoded-pixel mean|Δ|, and the
    unsafe-prob spread (to prove the decisions aren't degenerate);
  * a second FORCED-gate run (β threshold −1e9) guarantees the renoise
    branch itself is exercised and measured even if the calibrated gate
    fires rarely.

Acceptance (BASELINE.md ≤2% metric budget): flip rate ≤ 2% AND activation
agreement ≥ 98%. On pass, bench.py's e2e leg is entitled to record the
int8 scan path (the only route to e2e ≥ 1.0× given the 0.9997× bf16
device-time bound, tools_profile_e2e 2026-08-19).

Usage:  python tools_quality_int8.py [sd14|sd3|all]   (default all)
Env:    SDT_QA_N=64 (SD-v1 samples), SDT_QA_N_SD3=32, SDT_QA_STEPS=50
Output: one JSON line per family with every metric + pass/fail.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

STEPS = int(os.environ.get("SDT_QA_STEPS", "50"))
GATE = 0.6                       # reference run_nudity.py:583 default


def _classifier(tmpdir: str):
    """Fabricated structurally-faithful NudeNet (real one is env-blocked)."""
    from tests.test_nudenet_graph import _build_graph_and_torch

    from safe_denoiser_tpu.evals.nudenet import NudeClassifier

    model_bytes, _ = _build_graph_and_torch()
    path = os.path.join(tmpdir, "classifier_model.onnx")
    with open(path, "wb") as f:
        f.write(model_bytes)
    return NudeClassifier(path)


def _unsafe_probs(classifier, images_u8: np.ndarray) -> np.ndarray:
    preds = classifier.classify(images=list(images_u8),
                                image_names=list(range(len(images_u8))))
    return np.asarray([preds[i]["unsafe"] for i in range(len(images_u8))])


def _decode_norm(lat_ref_stats, lat: jnp.ndarray, decode) -> np.ndarray:
    """Decode latents to uint8 images, standardized by the BF16 arm's
    per-sample stats (same transform both arms): random-init UNets drift
    latent magnitudes over 50 steps, and without a shared normalization the
    decode clip saturates and every decision degenerates to the same
    constant image."""
    mean, std = lat_ref_stats
    z = (lat - mean) / std
    return np.asarray(decode(z))


def _arm_stats(name, lat_a, lat_b, app_a, app_b, probs_a, probs_b):
    rel = float(jnp.linalg.norm((lat_b - lat_a).astype(jnp.float32))
                / (jnp.linalg.norm(lat_a.astype(jnp.float32)) + 1e-12))
    agree = float(np.mean(np.asarray(app_a) == np.asarray(app_b)))
    dec_a = probs_a >= GATE
    dec_b = probs_b >= GATE
    flips = int(np.sum(dec_a != dec_b))
    return {
        f"{name}_latent_rel_l2": round(rel, 6),
        f"{name}_activation_agreement": round(agree, 6),
        f"{name}_activations_bf16": int(np.sum(app_a)),
        f"{name}_activations_int8": int(np.sum(app_b)),
        f"{name}_decision_flips": flips,
        f"{name}_flip_rate": round(flips / max(len(probs_a), 1), 6),
        f"{name}_prob_mean_abs_delta": round(
            float(np.mean(np.abs(probs_a - probs_b))), 6),
        f"{name}_prob_spread_bf16": round(
            float(np.std(probs_a)), 6),
    }


# --------------------------------------------------------------------------
# SD-v1.4: full-size UNet, wide-block (min_dim=1280) W8A8
# --------------------------------------------------------------------------
def run_sd14(tmpdir: str) -> dict:
    from safe_denoiser_tpu.models import (
        SD14_UNET, SD14_VAE, AutoencoderKL, UNet2DCondition)
    from safe_denoiser_tpu.ops.quant import quantize_unet_params
    from safe_denoiser_tpu.ops.repellency_kernels import (
        rbf_negative_score_ref)
    from safe_denoiser_tpu.pipeline import (
        GuidanceConfig, RepellencyWindow, sample_sd)
    from safe_denoiser_tpu.repellency import RepellencyConfig
    from safe_denoiser_tpu.schedulers import DDPMScheduler

    n = int(os.environ.get("SDT_QA_N", "64"))
    batch = 4
    assert n % batch == 0
    rng = jax.random.PRNGKey(2024)

    model = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    # real init on-device, then bf16 storage for 2D+ kernels (the loaders'
    # convention) so both arms quantize/compute from identical weights
    p0 = model.init(rng, jnp.zeros((1, 64, 64, 4)), jnp.asarray(1),
                    jnp.zeros((1, 77, 768)))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if (a.dtype == jnp.float32 and a.ndim > 1) else a, p0)
    del p0
    pq, qt = jax.jit(functools.partial(quantize_unet_params,
                                       min_dim=1280))(params["params"])
    params_q = {"params": pq, "quant": qt}

    vae = AutoencoderKL(SD14_VAE, dtype=jnp.bfloat16)
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 512, 512, 3)), rng)

    @jax.jit
    def decode(z):
        img = vae.apply(vae_params, z / SD14_VAE.scaling_factor,
                        method=vae.decode)
        img = jnp.clip(img / 2 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255).astype(jnp.uint8)

    sched = DDPMScheduler()
    window = RepellencyWindow(1000.0, 780.0)

    def unet_apply(p, lat, t, ctx, freeu=None):
        return model.apply(p, lat, t, ctx, freeu=freeu)

    @functools.partial(jax.jit, static_argnames=("rep",))
    def run(p, text, latents, refs, keys, rep):
        lat, applied = sample_sd(
            functools.partial(unet_apply, p), sched, text, latents, keys,
            STEPS, guidance=GuidanceConfig(guidance_scale=7.5),
            repellency=rep, refs_nchw=refs, window=window)
        return lat, applied

    # -- bank from the model's own trajectories (repellency-free pre-pass)
    text0 = jax.random.normal(jax.random.fold_in(rng, 1),
                              (2, batch, 77, 768)) * 0.3
    lat0 = jax.random.normal(jax.random.fold_in(rng, 2),
                             (batch, 64, 64, 4), dtype=jnp.float32)
    keys0 = jax.vmap(jax.random.PRNGKey)(
        jnp.arange(7000, 7000 + batch, dtype=jnp.uint32))
    pre, _ = run(params, text0, lat0, None, keys0, None)
    refs = jnp.transpose(pre, (0, 3, 1, 2))                  # [M, 4, 64, 64]
    flat = refs.reshape(refs.shape[0], -1).astype(jnp.float32)
    # Gate threshold from the EXACT in-window β trajectory: step the plain
    # DDPM loop host-side with the same CFG-combined eps the sampler uses,
    # and record β(x̂₀) at every window step. (Two earlier calibrations
    # failed to fire: the bank's self-β median sits far above trajectory β,
    # and a cond-only step-0 probe underestimates the CFG-amplified x̂₀
    # distances.) Threshold at the median of the window βs → roughly half
    # the step×sample gate decisions sit AT the boundary — the hard case
    # for int8/bf16 agreement.
    win_lo, win_hi = window.t_end, window.t_start

    @jax.jit
    def probe_step(p, lat, t, text, key):
        latent_in = jnp.concatenate([lat] * 2, axis=0)
        eps = model.apply(p, latent_in, t,
                          text.reshape(2 * batch, *text.shape[2:]))
        eps = eps.reshape(2, batch, *eps.shape[1:])
        eps = eps[0] + 7.5 * (eps[1] - eps[0])
        x0 = sched.pred_original_sample(eps, t, lat)
        if isinstance(x0, tuple):
            x0 = x0[0]
        _, beta = rbf_negative_score_ref(
            x0.reshape(batch, -1).astype(jnp.float32), flat, 3.15)
        lat2, _ = sched.step(eps, t, lat, STEPS,
                             noise=jax.random.normal(key, lat.shape,
                                                     dtype=jnp.float32))
        return lat2, beta

    lat_p = jax.random.normal(jax.random.fold_in(rng, 3),
                              (batch, 64, 64, 4), dtype=jnp.float32)
    betas = []
    for si, t in enumerate(np.asarray(sched.timesteps(STEPS))):
        lat_p, beta = probe_step(params, lat_p, jnp.asarray(t),
                                 text0, jax.random.fold_in(rng, 600 + si))
        if win_lo <= float(t) <= win_hi:
            betas.append(np.asarray(beta))
    thresh = float(np.median(np.concatenate(betas)))
    rep_cal = RepellencyConfig(method="kernel_fast", sigma=3.15, scale=0.33,
                               beta_threshold=thresh, use_beta_gate=True)
    rep_forced = RepellencyConfig(method="kernel_fast", sigma=3.15,
                                  scale=0.33, beta_threshold=-1e9,
                                  use_beta_gate=True)

    classifier = _classifier(tmpdir)
    out = {"family": "sd14", "n": n, "steps": STEPS,
           "beta_threshold": float(f"{thresh:.3e}")}
    print(f"[qa] sd14 setup done (beta_threshold={thresh:.3e}), "
          f"{n} samples x 2 gates x 2 arms", file=sys.stderr, flush=True)

    for tag, rep in (("cal", rep_cal), ("forced", rep_forced)):
        lat_a_all, lat_b_all, app_a_all, app_b_all = [], [], [], []
        probs_a_all, probs_b_all = [], []
        for bi in range(n // batch):
            print(f"[qa] sd14/{tag} batch {bi + 1}/{n // batch}",
                  file=sys.stderr, flush=True)
            text = jax.random.normal(jax.random.fold_in(rng, 100 + bi),
                                     (2, batch, 77, 768)) * 0.3
            lat_init = jax.random.normal(jax.random.fold_in(rng, 200 + bi),
                                         (batch, 64, 64, 4),
                                         dtype=jnp.float32)
            keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(
                1000 + bi * batch, 1000 + (bi + 1) * batch, dtype=jnp.uint32))
            lat_a, app_a = run(params, text, lat_init, refs, keys, rep)
            lat_b, app_b = run(params_q, text, lat_init, refs, keys, rep)
            # shared normalization from the BF16 arm (see _decode_norm)
            m = jnp.mean(lat_a, axis=(1, 2, 3), keepdims=True)
            s = jnp.std(lat_a, axis=(1, 2, 3), keepdims=True) + 1e-6
            img_a = _decode_norm((m, s), lat_a, decode)
            img_b = _decode_norm((m, s), lat_b, decode)
            probs_a_all.append(_unsafe_probs(classifier, img_a))
            probs_b_all.append(_unsafe_probs(classifier, img_b))
            lat_a_all.append(lat_a)
            lat_b_all.append(lat_b)
            app_a_all.append(np.asarray(app_a))
            app_b_all.append(np.asarray(app_b))
        out.update(_arm_stats(
            tag, jnp.concatenate(lat_a_all), jnp.concatenate(lat_b_all),
            np.concatenate(app_a_all, axis=1), np.concatenate(app_b_all,
                                                              axis=1),
            np.concatenate(probs_a_all), np.concatenate(probs_b_all)))

    out["pass"] = bool(out["cal_flip_rate"] <= 0.02
                       and out["forced_flip_rate"] <= 0.02
                       and out["cal_activation_agreement"] >= 0.98)
    return out


# --------------------------------------------------------------------------
# SD3-medium: full-size MMDiT W8A8
# --------------------------------------------------------------------------
def run_sd3(tmpdir: str) -> dict:
    from safe_denoiser_tpu.models import SD3_MEDIUM, SD3_VAE, AutoencoderKL, MMDiT
    from safe_denoiser_tpu.ops.quant import quantize_mmdit_params
    from safe_denoiser_tpu.pipeline import RepellencyWindow
    from safe_denoiser_tpu.pipeline.sampler import sample_sd3
    from safe_denoiser_tpu.repellency import RepellencyConfig
    from safe_denoiser_tpu.schedulers import FlowMatchEulerScheduler

    n = int(os.environ.get("SDT_QA_N_SD3", "32"))
    b = 1
    rng = jax.random.PRNGKey(4096)

    model = MMDiT(SD3_MEDIUM, dtype=jnp.bfloat16)
    p0 = model.init(rng, jnp.zeros((1, 128, 128, 16)), jnp.asarray(1.0),
                    jnp.zeros((1, 333, 4096)), jnp.zeros((1, 2048)))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if (a.dtype == jnp.float32 and a.ndim > 1) else a, p0)
    del p0
    pq, qt = jax.jit(quantize_mmdit_params)(params["params"])
    params_q = {"params": pq, "quant": qt}

    vae = AutoencoderKL(SD3_VAE, dtype=jnp.bfloat16)
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 256, 256, 3)), rng)

    @jax.jit
    def decode(z):
        img = vae.apply(vae_params, z / SD3_VAE.scaling_factor,
                        method=vae.decode)
        img = jnp.clip(img / 2 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255).astype(jnp.uint8)

    sched = FlowMatchEulerScheduler()
    rep = RepellencyConfig(method="kernel_fast", sigma=2.75, scale=0.03,
                           use_beta_gate=False, normalize_x=True)
    window = RepellencyWindow(1000.0, 780.0)

    def tf_apply(p, lat, t, ctx, pool):
        return model.apply(p, lat, t, ctx, pool)

    @jax.jit
    def run(p, latents, text, pooled, refs, key):
        lat, applied = sample_sd3(
            functools.partial(tf_apply, p), sched, text, pooled, latents,
            key, STEPS, guidance_scale=2.5, repellency=rep, refs_nchw=refs,
            window=window)
        return lat, applied

    refs = jax.random.normal(jax.random.fold_in(rng, 3), (8, 16, 128, 128))
    refs = refs / jnp.linalg.norm(refs, axis=1, keepdims=True)

    classifier = _classifier(tmpdir)
    lat_a_all, lat_b_all, app_a_all, app_b_all = [], [], [], []
    probs_a_all, probs_b_all = [], []
    for i in range(n):
        print(f"[qa] sd3 sample {i + 1}/{n}", file=sys.stderr, flush=True)
        text = jax.random.normal(jax.random.fold_in(rng, 100 + i),
                                 (2, b, 333, 4096),
                                 dtype=jnp.float32).astype(jnp.bfloat16)
        pooled = jax.random.normal(jax.random.fold_in(rng, 300 + i),
                                   (2, b, 2048))
        lat_init = jax.random.normal(jax.random.fold_in(rng, 500 + i),
                                     (b, 128, 128, 16), dtype=jnp.float32)
        key = jax.random.PRNGKey(9000 + i)
        lat_a, app_a = run(params, lat_init, text, pooled, refs, key)
        lat_b, app_b = run(params_q, lat_init, text, pooled, refs, key)
        m = jnp.mean(lat_a, axis=(1, 2, 3), keepdims=True)
        s = jnp.std(lat_a, axis=(1, 2, 3), keepdims=True) + 1e-6
        probs_a_all.append(_unsafe_probs(
            classifier, _decode_norm((m, s), lat_a, decode)))
        probs_b_all.append(_unsafe_probs(
            classifier, _decode_norm((m, s), lat_b, decode)))
        lat_a_all.append(lat_a)
        lat_b_all.append(lat_b)
        app_a_all.append(np.asarray(app_a))
        app_b_all.append(np.asarray(app_b))

    out = {"family": "sd3", "n": n, "steps": STEPS}
    out.update(_arm_stats(
        "cal", jnp.concatenate(lat_a_all), jnp.concatenate(lat_b_all),
        np.concatenate(app_a_all, axis=1), np.concatenate(app_b_all, axis=1),
        np.concatenate(probs_a_all), np.concatenate(probs_b_all)))
    out["pass"] = bool(out["cal_flip_rate"] <= 0.02
                       and out["cal_activation_agreement"] >= 0.98)
    return out


def main(argv=None):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    which = (argv or sys.argv[1:] or ["all"])[0]
    import tempfile
    tmpdir = tempfile.mkdtemp(prefix="qa_int8_")
    t0 = time.time()
    if which in ("sd14", "all"):
        r = run_sd14(tmpdir)
        r["seconds"] = round(time.time() - t0, 1)
        print(json.dumps(r), flush=True)
    t0 = time.time()
    if which in ("sd3", "all"):
        r = run_sd3(tmpdir)
        r["seconds"] = round(time.time() - t0, 1)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
