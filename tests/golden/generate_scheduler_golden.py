"""Generate tests/golden/scheduler_golden.json.

Provenance levels (recorded in the JSON's "_provenance" key):
  * "diffusers <version>" — the real library was importable and the table
    was recorded from actual DDPMScheduler/DDIMScheduler/
    FlowMatchEulerDiscreteScheduler step calls. This is the target state:
    re-run this script the moment an environment with diffusers exists.
  * "torch_transcription" — fallback: tests/golden/diffusers_torch_ref.py,
    a line-faithful torch transcription of the diffusers 0.29 step math
    (independent of the jax implementation, but one level of independence
    weaker than the library itself — VERDICT r2 Missing #3).
"""
import json

import torch

try:  # prefer true library goldens when the environment allows
    import diffusers  # noqa: F401
    HAVE_DIFFUSERS = True
except ImportError:
    HAVE_DIFFUSERS = False

sample = torch.tensor([0.73, -1.91, 0.244, 3.5])
eps = torch.tensor([-0.31, 0.62, -1.55, 0.09])

DDPM_CASES = [(981, 50, False, "epsilon"), (501, 50, False, "epsilon"),
              (1, 50, False, "epsilon"), (981, 50, True, "epsilon"),
              (501, 50, False, "v_prediction"), (901, 10, False, "epsilon")]
DDIM_CASES = [(901, 10, 0.0, False, False, "epsilon", False),
              (1, 10, 0.0, False, False, "epsilon", False),
              (981, 50, 0.0, True, True, "epsilon", False),
              (901, 10, 0.5, False, False, "epsilon", False),
              (501, 50, 0.0, False, False, "v_prediction", False),
              (1, 10, 0.0, False, False, "epsilon", True)]
FLOW_CASES = [(28, 3.0), (50, 3.0), (50, 1.0), (28, 6.0)]
NOISE_TS = [17, 501, 999]


def from_transcription():
    from diffusers_torch_ref import ddim_step, ddpm_step, flow_sigmas, tables

    out = {"_provenance": "torch_transcription"}
    ac = tables()

    rows = []
    for (t, steps, clip, ptype) in DDPM_CASES:
        prev, x0, std = ddpm_step(ac, t, steps, sample, eps, clip, ptype)
        rows.append({"t": t, "steps": steps, "clip": clip, "pred_type": ptype,
                     "prev": prev.tolist(), "x0": x0.tolist(),
                     "std": float(std)})
    out["ddpm"] = rows

    rows = []
    for (t, steps, eta, clip, uc, ptype, sa1) in DDIM_CASES:
        prev, x0, std = ddim_step(ac, t, steps, sample, eps, eta, clip, uc,
                                  ptype, sa1)
        rows.append({"t": t, "steps": steps, "eta": eta, "clip": clip,
                     "use_clipped": uc, "pred_type": ptype,
                     "set_alpha_to_one": sa1, "prev": prev.tolist(),
                     "x0": x0.tolist(), "std": float(std)})
    out["ddim"] = rows

    out["add_noise"] = [
        {"t": t, "noised": (ac[t] ** 0.5 * sample
                            + (1 - ac[t]) ** 0.5 * eps).tolist()}
        for t in NOISE_TS]

    rows = []
    for steps, shift in FLOW_CASES:
        ts, sg = flow_sigmas(steps, shift)
        rows.append({"steps": steps, "shift": shift,
                     "timesteps_first3": ts[:3].tolist(),
                     "timesteps_last2": ts[-2:].tolist(),
                     "sigmas_first3": sg[:3].tolist(),
                     "sigmas_last3": sg[-3:].tolist()})
    out["flow_match"] = rows

    out["alphas_cumprod_probe"] = {str(t): float(ac[t])
                                   for t in [0, 1, 500, 981, 999]}
    return out


def from_diffusers():
    """True library goldens — same cases, recorded from real scheduler calls
    (the reference's exact loaders: run_nudity.py:108 DDPMScheduler,
    run_nudity_sdv3.py FlowMatchEulerDiscreteScheduler)."""
    from diffusers import (DDIMScheduler, DDPMScheduler,
                           FlowMatchEulerDiscreteScheduler)

    out = {"_provenance": f"diffusers {diffusers.__version__}"}

    rows = []
    for (t, steps, clip, ptype) in DDPM_CASES:
        s = DDPMScheduler(clip_sample=clip, prediction_type=ptype)
        s.set_timesteps(steps)
        r = s.step(eps, t, sample, generator=torch.Generator().manual_seed(0))
        std = (s._get_variance(t) ** 0.5) if t > 0 else 0.0
        rows.append({"t": t, "steps": steps, "clip": clip, "pred_type": ptype,
                     "prev": r.prev_sample.tolist(),
                     "x0": r.pred_original_sample.tolist(),
                     "std": float(std)})
    out["ddpm"] = rows

    rows = []
    for (t, steps, eta, clip, uc, ptype, sa1) in DDIM_CASES:
        s = DDIMScheduler(clip_sample=clip, prediction_type=ptype,
                          set_alpha_to_one=sa1)
        s.set_timesteps(steps)
        r = s.step(eps, t, sample, eta=eta, use_clipped_model_output=uc)
        prev_t = t - s.config.num_train_timesteps // steps
        std = (s._get_variance(t, prev_t) ** 0.5) * eta
        rows.append({"t": t, "steps": steps, "eta": eta, "clip": clip,
                     "use_clipped": uc, "pred_type": ptype,
                     "set_alpha_to_one": sa1,
                     "prev": r.prev_sample.tolist(),
                     "x0": r.pred_original_sample.tolist(),
                     "std": float(std)})
    out["ddim"] = rows

    s = DDPMScheduler()
    out["add_noise"] = [
        {"t": t, "noised": s.add_noise(sample, eps,
                                       torch.tensor([t])).tolist()}
        for t in NOISE_TS]

    rows = []
    for steps, shift in FLOW_CASES:
        s = FlowMatchEulerDiscreteScheduler(shift=shift)
        s.set_timesteps(steps)
        ts, sg = s.timesteps, s.sigmas
        rows.append({"steps": steps, "shift": shift,
                     "timesteps_first3": ts[:3].tolist(),
                     "timesteps_last2": ts[-2:].tolist(),
                     "sigmas_first3": sg[:3].tolist(),
                     "sigmas_last3": sg[-3:].tolist()})
    out["flow_match"] = rows

    s = DDPMScheduler()
    out["alphas_cumprod_probe"] = {str(t): float(s.alphas_cumprod[t])
                                   for t in [0, 1, 500, 981, 999]}
    return out


if __name__ == "__main__":
    out = from_diffusers() if HAVE_DIFFUSERS else from_transcription()
    print(json.dumps(out, indent=1))
