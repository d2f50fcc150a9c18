"""Generate tests/golden/scheduler_golden.json from the torch transcription
(regenerate with real diffusers when available to upgrade to library goldens)."""
import json
import numpy as np
import torch

from diffusers_torch_ref import ddim_step, ddpm_step, flow_sigmas, tables

out = {}
ac = tables()
sample = torch.tensor([0.73, -1.91, 0.244, 3.5])
eps = torch.tensor([-0.31, 0.62, -1.55, 0.09])

rows = []
for (t, steps, clip, ptype) in [(981, 50, False, "epsilon"), (501, 50, False, "epsilon"),
                                (1, 50, False, "epsilon"), (981, 50, True, "epsilon"),
                                (501, 50, False, "v_prediction"), (901, 10, False, "epsilon")]:
    prev, x0, std = ddpm_step(ac, t, steps, sample, eps, clip, ptype)
    rows.append({"t": t, "steps": steps, "clip": clip, "pred_type": ptype,
                 "prev": prev.tolist(), "x0": x0.tolist(), "std": float(std)})
out["ddpm"] = rows

rows = []
for (t, steps, eta, clip, uc, ptype, sa1) in [
        (901, 10, 0.0, False, False, "epsilon", False),
        (1, 10, 0.0, False, False, "epsilon", False),
        (981, 50, 0.0, True, True, "epsilon", False),
        (901, 10, 0.5, False, False, "epsilon", False),
        (501, 50, 0.0, False, False, "v_prediction", False),
        (1, 10, 0.0, False, False, "epsilon", True)]:
    prev, x0, std = ddim_step(ac, t, steps, sample, eps, eta, clip, uc, ptype, sa1)
    rows.append({"t": t, "steps": steps, "eta": eta, "clip": clip,
                 "use_clipped": uc, "pred_type": ptype, "set_alpha_to_one": sa1,
                 "prev": prev.tolist(), "x0": x0.tolist(), "std": float(std)})
out["ddim"] = rows

rows = []
for t in [17, 501, 999]:
    noised = (ac[t]**0.5 * sample + (1 - ac[t])**0.5 * eps)
    rows.append({"t": t, "noised": noised.tolist()})
out["add_noise"] = rows

rows = []
for steps, shift in [(28, 3.0), (50, 3.0), (50, 1.0), (28, 6.0)]:
    ts, sg = flow_sigmas(steps, shift)
    rows.append({"steps": steps, "shift": shift,
                 "timesteps_first3": ts[:3].tolist(), "timesteps_last2": ts[-2:].tolist(),
                 "sigmas_first3": sg[:3].tolist(), "sigmas_last3": sg[-3:].tolist()})
out["flow_match"] = rows

out["alphas_cumprod_probe"] = {str(t): float(ac[t]) for t in [0, 1, 500, 981, 999]}
print(json.dumps(out, indent=1))
