"""Line-faithful torch transcription of diffusers 0.29 DDPM/DDIM/
FlowMatchEuler step semantics (the schedulers the reference loads at
run_nudity.py:108 / run_nudity_sdv3.py). Used by the recorded-golden
generator and the whole-loop parity harness."""
import json
import numpy as np
import torch

def make_betas(n, b0, b1, schedule):
    if schedule == "linear":
        return torch.linspace(b0, b1, n, dtype=torch.float64).float()
    if schedule == "scaled_linear":
        return (torch.linspace(b0**0.5, b1**0.5, n, dtype=torch.float64) ** 2).float()
    raise ValueError(schedule)

def tables(n=1000, b0=0.00085, b1=0.012, schedule="scaled_linear"):
    betas = make_betas(n, b0, b1, schedule)
    alphas_cumprod = torch.cumprod((1.0 - betas).double(), 0).float()
    return alphas_cumprod

def ddpm_step(ac, t, steps, sample, eps, clip=False, pred_type="epsilon", n=1000):
    prev_t = t - n // steps
    apt = ac[t]
    aptp = ac[prev_t] if prev_t >= 0 else torch.tensor(1.0)
    bpt, bptp = 1 - apt, 1 - aptp
    cat_ = apt / aptp; cbt = 1 - cat_
    if pred_type == "epsilon":
        x0 = (sample - bpt**0.5 * eps) / apt**0.5
    elif pred_type == "v_prediction":
        x0 = apt**0.5 * sample - bpt**0.5 * eps
    else:
        x0 = eps
    if clip:
        x0 = x0.clamp(-1, 1)
    c0 = (aptp**0.5 * cbt) / bpt
    cs = cat_**0.5 * bptp / bpt
    prev = c0 * x0 + cs * sample
    var = torch.clamp(cbt * bptp / bpt, min=1e-20)
    return prev, x0, var**0.5

def ddim_step(ac, t, steps, sample, eps_in, eta=0.0, clip=False, use_clipped=False,
              pred_type="epsilon", set_alpha_to_one=False, n=1000):
    prev_t = t - n // steps
    apt = ac[t]
    final = torch.tensor(1.0) if set_alpha_to_one else ac[0]
    aptp = ac[prev_t] if prev_t >= 0 else final
    bpt = 1 - apt
    if pred_type == "epsilon":
        x0 = (sample - bpt**0.5 * eps_in) / apt**0.5
        eps = eps_in
    elif pred_type == "v_prediction":
        x0 = apt**0.5 * sample - bpt**0.5 * eps_in
        eps = apt**0.5 * eps_in + bpt**0.5 * sample
    else:
        x0 = eps_in
        eps = (sample - apt**0.5 * x0) / bpt**0.5
    if clip:
        x0 = x0.clamp(-1, 1)
    if use_clipped:
        eps = (sample - apt**0.5 * x0) / bpt**0.5
    var = (1 - aptp) / (1 - apt) * (1 - apt / aptp)
    std = eta * var**0.5
    dir_ = (1 - aptp - std**2) ** 0.5 * eps
    prev = aptp**0.5 * x0 + dir_
    return prev, x0, std

def flow_sigmas(steps, shift=3.0, n=1000):
    ts0 = np.linspace(1, n, n, dtype=np.float64)[::-1] / n
    sh = lambda s: shift * s / (1 + (shift - 1) * s)
    s_full = sh(ts0)
    smax, smin = s_full[0], s_full[-1]
    ts = np.linspace(smax * n, smin * n, steps, dtype=np.float64)
    sigmas = sh(ts / n)
    timesteps = (sigmas * n).astype(np.float32)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return timesteps, sigmas

