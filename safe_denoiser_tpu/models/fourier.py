"""FreeU / SafeGuard Fourier filters as pure jnp functions (NHWC).

Re-implements the semantics of reference free_lunch_utils.py:21-106 without
monkey-patching: the UNet applies these to up-block skip connections when a
``FreeUConfig`` is passed (reference registers patched forwards via
``register_free_crossattn_upblock2d``, run_nudity.py:280-288).

Batch-layout contract (same as the reference): the CFG batch is
``[uncond(0), cond(1), re-attention(2)]``; the SafeGuard filters modify the
*conditional* branch (index 1) using the re-attention branch (index 2) as the
frequency reference (free_lunch_utils.py:36-39, 67-72).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp


@dataclass(frozen=True)
class FreeUConfig:
    b1: float = 1.2
    b2: float = 1.4
    s1: float = 0.9
    s2: float = 0.2
    # 'freeu' = plain FreeU scaling; 'high'/'low'/'all' = SafeGuard variants
    # (reference `safree` arg of register_free_*).
    mode: str = "all"
    in_freeu: bool = False


def _fft2(x):
    return jnp.fft.fftshift(jnp.fft.fftn(x, axes=(1, 2)), axes=(1, 2))


def _ifft2(f):
    return jnp.fft.ifftn(jnp.fft.ifftshift(f, axes=(1, 2)), axes=(1, 2)).real


def _low_box(h: int, w: int, threshold: int):
    crow, ccol = h // 2, w // 2
    return slice(crow - threshold, crow + threshold), slice(ccol - threshold, ccol + threshold)


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """Plain FreeU band scaling (free_lunch_utils.py:87-106). x: [B,H,W,C]."""
    dtype = x.dtype
    f = _fft2(x.astype(jnp.float32))
    rs, cs = _low_box(x.shape[1], x.shape[2], threshold)
    f = f.at[:, rs, cs, :].multiply(scale)
    return _ifft2(f).astype(dtype)


def safeguard_low_fourier_filter(x: jnp.ndarray, threshold: int,
                                 scale: float) -> jnp.ndarray:
    """SafeGuard low-band (free_lunch_utils.py:21-47). x: [B,H,W,C], B>=3.

    Where the re-attention branch's low-frequency real part exceeds the
    conditional branch's, keep the conditional value; otherwise clamp to
    ``scale`` (the reference's torch.where(C.real > 0, low[1], scale))."""
    dtype = x.dtype
    f = _fft2(x.astype(jnp.float32))
    rs, cs = _low_box(x.shape[1], x.shape[2], threshold)
    low = f[:, rs, cs, :]
    diff = low[2] - low[1]
    mask = jnp.where(diff.real > 0.0, low[1],
                     jnp.asarray(scale, dtype=low.dtype))
    f = f.at[1, rs, cs, :].set(mask)
    return _ifft2(f).astype(dtype)


def safeguard_high_fourier_filter(x: jnp.ndarray, threshold: int, scale: float,
                                  in_freeu: bool = False) -> jnp.ndarray:
    """SafeGuard high-band (free_lunch_utils.py:49-85). x: [B,H,W,C], B>=3."""
    dtype = x.dtype
    f = _fft2(x.astype(jnp.float32))
    b, h, w, c = x.shape
    high_mask = jnp.ones((h, w), dtype=jnp.float32)
    rs, cs = _low_box(h, w, threshold)
    high_mask = high_mask.at[rs, cs].set(0.0)
    hm = high_mask[None, :, :, None]
    high_f = f * hm
    ref_mag = jnp.abs(high_f[2].real)
    tar_mag = jnp.abs(high_f[1].real)
    new1 = jnp.where(ref_mag > tar_mag, jnp.asarray(scale, dtype=f.dtype),
                     high_f[1])
    new1_full = jnp.where(hm[0].astype(bool), new1, f[1])
    f = f.at[1].set(new1_full)
    if in_freeu:
        freeu_mask = jnp.ones((h, w), dtype=jnp.float32).at[rs, cs].set(scale)
        f = f * freeu_mask[None, :, :, None]
    return _ifft2(f).astype(dtype)


def apply_skip_filter(res: jnp.ndarray, cfg: Optional[FreeUConfig],
                      stage_scale: float) -> jnp.ndarray:
    """Apply the configured filter to one skip connection (threshold=1, the
    reference's hardcoded value in register_free_*: free_lunch_utils.py:165)."""
    if cfg is None:
        return res
    if cfg.mode == "freeu":
        return fourier_filter(res, 1, stage_scale)
    if cfg.mode == "high":
        return safeguard_high_fourier_filter(res, 1, stage_scale, cfg.in_freeu)
    if cfg.mode == "low":
        return safeguard_low_fourier_filter(res, 1, stage_scale)
    if cfg.mode == "all":
        res = safeguard_high_fourier_filter(res, 1, stage_scale, cfg.in_freeu)
        return safeguard_low_fourier_filter(res, 1, stage_scale)
    raise ValueError(f"unknown FreeU mode {cfg.mode}")
