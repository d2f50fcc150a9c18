"""Repellency ("empirical negative denoiser") methods.

Reference: repellency/repellency_methods_threshold.py, repellency/
repellency_methods_fast.py, repellency/repellency_methods_fast_sdv3.py.
All six methods of the reference are provided — ``kernel_fast`` (the paper's
main method), ``sparse`` (SPELL), ``euclidean``, ``kernel``, ``random_noise``
and ``lsh`` — behind the same registry/factory surface
(``get_repellency_method``; reference :9-22).

TPU-first split:
  * ``apply_repellency`` — a *pure traced function* used inside the jitted
    sampling scan. Gating (β threshold) is returned as a mask, never a
    Python bool, so the scan stays trace-static.
  * ``RepellencyProcessor`` — the host-side object the runners build; holds
    the projected negative bank, loads/saves the ``.pt`` caches, runs β /
    radius auto-calibration, and exposes ``conditioning(x_0_hat, **kw)``
    for reference-API parity.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..io import load_pt, save_pt
from ..ops.repellency_kernels import (
    _pairwise_dist,
    rbf_negative_score,
    rbf_negative_score_ref,
    sparse_repellency_force,
)

__CONDITIONING_METHOD__: dict[str, type] = {}


def register_conditioning_method(name: str):
    def wrapper(cls):
        if __CONDITIONING_METHOD__.get(name) is not None:
            raise NameError(f"Name {name} is already registered!")
        __CONDITIONING_METHOD__[name] = cls
        return cls
    return wrapper


def get_repellency_method(name: str, ref_data, embed_fn, forward_fn=None,
                          num_timesteps: int = 50, max_idx=None, beta_min=None,
                          beta_max=None, **kwargs) -> "RepellencyProcessor":
    """Factory with the reference's signature (repellency_methods_threshold.py:19-22)."""
    if __CONDITIONING_METHOD__.get(name) is None:
        raise NameError(f"Name {name} is not defined!")
    return __CONDITIONING_METHOD__[name](
        ref_data=ref_data, embed_fn=embed_fn, forward_fn=forward_fn,
        num_timesteps=num_timesteps, max_idx=max_idx, beta_min=beta_min,
        beta_max=beta_max, **kwargs)


# ---------------------------------------------------------------------------
# Pure in-scan form
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RepellencyConfig:
    """Static repellency parameters baked into the jitted sampling step."""

    method: str = "kernel_fast"
    sigma: float = 1.0
    scale: float = 1.0
    epsilon: float = 1e-8
    beta_threshold: float = -1.0           # resolved (post-calibration) value
    beta_threshold_margin: float = 0.0
    radius: float = -1.0                   # sparse only
    normalize_x: bool = False              # SD3 variants channel-normalize x
    use_beta_gate: bool = True             # conditioning_threshold vs _1


def _channel_normalize(x: jax.Array) -> jax.Array:
    """L2-normalize over the channel axis (dim=1 of NCHW), per reference
    repellency_methods_threshold.py:63-64 (keepdim norm over dim=1)."""
    n = jnp.linalg.norm(x, axis=1, keepdims=True)
    return x / n


def apply_repellency(x0: jax.Array, refs: jax.Array, cfg: RepellencyConfig,
                     rng: jax.Array | None = None, bank=None):
    """Pure repellency update on x̂₀.

    Args:
      x0:   [N, C, H, W] Tweedie estimates (fp32).
      refs: [M, C, H, W] projected (channel-normalized) negative bank.
      cfg:  static config; ``cfg.method`` selects the math at trace time.
      rng:  PRNG key (random_noise method only).
      bank: optional bank-sharded kernel provider (parallel/bank.py
        ``ShardedBank``) — swaps in the M-sharded psum'd score/force with
        the replicated kernels' exact signatures. refs may then carry
        ``pad_bank`` padding rows (exact no-ops).

    Returns ``(x0_new [N,C,H,W], is_negation [N] bool)``. For β-gated methods
    the caller must apply ``jnp.where(is_negation, renoised, plain)`` — this
    function always computes the corrected x̂₀; the gate decides whether the
    pipeline *uses* it (mirrors reference modified_safree_*_threshold_time.py:558-569).
    """
    n, c, h, w = x0.shape
    d = c * h * w
    x_in = _channel_normalize(x0) if cfg.normalize_x else x0
    x_flat = x_in.reshape(n, d).astype(jnp.float32)
    refs_flat = refs.reshape(refs.shape[0], d).astype(jnp.float32)

    if cfg.method in ("kernel_fast", "kernel", "euclidean"):
        score_fn = bank.score if bank is not None else rbf_negative_score
        score, beta = score_fn(x_flat, refs_flat, cfg.sigma, cfg.epsilon)
        x0_new = x0 - cfg.scale * score.reshape(n, c, h, w)
        if cfg.use_beta_gate:
            is_neg = beta > (cfg.beta_threshold - cfg.beta_threshold_margin)
        else:
            is_neg = jnp.ones((n,), dtype=bool)
        return x0_new, is_neg

    if cfg.method == "sparse":
        force_fn = (bank.sparse_force if bank is not None
                    else sparse_repellency_force)
        force, c_sum = force_fn(x_flat, refs_flat, cfg.radius)
        # sparse ADDS the repulsive force (reference :446-448)
        x0_new = x0 + cfg.scale * force.reshape(n, c, h, w)
        return x0_new, c_sum > 0.0

    if cfg.method == "random_noise":
        assert rng is not None
        noise = jax.random.normal(rng, (n, d), dtype=jnp.float32)
        x0_new = x0 - cfg.scale * noise.reshape(n, c, h, w)
        return x0_new, jnp.ones((n,), dtype=bool)

    raise NotImplementedError(f"method {cfg.method}")


# ---------------------------------------------------------------------------
# Host-side processor (runner / calibration layer)
# ---------------------------------------------------------------------------


class RepellencyProcessor:
    """Holds the projected negative bank + calibrated thresholds.

    Mirrors the reference RepellencyMethod surface
    (repellency_methods_threshold.py:24-193): ``conditioning``,
    ``get_proj_ref``, cache import/export — but all math is jax and the
    cache files remain torch-pickle compatible via safe_denoiser_tpu.io.
    """

    method_name = "base"

    def __init__(self, ref_data, embed_fn: Callable, forward_fn=None,
                 num_timesteps: int = 50, max_idx=None, beta_min=None,
                 beta_max=None, n_embed: int = 16, **kwargs):
        self.ref_data = ref_data
        self.embed_fn = embed_fn
        self.forward_fn = forward_fn
        self.num_timesteps = num_timesteps
        self.n_embed = n_embed

        self.sigma = kwargs.get("sigma", 1.0)
        self.scale = kwargs.get("scale", 1.0)
        self.epsilon = kwargs.get("epsilon", 1e-8)
        self.quantile = kwargs.get("quantile", 0.0)
        self.beta_threshold = kwargs.get("beta_threshold", False)
        self.beta_threshold_margin = kwargs.get("beta_threshold_margin", 0.0)
        self.normalize_x = kwargs.get("normalize_x", False)

        self.proj_ref_path = kwargs.get("proj_ref_path", None)
        self.proj_beta_ref_path = kwargs.get("proj_noisy_ref_path_for_beta", None)
        self.cache_proj_ref = kwargs.get("cache_proj_ref", False)
        self.cache_proj_beta_ref = kwargs.get("cache_noisy_ref_path_for_beta", False)

        if self.cache_proj_ref:
            self.proj_refs = self.import_proj_ref(self.proj_ref_path)
        else:
            self.proj_refs = self.set_proj_ref()

    # -- projection -------------------------------------------------------
    def project(self, data) -> jax.Array:
        """VAE-encode in n_embed chunks, channel-normalize (reference :54-72)."""
        chunks = []
        for i in range(0, len(data), self.n_embed):
            chunks.append(self.embed_fn(data[i:i + self.n_embed]))
        out = jnp.concatenate(chunks, axis=0)
        return _channel_normalize(out)

    def set_proj_ref(self) -> jax.Array:
        result = self.project(self.ref_data)
        if self.proj_ref_path:
            print("[Proj_Ref] Save the cached proj_ref")
            os.makedirs(os.path.dirname(self.proj_ref_path) or ".", exist_ok=True)
            save_pt(np.asarray(result, dtype=np.float32), self.proj_ref_path)
        return result

    def import_proj_ref(self, path: str):
        obj = load_pt(path)
        if isinstance(obj, dict):  # noisy-beta cache {t -> arr}
            return {int(k): jnp.asarray(v, dtype=jnp.float32) for k, v in obj.items()}
        return jnp.asarray(obj, dtype=jnp.float32)

    def get_proj_ref(self) -> jax.Array:
        return self.proj_refs

    # -- β / radius calibration --------------------------------------------
    def set_noisy_proj_ref(self, scheduler, num_timesteps=None, seed: int = 42):
        """Forward-noise the bank at every inference timestep (reference :108-155)."""
        n_steps = num_timesteps or self.num_timesteps or 50
        timesteps = scheduler.timesteps(n_steps)
        rng = jax.random.PRNGKey(seed)
        results = {}
        for t in timesteps:
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, self.proj_refs.shape, dtype=jnp.float32)
            results[int(t)] = scheduler.add_noise(self.proj_refs, noise, jnp.int32(int(t)))
        if self.proj_beta_ref_path:
            print("[Proj_Ref] Save the cached proj_beta_ref")
            os.makedirs(os.path.dirname(self.proj_beta_ref_path) or ".", exist_ok=True)
            save_pt({k: np.asarray(v, dtype=np.float32) for k, v in results.items()},
                    self.proj_beta_ref_path)
        return results

    def empirical_beta(self, noisy_proj_refs: dict, sigma: float, quantile: float):
        """Per-timestep quantile of the kernel density β over noisy refs
        (reference :351-384)."""
        refs_flat = self.proj_refs.reshape(self.proj_refs.shape[0], -1)
        results = {}
        for t, latents in noisy_proj_refs.items():
            x_flat = latents.reshape(latents.shape[0], -1)
            dist = _pairwise_dist(x_flat, refs_flat)
            beta = jnp.sum(jnp.exp(-dist / (2.0 * sigma ** 2)), axis=-1) + self.epsilon
            q = float(jnp.quantile(beta, quantile))
            print(f"Top {100 * (1 - quantile):.1f} % of radius at t={t}: {q:.3f}")
            results[t] = q
        return results

    def empirical_radius(self, noisy_proj_refs: dict, quantile: float):
        """Per-timestep quantile of noisy-ref ↔ ref distances (reference :461-490)."""
        refs_flat = self.proj_refs.reshape(self.proj_refs.shape[0], -1)
        results = {}
        for t, latents in noisy_proj_refs.items():
            x_flat = latents.reshape(latents.shape[0], -1)
            dist = _pairwise_dist(x_flat, refs_flat).reshape(-1)
            q = float(jnp.quantile(dist, quantile))
            print(f"Top {100 * (1 - quantile):.1f} % of beta at t={t}: {q:.3f}")
            results[t] = q
        return results

    def _resolve_noisy_refs(self, scheduler):
        if self.cache_proj_beta_ref:
            return self.import_proj_ref(self.proj_beta_ref_path)
        assert scheduler is not None, "scheduler required to compute the β reference"
        return self.set_noisy_proj_ref(scheduler, self.num_timesteps)

    # -- conditioning (host convenience; pipelines use apply_repellency) ---
    def config(self) -> RepellencyConfig:
        return RepellencyConfig(
            method=self.method_name,
            sigma=float(self.sigma),
            scale=float(self.scale),
            epsilon=float(self.epsilon),
            beta_threshold=float(self.beta_threshold)
            if not isinstance(self.beta_threshold, bool) else -1.0,
            beta_threshold_margin=float(self.beta_threshold_margin),
            radius=float(getattr(self, "radius", -1.0)),
            normalize_x=bool(self.normalize_x),
            use_beta_gate=True,
        )

    def conditioning(self, x_0_hat, **kwargs):
        use_gate = bool(kwargs.get("beta_threshold", False))
        cfg = dataclasses.replace(self.config(), use_beta_gate=use_gate)
        rng = kwargs.get("rng", jax.random.PRNGKey(0))
        refs = self.get_proj_ref()
        x0_new, is_neg = apply_repellency(jnp.asarray(x_0_hat), refs, cfg, rng=rng)
        return {"x_0_hat": x0_new, "is_negation": bool(np.asarray(is_neg).any()),
                "mean_x_0_hat": None}


@register_conditioning_method(name="kernel_fast")
class KernelFastRepellency(RepellencyProcessor):
    """The paper's main method (reference :282-384) with β auto-calibration."""

    method_name = "kernel_fast"

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.beta_threshold = kwargs.get("beta_threshold", -1.0)
        # bools are flags, not thresholds (spell.yaml-style `beta_threshold:
        # True` must trigger calibration, not be read as 1.0)
        needs_calibration = (isinstance(self.beta_threshold, bool)
                             or not isinstance(self.beta_threshold, (int, float))
                             or self.beta_threshold <= 0)
        has_noisy_source = (self.cache_proj_beta_ref
                            or kwargs.get("scheduler") is not None)
        if needs_calibration and has_noisy_source:
            noisy = self._resolve_noisy_refs(kwargs.get("scheduler"))
            betas = self.empirical_beta(noisy, self.sigma, self.quantile)
            # β at the last (t→0) timestep key, like reference :302
            self.beta_threshold = betas[list(betas.keys())[-1]]
        elif needs_calibration:
            # no scheduler/cache (the SD3 fast-module path,
            # repellency_methods_fast_sdv3.py, has no β machinery): disable
            # the gate rather than crash at startup
            self.beta_threshold = -1.0


@register_conditioning_method(name="kernel")
class KernelRepellency(RepellencyProcessor):
    """Older formulation (reference :234-280): BOTH x and the bank are run
    through ``project`` (VAE embed + channel norm) per call for the distance
    computation, while the numerator weights the RAW ``ref_data`` rows
    (reference empirical_denoiser :250-266). Requires ref_data shaped like
    x̂₀. Our embed_fn is deterministic (fixed key), so the reference's fresh
    VAE samples degenerate to a repeatable projection — noted, not hidden.
    The in-scan path uses the cached bank (kernel_fast semantics); this host
    method is the legacy-parity surface."""

    method_name = "kernel"

    def conditioning(self, x_0_hat, **kwargs):
        x = jnp.asarray(x_0_hat, dtype=jnp.float32)
        x_proj = self.project(x)
        refs_proj = self.project(self.ref_data)        # no self-mutation
        xf = x_proj.reshape(x_proj.shape[0], -1)
        rf = refs_proj.reshape(refs_proj.shape[0], -1)
        dist = _pairwise_dist(xf, rf)
        w = jnp.exp(-dist / (2.0 * float(self.sigma) ** 2))
        raw = jnp.asarray(self.ref_data,
                          dtype=jnp.float32).reshape(rf.shape[0], -1)
        beta = jnp.sum(w, axis=-1) + float(self.epsilon)
        score = (w @ raw) / beta[:, None]
        x_new = x - float(self.scale) * score.reshape(x.shape)
        return {"x_0_hat": np.asarray(x_new), "is_negation": True,
                "mean_x_0_hat": None}


@register_conditioning_method(name="euclidean")
class EuclideanRepellency(RepellencyProcessor):
    """Log-space kernel on raw refs (reference :195-231). Numerically identical
    to kernel_fast's ratio form; shares the fused kernel. The bank is the raw
    ``ref_data`` — no VAE projection and no channel normalization
    (reference empirical_denoiser reads self.ref_data directly)."""

    method_name = "euclidean"

    def __init__(self, **kwargs):
        kwargs.setdefault("cache_proj_ref", False)
        super().__init__(**kwargs)

    def set_proj_ref(self):
        return jnp.asarray(self.ref_data, dtype=jnp.float32)


@register_conditioning_method(name="random_noise")
class RandomNoiseRepellency(RepellencyProcessor):
    """Ablation: subtract Gaussian noise instead of the empirical score
    (reference repellency_methods_fast.py:264-297)."""

    method_name = "random_noise"


@register_conditioning_method(name="sparse")
class SparseRepellency(RepellencyProcessor):
    """SPELL-style truncated repulsion with radius auto-calibration
    (reference :386-490)."""

    method_name = "sparse"

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.radius = kwargs.get("radius", -1.0)
        if self.radius <= 0:
            noisy = self._resolve_noisy_refs(kwargs.get("scheduler"))
            radii = self.empirical_radius(noisy, self.quantile)
            self.radius = radii[list(radii.keys())[-1]]

    def conditioning(self, x_0_hat, **kwargs):
        cfg = dataclasses.replace(self.config(), use_beta_gate=False)
        refs = self.get_proj_ref()
        x0_new, is_neg = apply_repellency(jnp.asarray(x_0_hat), refs, cfg)
        return {"x_0_hat": x0_new, "is_negation": bool(np.asarray(is_neg).any()),
                "mean_x_0_hat": None}
