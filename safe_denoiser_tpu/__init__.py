"""safe_denoiser_tpu — TPU-native Safe Denoiser framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
MingyuKim87/Safe_Denoiser (NeurIPS 2025, arXiv:2502.08011): training-free
safe text-to-image diffusion sampling via an empirical "negative denoiser"
over a cached bank of negative VAE latents, plus the SAFREE / SLD text-space
safety baselines and the full benchmark/evaluation harness.

Design (TPU-first, not a port):
  * One pure-functional sampling core: a single jitted ``lax.scan`` over
    timesteps; safety machinery (CFG, SLD momentum guidance, SAFREE
    projection, repellency) composes as step transforms selected by config,
    replacing the reference's 16 near-duplicate pipeline files
    (reference: models/textuals_visual/*.py).
  * The repellency kernel (reference: repellency/repellency_methods_threshold.py:309-349)
    is a fused Pallas TPU kernel streaming the negative-latent bank through
    VMEM — no [N, M, D+1] materialization.
  * Data-parallel prompt sharding over a ``jax.sharding.Mesh``; CFG pairs are
    folded into the batch axis; weights and the negative bank are replicated.
  * bf16 weights / fp32 accumulation; static shapes; branchless gating via
    ``jnp.where`` so the scan stays trace-static.
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even when a plugin backend (axon TPU) would override
# the env var (the same workaround tests/conftest.py applies): a CPU smoke
# run of any CLI must not silently initialize — and then hang on — a wedged
# TPU tunnel. No-op when the env var is unset or jax is already configured.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception as _e:  # pragma: no cover — never block import on this
        # If jax backends were already initialized before this import, the
        # env var is NOT honored — a "CPU smoke run" may actually be on the
        # TPU tunnel. Warn so that is diagnosable instead of silent.
        import warnings as _warnings

        _warnings.warn(
            f"JAX_PLATFORMS={_os.environ['JAX_PLATFORMS']!r} could not be "
            f"applied ({type(_e).__name__}: {_e}) — jax was likely already "
            "initialized with a different backend; this process may not run "
            "on the requested platform", RuntimeWarning, stacklevel=2)
