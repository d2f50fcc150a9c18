"""TPU-native training steps: ESD concept erasure + denoising fine-tune.

The reference is inference-only, but its erase_id matrix consumes FINE-TUNED
UNet checkpoints it cannot produce: ``esd`` / ``rece`` swap in an erased
state_dict at load time (/root/reference/run_nudity.py:124-130). This module
supplies the TPU-native trainer for those artifacts:

* :func:`esd_loss` / :func:`make_esd_train_step` — ESD negative-guidance
  erasure (Gandikota et al. 2023, the method behind the reference's ``esd``
  checkpoints): the trainable UNet's noise prediction on the concept prompt
  is regressed onto the FROZEN model's prediction steered away from the
  concept, ``target = e*(x_t,t,∅) − η·(e*(x_t,t,c) − e*(x_t,t,∅))``.
* :func:`ddpm_loss` / :func:`make_train_step` — the standard
  epsilon-prediction denoising MSE for plain fine-tuning.

TPU-first design: each step is one pure jitted function — loss, grad, and
the optax update fused into a single XLA program, params donated so the
update is in-place in HBM. Scale-out needs no bespoke code: batch rows are
data-sharded and params tensor-shard under ``parallel.tp.UNET_TP_RULES``;
GSPMD inserts the gradient psums over ICI (exercised by
``__graft_entry__.dryrun_multichip`` step 9 and ``tests/test_training.py``).
Frozen-model forwards batch the concept/uncond contexts into one UNet call
so the MXU sees one large matmul stream instead of two small ones.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class ESDConfig:
    """Hyperparameters for ESD erasure fine-tuning."""
    negative_guidance: float = 1.0   # η — strength of the away-from-concept push
    learning_rate: float = 1e-5
    weight_decay: float = 0.0
    grad_clip_norm: float = 0.0      # 0 = no clipping


def ddpm_loss(apply_fn: Callable, params: Any, scheduler, x0: jax.Array,
              ctx: jax.Array, t: jax.Array, rng: jax.Array) -> jax.Array:
    """Standard epsilon-prediction MSE: ``‖e_θ(add_noise(x0,ε,t), t, ctx) − ε‖²``.

    x0: [B, H, W, C] clean latents; ctx: [B, S, D] text states; t: [B] int
    timesteps. Loss is computed in fp32 regardless of the model dtype.
    """
    noise = jax.random.normal(rng, x0.shape, dtype=x0.dtype)
    # add_noise broadcasts its coefficient tables against the sample, so a
    # per-sample t must arrive pre-shaped [B, 1, 1, 1] (the sampling scan
    # only ever passes scalar t)
    t_b = jnp.reshape(t, (-1,) + (1,) * (x0.ndim - 1))
    x_t = scheduler.add_noise(x0, noise, t_b)
    pred = apply_fn(params, x_t, t, ctx)
    return jnp.mean(jnp.square(pred.astype(jnp.float32) -
                               noise.astype(jnp.float32)))


def esd_loss(apply_fn: Callable, params: Any, frozen_params: Any,
             x_t: jax.Array, t: jax.Array, ctx_concept: jax.Array,
             ctx_uncond: jax.Array, negative_guidance: float = 1.0
             ) -> jax.Array:
    """ESD erasure loss at one (x_t, t).

    ``target = e*(x_t,t,∅) − η·(e*(x_t,t,c) − e*(x_t,t,∅))`` with e* the
    frozen model (stop-gradient); loss = ‖e_θ(x_t,t,c) − target‖². The two
    frozen forwards fold into ONE batched UNet call (concept rows stacked on
    uncond rows) — one pass through the weights instead of two.
    """
    b = x_t.shape[0]
    frozen_in = jnp.concatenate([x_t, x_t])
    frozen_ctx = jnp.concatenate([ctx_concept, ctx_uncond])
    frozen_t = jnp.concatenate([t, t])
    e_star = jax.lax.stop_gradient(
        apply_fn(frozen_params, frozen_in, frozen_t, frozen_ctx))
    e_c, e_u = e_star[:b].astype(jnp.float32), e_star[b:].astype(jnp.float32)
    target = e_u - negative_guidance * (e_c - e_u)
    pred = apply_fn(params, x_t, t, ctx_concept).astype(jnp.float32)
    return jnp.mean(jnp.square(pred - target))


def esd_param_mask(params: Any, train_method: str) -> Any:
    """Bool pytree selecting the UNet subset ESD fine-tunes.

    ``train_method`` mirrors the ESD recipe's choices (the method behind the
    reference's erased checkpoints): ``xattn`` trains only cross-attention
    (the text-conditioned pathway — the usual choice for erasing named
    concepts/styles), ``selfattn`` only self-attention, ``noxattn``
    everything EXCEPT cross-attention, the top-level time embedding, and
    the output head (the choice for global/unconditional concepts like
    nudity — the CompVis ESD train script freezes ``'attn2'``,
    ``'time_embed'`` and ``name.startswith('out.')``, i.e. the final
    norm+conv; the per-resnet time projections stay TRAINABLE there, so
    ``time_emb_proj`` must not be swept up by a substring match), ``full``
    everything.
    """
    _NOXATTN_FROZEN_TOP = ("time_emb_1", "time_emb_2",  # CompVis time_embed
                           "conv_norm_out", "conv_out")  # CompVis 'out.'

    def keep(path) -> bool:
        s = "/".join(str(getattr(k, "key", k)) for k in path)
        if train_method == "full":
            return True
        if train_method == "xattn":
            return "attn2" in s
        if train_method == "selfattn":
            return "attn1" in s
        if train_method == "noxattn":
            # the tree may arrive flax-wrapped ({'params': {...}}) — the
            # collection key is not a module name, so skip it when finding
            # the top-level component (otherwise top == 'params' always and
            # the freeze set silently never matches)
            keys = [str(getattr(k, "key", k)) for k in path]
            while keys and keys[0] == "params":
                keys = keys[1:]
            top = keys[0] if keys else ""
            return "attn2" not in s and top not in _NOXATTN_FROZEN_TOP
        raise ValueError(f"unknown train_method: {train_method!r}")

    return jax.tree_util.tree_map_with_path(lambda p, _: keep(p), params)


def make_optimizer(cfg: ESDConfig,
                   param_mask: Any = None) -> optax.GradientTransformation:
    """adamw (+ optional global-norm clip), optionally restricted to the
    trainable subset selected by ``param_mask`` (see :func:`esd_param_mask`).
    The train steps build the same transformation internally, so
    ``make_optimizer(cfg, mask).init`` is the matching opt-state initializer.

    Masking uses ``optax.multi_transform`` with ``set_to_zero`` on the
    frozen complement — NOT ``optax.masked``, which passes unmasked
    gradients through *unchanged* (they would be applied raw)."""
    tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
    if cfg.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    if param_mask is not None:
        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", param_mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


def make_esd_train_step(apply_fn: Callable, cfg: ESDConfig = ESDConfig(),
                        donate: bool = True,
                        param_mask: Any = None) -> Callable:
    """One fused ESD update: loss + grad + adamw in a single jitted program.

    Returned signature:
    ``step(params, frozen_params, opt_state, x_t, t, ctx_c, ctx_u)
    -> (params, opt_state, loss)``. Params/opt_state are donated (their HBM
    buffers are reused for the updated values) — so ``frozen_params`` must
    not alias ``params`` (copy the tree once at setup, e.g.
    ``jax.tree.map(jnp.copy, params)``), or XLA rejects the execute.
    Works unchanged under a
    (data, model) mesh: shard x_t/ctx over 'data' and params per
    UNET_TP_RULES — the grad psums are inserted by GSPMD.

    ``param_mask`` (see :func:`esd_param_mask`) restricts the update to a
    parameter subset; init the opt state with
    ``make_optimizer(cfg, param_mask).init(params)`` then.
    """
    tx = make_optimizer(cfg, param_mask)

    def step(params, frozen_params, opt_state, x_t, t, ctx_c, ctx_u):
        loss, grads = jax.value_and_grad(
            lambda p: esd_loss(apply_fn, p, frozen_params, x_t, t, ctx_c,
                               ctx_u, cfg.negative_guidance))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 2) if donate else ())


def make_train_step(apply_fn: Callable, scheduler,
                    cfg: ESDConfig = ESDConfig(),
                    donate: bool = True) -> Callable:
    """One fused denoising fine-tune update (epsilon-MSE + adamw).

    ``step(params, opt_state, x0, ctx, t, rng) -> (params, opt_state, loss)``
    """
    tx = make_optimizer(cfg)

    def step(params, opt_state, x0, ctx, t, rng):
        loss, grads = jax.value_and_grad(
            lambda p: ddpm_loss(apply_fn, p, scheduler, x0, ctx, t, rng)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def sample_xt_for_esd(apply_fn: Callable, frozen_params: Any, scheduler,
                      ctx_concept: jax.Array, ctx_uncond: jax.Array,
                      rng: jax.Array, shape: tuple, num_steps: int = 3,
                      guidance_scale: float = 3.0,
                      t_train: jax.Array | None = None) -> tuple:
    """Draw the (x_t, t) training point the ESD recipe prescribes: partially
    denoise pure noise toward the CONCEPT with the frozen model for a few
    coarse CFG/DDIM steps, then forward-place the resulting x̂₀ at a random
    training timestep — so x_t lies near the concept's own sampling
    trajectory rather than the marginal forward-noising one.

    Returns ``(x_t, t)``, both stop-gradient. ``num_steps`` is static, so
    the loop unrolls into the jitted program (fixed shapes, no host sync).
    """
    k_init, k_t = jax.random.split(rng)
    x = jax.random.normal(k_init, shape, dtype=jnp.float32)
    n_train = scheduler.config.num_train_timesteps
    if t_train is None:
        t_train = jax.random.randint(k_t, (shape[0],), 0, n_train)
    ac = scheduler.alphas_cumprod
    b = shape[0]
    # coarse DDIM grid t = n-1, n-1-n/k, ...
    grid = [n_train - 1 - i * (n_train // num_steps)
            for i in range(num_steps)]
    x0 = x
    eps = jnp.zeros_like(x)
    for i, t_i in enumerate(grid):
        t_b = jnp.full((b,), t_i, jnp.int32)
        both = apply_fn(frozen_params, jnp.concatenate([x, x]),
                        jnp.concatenate([t_b, t_b]),
                        jnp.concatenate([ctx_concept, ctx_uncond]))
        e_c = both[:b].astype(jnp.float32)
        e_u = both[b:].astype(jnp.float32)
        eps = e_u + guidance_scale * (e_c - e_u)
        a_t = ac[t_i]
        x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        if i + 1 < len(grid):        # DDIM hop to the next grid point
            a_n = ac[grid[i + 1]]
            x = jnp.sqrt(a_n) * x0 + jnp.sqrt(1.0 - a_n) * eps
    a_tr = ac[t_train][:, None, None, None]
    x_t = jnp.sqrt(a_tr) * x0 + jnp.sqrt(1.0 - a_tr) * eps
    return jax.lax.stop_gradient(x_t), t_train
