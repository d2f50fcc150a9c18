"""Closed-form cross-attention editing (UCE / RECE family) — the other
erased-checkpoint producer.

The reference's ``rece`` erase_id swaps in a cross-attention-edited UNet
state dict it cannot produce (/root/reference/run_nudity.py:124-130 loads
it; the editing happens in an external repo). This module supplies the
TPU-native editor: Unified Concept Editing's ridge-regularized least-squares
update of every cross-attention K/V projection (Gandikota et al. 2024), plus
RECE's refinement loop (Gong et al. 2024) where each round derives the
closed-form adversarial embedding that still regenerates the concept under
the edited weights and adds it to the erase set.

All of it is a handful of [D, D] solves (D = 768 for SD-v1) — one tiny
jitted program, no iteration over data. Flax layout: cross-attn K/V kernels
are ``[D_ctx, inner]`` applied as ``x @ W``, so the edit solves in row
space:

    A = Σ_e cᵉᵀcᵉ·s_e + Σ_p cᵖᵀcᵖ·s_p + λI          ([D, D])
    B = Σ_e cᵉᵀ(tᵉ W₀)·s_e + Σ_p cᵖᵀ(cᵖ W₀)·s_p + λW₀ ([D, inner])
    W' = A⁻¹ B

so that erased-concept token states cᵉ map (approximately) to where the
TARGET's states tᵉ used to map, preserved states keep their images, and λ
anchors everything else to W₀.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


def cross_attn_kv_paths(params: Any) -> list:
    """Key paths of every cross-attention K/V kernel (``attn2/to_{k,v}``)."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        s = "/".join(str(getattr(k, "key", k)) for k in path)
        if "attn2" in s and ("to_k" in s or "to_v" in s) and s.endswith(
                "kernel"):
            out.append(path)
    return out


def _stack(states: Sequence[jax.Array]) -> jax.Array:
    """[N, L, D] ← sequence of [L, D] token-state matrices."""
    return jnp.stack([jnp.asarray(s, jnp.float32) for s in states])


def uce_edit_kernel(w0: jax.Array, erase_c: jax.Array, erase_t: jax.Array,
                    preserve_c: jax.Array | None, lamb: float = 0.5,
                    erase_scale: float = 1.0,
                    preserve_scale: float = 1.0) -> jax.Array:
    """Edit ONE ``[D, inner]`` kernel. erase_c/erase_t: [N_e, L, D] token
    states of the concepts and their targets; preserve_c: [N_p, L, D]."""
    d = w0.shape[0]
    ce = erase_c.reshape(-1, d)               # [N_e*L, D]
    te = erase_t.reshape(-1, d)
    a = erase_scale * (ce.T @ ce) + lamb * jnp.eye(d, dtype=jnp.float32)
    b = erase_scale * (ce.T @ (te @ w0)) + lamb * w0
    if preserve_c is not None and preserve_c.size:
        cp = preserve_c.reshape(-1, d)
        a = a + preserve_scale * (cp.T @ cp)
        b = b + preserve_scale * (cp.T @ (cp @ w0))
    return jnp.linalg.solve(a, b).astype(w0.dtype)


def uce_edit(params: Any, erase_c: Sequence[jax.Array],
             erase_t: Sequence[jax.Array],
             preserve_c: Sequence[jax.Array] = (), lamb: float = 0.5,
             erase_scale: float = 1.0, preserve_scale: float = 1.0) -> Any:
    """UCE: closed-form edit of every cross-attn K/V kernel in the UNet.

    ``erase_c[i]``/``erase_t[i]``: [L, D] token states of concept i and of
    the prompt it should be remapped to (usually the empty prompt).
    ``preserve_c``: token states whose images must not move. Returns a new
    param tree; everything outside attn2 to_k/to_v is untouched.
    """
    if len(erase_c) != len(erase_t):
        raise ValueError("erase_c and erase_t must pair up")
    ec, et = _stack(erase_c), _stack(erase_t)
    pc = _stack(preserve_c) if len(preserve_c) else None
    paths = set(map(tuple, cross_attn_kv_paths(params)))

    def edit(path, leaf):
        if tuple(path) not in paths:
            return leaf
        # solve in f32 (the [D, D] system is ill-conditioned in bf16) but
        # keep the tree's storage dtype
        w1 = uce_edit_kernel(jnp.asarray(leaf, jnp.float32), ec, et, pc,
                             lamb, erase_scale, preserve_scale)
        return w1.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(edit, params)


def rece_adversarial_states(params_edited: Any, params_orig: Any,
                            concept_c: jax.Array) -> jax.Array:
    """RECE's closed-form adversarial embedding: the token states e* that
    best regenerate the ERASED concept's original K/V images under the
    edited weights,

        e* = argmin_e Σ_proj ‖e W'_proj − c W_proj‖²
           = c · (Σ W W'ᵀ) · (Σ W' W'ᵀ)⁻¹

    (row-space form; summed over every edited K/V projection). Feeding e*
    back into the erase set closes the loopholes one UCE pass leaves open.
    """
    paths = cross_attn_kv_paths(params_orig)
    flat_e = dict(jax.tree_util.tree_flatten_with_path(params_edited)[0])
    flat_o = dict(jax.tree_util.tree_flatten_with_path(params_orig)[0])
    d = concept_c.shape[-1]
    num = jnp.zeros((d, d), jnp.float32)
    den = jnp.zeros((d, d), jnp.float32)
    for p in paths:
        w0 = jnp.asarray(flat_o[tuple(p)], jnp.float32)
        w1 = jnp.asarray(flat_e[tuple(p)], jnp.float32)
        num = num + w0 @ w1.T
        den = den + w1 @ w1.T
    # solve e* den = c num  (right division via the transposed system)
    return jnp.linalg.solve(
        den.T, (jnp.asarray(concept_c, jnp.float32) @ num).T).T


def rece_edit(params: Any, erase_c: Sequence[jax.Array],
              erase_t: Sequence[jax.Array],
              preserve_c: Sequence[jax.Array] = (), iterations: int = 3,
              lamb: float = 0.5, erase_scale: float = 1.0,
              preserve_scale: float = 1.0,
              regularize: float = 1e-1) -> Any:
    """RECE: iterate (UCE edit → closed-form adversarial embedding → add it
    to the erase set). ``regularize`` shrinks each adversarial embedding
    toward the target states (RECE's ε-ball constraint analogue) so the
    edit doesn't chase unboundedly-far embeddings.
    """
    orig_c = [jnp.asarray(c, jnp.float32) for c in erase_c]
    orig_t = [jnp.asarray(t, jnp.float32) for t in erase_t]
    cur_c, cur_t = list(orig_c), list(orig_t)
    edited = uce_edit(params, cur_c, cur_t, preserve_c, lamb,
                      erase_scale, preserve_scale)
    for _ in range(iterations):
        # adversarial embeddings for the ORIGINAL concepts only — the set
        # grows by N per round, not geometrically
        adv = [rece_adversarial_states(edited, params, c) for c in orig_c]
        adv = [(1.0 - regularize) * a + regularize * t
               for a, t in zip(adv, orig_t)]
        cur_c, cur_t = cur_c + adv, cur_t + list(orig_t)
        edited = uce_edit(params, cur_c, cur_t, preserve_c, lamb,
                          erase_scale, preserve_scale)
    return edited


def edit_unet_concepts(params: Any, encode_fn: Callable[[str], jax.Array],
                       erase: Sequence[str],
                       targets: Sequence[str] | None = None,
                       preserve: Sequence[str] = (), method: str = "uce",
                       lamb: float = 0.5, erase_scale: float = 1.0,
                       preserve_scale: float = 1.0,
                       rece_iterations: int = 3) -> Any:
    """String-level entry: encode prompts with ``encode_fn`` (str → [L, D]
    final text-encoder states) and run the chosen editor."""
    targets = list(targets) if targets is not None else [""] * len(erase)
    if len(targets) != len(erase):
        raise ValueError("one target per erased concept")
    ec = [encode_fn(c) for c in erase]
    et = [encode_fn(t) for t in targets]
    pc = [encode_fn(p) for p in preserve]
    if method == "uce":
        return uce_edit(params, ec, et, pc, lamb, erase_scale,
                        preserve_scale)
    if method == "rece":
        return rece_edit(params, ec, et, pc, rece_iterations, lamb,
                         erase_scale, preserve_scale)
    raise ValueError(f"unknown edit method: {method!r}")
