"""SAFREE concept-subspace projection (pure jnp).

Re-implements the text-side safety math of the reference SAFREE pipelines
(models/textuals_visual/modified_safree_diffusion_pipeline_threshold_time.py:19-99
and the SD3 variant models/sdv3/safe_denoiser_pipeline.py:72-153):

  * ``projection_matrix`` — projector onto span(E) via pinverse (fp32; kept
    out of bf16 deliberately, SURVEY.md §7 "hard parts").
  * ``safree_projection`` — leave-one-out masked-token distances to the
    concept subspace decide which tokens are "trigger tokens"; those are
    replaced by their projection onto (I − P_concept) @ P_masked-subspace.
  * ``f_beta`` — sigmoid/tanh schedule mapping the prompt's subspace
    proximity β to an adaptive re-attention window length (:19-36).
  * ``projection_and_orthogonal`` + ``svf_beta`` — the '--svf' adaptive
    window measurement (:44-55, 472-486).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def projection_matrix(E: jnp.ndarray) -> jnp.ndarray:
    """P projecting onto the column span of E ([dim, n]); fp32 pinverse."""
    E = E.astype(jnp.float32)
    return E @ jnp.linalg.pinv(E.T @ E) @ E.T


def safree_projection(text_embeddings: jnp.ndarray,
                      p_emb: jnp.ndarray,
                      masked_subspace_proj: jnp.ndarray,
                      concept_subspace_proj: jnp.ndarray,
                      alpha: float = 0.0,
                      max_length: int = 77):
    """Detect trigger tokens and replace them with safe projections.

    Args:
      text_embeddings: [2, max_length, dim] (uncond, cond) CLIP states.
      p_emb: [n_t, dim] pooled embeddings of the n_t leave-one-out masked
        prompts (reference ``_masked_encode_prompt``, :211-229).
      masked_subspace_proj / concept_subspace_proj: [dim, dim] projectors.

    Returns (new_embeddings [2, max_length, dim], n_removed, keep_mask [max_length]).
    """
    ie = text_embeddings.astype(jnp.float32)
    ms = masked_subspace_proj
    cs = concept_subspace_proj
    n_t, dim = p_emb.shape

    i_m_cs = jnp.eye(dim, dtype=jnp.float32) - cs
    dist_vec = i_m_cs @ p_emb.astype(jnp.float32).T            # [dim, n_t]
    dist_p_emb = jnp.linalg.norm(dist_vec, axis=0)             # [n_t]

    # Leave-one-out mean distance (reference :72-79)
    total = jnp.sum(dist_p_emb)
    mean_dist = (total - dist_p_emb) / (n_t - 1)
    rm_vector = (dist_p_emb < (1.0 + alpha) * mean_dist)       # True = safe
    n_removed = n_t - jnp.sum(rm_vector.astype(jnp.int32))

    keep = jnp.ones((max_length,), dtype=bool)
    keep = keep.at[1:n_t + 1].set(rm_vector)                   # skip BOS

    uncond_e, text_e = ie[0], ie[1]
    new_text_e = (i_m_cs @ ms @ text_e.T).T                    # [L, dim]
    merged = jnp.where(keep[:, None], text_e, new_text_e)
    return jnp.stack([uncond_e, merged]), n_removed, keep


def projection_and_orthogonal(text_embeddings: jnp.ndarray,
                              masked_subspace_proj: jnp.ndarray,
                              concept_subspace_proj: jnp.ndarray):
    """Project ALL cond tokens (no trigger filtering; reference :44-55)."""
    ie = text_embeddings.astype(jnp.float32)
    dim = masked_subspace_proj.shape[0]
    i_m_cs = jnp.eye(dim, dtype=jnp.float32) - concept_subspace_proj
    new_text_e = (i_m_cs @ masked_subspace_proj @ ie[1].T).T
    return jnp.stack([ie[0], new_text_e])


def svf_beta(text_e: jnp.ndarray, proj_ort_e: jnp.ndarray,
             attn_mask: jnp.ndarray) -> float:
    """β = 1 − mean cosine(orig, projected) over real tokens (reference :472-483)."""
    a = text_e.astype(jnp.float32)
    b = proj_ort_e.astype(jnp.float32)
    cos = jnp.sum(a * b, axis=-1) / (
        jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-12)
    m = attn_mask.astype(jnp.float32)
    return float(1.0 - jnp.sum(cos * m) / jnp.sum(m))


def f_beta(z: float, btype: str = "sigmoid", upperbound_timestep: int = 10,
           concept_type: str = "nudity") -> int:
    """Map β to an adaptive window length in steps (reference :19-36)."""
    if "artists-" in concept_type:
        t, k = 5.5, 3.5
    else:
        t, k = 5.333, 2.5
    if btype == "tanh":
        v = math.tanh(k * (10 * z - t))
        return round(upperbound_timestep / 2.0 * (v + 1))
    if btype == "sigmoid":
        v = 1.0 / (1.0 + math.exp(-2.0 * k * (10 * z - t)))
        return round(upperbound_timestep * v)
    raise NotImplementedError(f"btype {btype}")
