"""LoRA adapters for the erasure trainers (parameter-efficient ESD / flow).

The reference consumes fine-tuned erased UNets it cannot produce
(/root/reference/run_nudity.py:124-130); ``training/esd.py`` is the
full-fine-tune producer. This module adds the LoRA variant (Hu et al. 2021)
used pervasively in the erasure literature (ESD-x LoRA, SPM-style adapters):
only rank-``r`` factors ``A[in,r] @ B[r,out]`` of selected dense kernels
train, so a nudity-erase adapter is ~1-10 MB instead of a 3.4 GB UNet.

TPU-first design — a *functional overlay*, not a module rewrite:

* the base param tree is untouched and NEVER copied or donated (it serves
  as both the frozen-teacher and the student-base in the ESD loss, halving
  the training-state HBM of the full fine-tune);
* the adapter is a tiny flat pytree ``{path: {"a": A, "b": B}}`` keyed by
  the ``/``-joined param path — the only trainable/donated state;
* :func:`apply_lora` merges ``kernel + (alpha/r)·A@B`` inside the jitted
  loss via ``tree_map_with_path``, so XLA fuses the rank-r delta into the
  surrounding program and gradients flow to A/B alone — no masking, no
  ``optax.multi_transform``, no model-code changes (works for the UNet, the
  MMDiT, and anything else with 2-D ``kernel`` leaves);
* under a (data, model) mesh the base params shard per the TP rules while
  the adapter (tiny) replicates; GSPMD inserts the gradient psums.

B is zero-initialised, so at step 0 the merged model is bit-identical to
the base (regression-tested), matching the standard LoRA init.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from .esd import ESDConfig, esd_loss, make_optimizer

#: named target predicates over the '/'-joined param path. Any other string
#: is treated as a literal substring match (e.g. "ff" or "down_0").
LORA_TARGET_SETS = {
    "xattn": lambda s: "attn2" in s,
    "selfattn": lambda s: "attn1" in s,
    "attn": lambda s: "attn1" in s or "attn2" in s,
    # mirrors esd_param_mask('noxattn'): no cross-attn, no top-level time
    # embedding (per-resnet time_emb_proj stays IN — it is trainable in the
    # CompVis recipe); the output head is conv (4-D) so it never qualifies
    "noxattn": lambda s: ("attn2" not in s and "time_emb_1" not in s
                          and "time_emb_2" not in s),
    "full": lambda s: True,
}


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def lora_target_paths(params: Any, targets: str = "xattn") -> list:
    """The '/'-joined paths of the 2-D ``kernel`` leaves LoRA attaches to.

    ``targets`` is a named set (xattn/selfattn/attn/full) or a literal
    substring of the path. Only rank-2 leaves named ``kernel`` qualify
    (conv kernels are 4-D and biases/scales 1-D — LoRA does not apply).
    """
    pred = LORA_TARGET_SETS.get(targets) or (lambda s: targets in s)
    out = []

    def visit(path, leaf):
        s = _path_str(path)
        if (s.split("/")[-1] == "kernel" and getattr(leaf, "ndim", 0) == 2
                and pred(s)):
            if jnp.issubdtype(leaf.dtype, jnp.integer):
                raise ValueError(
                    f"LoRA target {s} has integer dtype {leaf.dtype} — "
                    "attach LoRA BEFORE enable_int8/quantize_*_params "
                    "(adapters train on the float kernels).")
            out.append(s)
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    if not out:
        raise ValueError(f"LoRA targets {targets!r} matched no 2-D kernel "
                         "leaves in the param tree")
    return out


def init_lora_params(params: Any, rng: jax.Array, rank: int,
                     targets: str = "xattn",
                     dtype: Any = jnp.float32) -> Dict[str, Dict[str, Any]]:
    """Create the adapter pytree: ``{path: {"a": [in,r], "b": [r,out]}}``.

    A ~ N(0, 1/in) (fan-in scaled), B = 0 — the standard LoRA init, so the
    merged model starts bit-identical to the base.
    """
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    by_path = {}

    def record(path, leaf):
        by_path[_path_str(path)] = leaf.shape
        return leaf

    jax.tree_util.tree_map_with_path(record, params)
    lora = {}
    for i, p in enumerate(lora_target_paths(params, targets)):
        d_in, d_out = by_path[p]
        k = jax.random.fold_in(rng, i)
        lora[p] = {
            "a": (jax.random.normal(k, (d_in, rank), dtype=jnp.float32)
                  * (d_in ** -0.5)).astype(dtype),
            "b": jnp.zeros((rank, d_out), dtype=dtype),
        }
    return lora


def lora_scale(rank: int, alpha: float | None = None) -> float:
    """The merge coefficient alpha/rank (alpha defaults to rank => 1.0)."""
    return (rank if alpha is None else alpha) / rank


def apply_lora(params: Any, lora: Dict[str, Dict[str, Any]],
               scale: float = 1.0, strict: bool = True) -> Any:
    """Merged tree: targeted kernels become ``kernel + scale * A @ B``.

    The delta accumulates in fp32 and is cast back to the kernel's dtype, so
    a zero B reproduces the base bit-exactly. Differentiable in ``lora`` —
    call inside the loss to train, or once at export time to materialise a
    merged checkpoint (:mod:`models.weights_export` then applies unchanged).

    ``strict`` (default) raises if any adapter entry matches no leaf of
    ``params`` — otherwise a path-mismatched adapter (wrong model family,
    foreign file) would merge as a silent no-op and the caller would sample
    from an unmodified model believing the erasure is active. The check is
    trace-time Python, so it costs nothing inside a jitted loss.
    """
    consumed = set()

    def upd(path, leaf):
        s = _path_str(path)
        ab = lora.get(s)
        if ab is None:
            return leaf
        consumed.add(s)
        delta = (ab["a"].astype(jnp.float32) @ ab["b"].astype(jnp.float32))
        return (leaf.astype(jnp.float32) + scale * delta).astype(leaf.dtype)

    merged = jax.tree_util.tree_map_with_path(upd, params)
    if strict:
        missing = sorted(set(lora) - consumed)
        if missing:
            raise ValueError(
                f"LoRA adapter has {len(missing)} entries matching no param "
                f"leaf (wrong model family or path layout?): "
                f"{missing[:5]}{'...' if len(missing) > 5 else ''}")
    return merged


def merge_lora_into(params: Any, path: str,
                    scale: float | None = None) -> Any:
    """Load an adapter file and return ``params`` with it merged in — the
    shared implementation behind ``SafeDiffusionPipeline.load_lora`` and
    ``SafeDiffusion3Pipeline.load_lora``.

    ``scale`` overrides the adapter's recorded alpha/rank coefficient.
    Raises on int8-quantized trees (adapters apply to float kernels — call
    before ``enable_int8``) and on adapters whose paths match no leaf.
    The merge runs as ONE jitted program (per-kernel eager dispatch would
    cost a tunnel RPC round-trip for every targeted kernel).
    """
    lora, meta = load_lora(path)
    if scale is None:
        scale = lora_scale(int(meta.get("rank", 1)), meta.get("alpha", None))
    if isinstance(params, dict) and "quant" in params:
        raise ValueError(
            "load_lora after enable_int8: the adapter applies to float "
            "kernels. Load the adapter first, then enable_int8().")
    # apply_lora's strict check is trace-time Python, so a path-mismatched
    # file raises while TRACING — before any compile work is spent
    return jax.jit(lambda p, l: apply_lora(p, l, scale))(params, lora)


def make_lora_esd_train_step(apply_fn: Callable,
                             cfg: ESDConfig = ESDConfig(),
                             scale: float = 1.0,
                             donate: bool = True) -> Callable:
    """One fused LoRA-ESD update: merge + loss + grad + adamw in one program.

    ``step(lora, opt_state, params, x_t, t, ctx_c, ctx_u)
    -> (lora, opt_state, loss)``. ``params`` is the base tree, passed as an
    argument (NOT closed over — closing over it would inline GBs of
    constants into the jitted program) and used for BOTH the frozen-teacher
    forwards and the student base; it is never donated, so no copy is
    needed (unlike :func:`make_esd_train_step`). Only the adapter and its
    opt state are donated.
    """
    tx = make_optimizer(cfg)

    def step(lora, opt_state, params, x_t, t, ctx_c, ctx_u):
        def loss_fn(l):
            merged = apply_lora(params, l, scale)
            return esd_loss(apply_fn, merged, params, x_t, t, ctx_c, ctx_u,
                            cfg.negative_guidance)
        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_lora_train_step(loss_of_merged: Callable,
                         cfg: ESDConfig = ESDConfig(),
                         scale: float = 1.0,
                         donate: bool = True) -> Callable:
    """Generic LoRA update for any loss over merged params (e.g. the SD3
    flow-matching loss): ``loss_of_merged(merged_params, *batch) -> scalar``.

    ``step(lora, opt_state, params, *batch) -> (lora, opt_state, loss)``.
    """
    tx = make_optimizer(cfg)

    def step(lora, opt_state, params, *batch):
        def loss_fn(l):
            return loss_of_merged(apply_lora(params, l, scale), *batch)
        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def save_lora(path: str, lora: Dict[str, Dict[str, Any]], rank: int,
              alpha: float | None = None, targets: str = "xattn",
              metadata: Dict[str, str] | None = None) -> None:
    """Persist an adapter: flat ``{param_path}.lora_{a,b}`` tensors plus a
    ``__lora_meta__/...`` scalar block. ``.safetensors`` or torch-pickle
    ``.pt`` (io/torch_pt.py) — both torch-loadable."""
    import numpy as np
    flat = {}
    for p, ab in lora.items():
        flat[p + ".lora_a"] = np.ascontiguousarray(np.asarray(ab["a"]))
        flat[p + ".lora_b"] = np.ascontiguousarray(np.asarray(ab["b"]))
    meta = {"rank": rank, "alpha": lora_scale(rank, alpha) * rank,
            "targets": targets, **(metadata or {})}
    if path.endswith(".safetensors"):
        from safetensors.numpy import save_file
        save_file(flat, path, metadata={k: str(v) for k, v in meta.items()})
    else:
        from ..io import save_pt
        save_pt({"lora": flat, "meta": meta}, path)


def load_lora(path: str):
    """Inverse of :func:`save_lora` -> ``(lora_tree, meta_dict)``."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open
        flat, meta = {}, {}
        with safe_open(path, framework="numpy") as f:
            meta = dict(f.metadata() or {})
            for k in f.keys():
                flat[k] = f.get_tensor(k)
        for k in ("rank",):
            if k in meta:
                meta[k] = int(meta[k])
        for k in ("alpha",):
            if k in meta:
                meta[k] = float(meta[k])
    else:
        from ..io import load_pt
        blob = load_pt(path)
        flat, meta = blob["lora"], dict(blob["meta"])
    lora: Dict[str, Dict[str, Any]] = {}
    unknown = []
    for k, v in flat.items():
        if k.endswith(".lora_a"):
            lora.setdefault(k[:-len(".lora_a")], {})["a"] = jnp.asarray(v)
        elif k.endswith(".lora_b"):
            lora.setdefault(k[:-len(".lora_b")], {})["b"] = jnp.asarray(v)
        else:
            unknown.append(k)
    if unknown or not lora:
        raise ValueError(
            f"{path} is not a LoRA adapter file: "
            + (f"{len(unknown)} keys end in neither .lora_a nor .lora_b "
               f"({unknown[:3]}...)" if unknown else "no .lora_a/.lora_b "
               "tensors found"))
    for p, ab in lora.items():
        if set(ab) != {"a", "b"}:
            raise ValueError(f"adapter file missing a/b pair for {p}")
    return lora, meta
