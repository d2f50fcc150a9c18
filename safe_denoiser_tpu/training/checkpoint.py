"""Training checkpoint/resume: (params, opt_state, step, rng) snapshots.

The reference has no training and no resume anywhere ("re-running a job
regenerates all images" — SURVEY §5); this framework's training subsystem
produces the erased checkpoints the reference consumes, and a long ESD
fine-tune on preemptible TPUs needs restartability. One msgpack file
(flax.serialization state dicts), written atomically (tmp + os.replace) so
a preemption mid-write never corrupts the previous snapshot.

Restore takes the live params/opt_state trees as TEMPLATES so structure and
dtypes survive exactly; a resumed run is bit-identical to an uninterrupted
one (tests/test_training.py::test_checkpoint_resume_bit_identical —
adamw is deterministic, and the carried PRNG key is part of the state).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _rng_to_np(rng):
    if rng is None:
        return None, False
    if jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key):
        return np.asarray(jax.random.key_data(rng)), True
    return np.asarray(rng), False


def save_train_state(path: str, params: Any, opt_state: Any, step: int,
                     rng=None, metadata: Optional[dict] = None) -> None:
    """Atomically snapshot a training loop's full restartable state."""
    rng_np, rng_typed = _rng_to_np(rng)
    state = {
        "params": serialization.to_state_dict(jax.device_get(params)),
        "opt_state": serialization.to_state_dict(jax.device_get(opt_state)),
        "step": np.int64(step),
        "rng": rng_np if rng_np is not None else np.zeros((0,), np.uint32),
        "rng_typed": rng_typed,
        "metadata": dict(metadata or {}),
    }
    blob = serialization.msgpack_serialize(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def restore_train_state(path: str, params_template: Any,
                        opt_state_template: Any
                        ) -> Tuple[Any, Any, int, Any, dict]:
    """-> (params, opt_state, step, rng-or-None, metadata).

    Templates supply the tree structure/dtypes (the live init-time trees);
    leaves are replaced by the snapshot's values.
    """
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(params_template, state["params"])
    opt_state = serialization.from_state_dict(opt_state_template,
                                              state["opt_state"])
    # from_state_dict restores arrays of ANY shape into the template
    # (verified: no validation in flax) — a resume with changed
    # hyperparameters (e.g. a different --lora_rank) would silently
    # continue with stale-shaped state. Fail loudly instead.
    for name, restored, template in (("params", params, params_template),
                                     ("opt_state", opt_state,
                                      opt_state_template)):
        flat_r = jax.tree_util.tree_flatten_with_path(restored)[0]
        flat_t = dict(jax.tree_util.tree_flatten_with_path(template)[0])
        for p, leaf in flat_r:
            tmpl = flat_t.get(p)
            got = getattr(leaf, "shape", None)
            want = getattr(tmpl, "shape", None)
            if got != want:
                s = "/".join(str(getattr(k, "key", k)) for k in p)
                raise ValueError(
                    f"checkpoint {path} {name} leaf {s} has shape {got} but "
                    f"the live template expects {want} — the run was "
                    "restarted with different hyperparameters (e.g. "
                    "--lora_rank) than the snapshot was written with")
    rng = state["rng"]
    if rng.size == 0:
        rng = None
    elif state["rng_typed"]:
        rng = jax.random.wrap_key_data(rng)
    return params, opt_state, int(state["step"]), rng, state["metadata"]
