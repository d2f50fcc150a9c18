"""Analytic model-FLOP counting for MFU reporting (bench.py).

Counts matmul + conv FLOPs by walking the jaxpr of a function traced with
the XLA reference paths forced (einsum attention, XLA convs, no fused
qkv), so the count is the *implementation-independent* model FLOPs: MXU
lane padding, Pallas blocking, and fusion choices do not change it. This
is the "model FLOPs" numerator of the standard MFU definition —
``mfu = (achieved model FLOP/s) / (hardware peak FLOP/s)``.

The reference repo reports no FLOPs/MFU anywhere; BASELINE.md anchors the
throughput bar at "A100-class". MFU makes that auditable against the v5e
peak (197 TFLOP/s bf16) instead of another accelerator's wall-clock.

Scope notes (documented undercounts, all small):
  * only ``dot_general`` / ``conv_general_dilated`` count — elementwise,
    softmax, norms are VPU work excluded by the MFU convention;
  * the repellency bank kernel is outside the model towers and excluded
    (≤0.43 ms/step at M=3000 vs ~52 ms/step of UNet — <1%);
  * int8 legs report MFU against the bf16 peak (the count is of model
    FLOPs, not int8 ops; the 394-TOPS int8 peak would halve the number).
"""

from __future__ import annotations

import contextlib
import math
import os

import jax

# TPU v5e (v5 lite) peak dense bf16 matmul throughput, FLOP/s.
V5E_PEAK_BF16 = 197e12


def _prod(xs) -> float:
    return float(math.prod(int(x) for x in xs))


def _eqn_flops(eqn) -> float:
    p = eqn.primitive.name
    if p == "dot_general":
        lhs = eqn.invars[0].aval
        rhs = eqn.invars[1].aval
        (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
        b = _prod(lhs.shape[d] for d in lb)
        k = _prod(lhs.shape[d] for d in lc)
        m = _prod(lhs.shape[d] for d in range(len(lhs.shape))
                  if d not in set(lc) | set(lb))
        n = _prod(rhs.shape[d] for d in range(len(rhs.shape))
                  if d not in set(rc) | set(rb))
        return 2.0 * b * m * n * k
    if p == "conv_general_dilated":
        # 2 * (N * spatial_out) * (KH * KW * Cin/groups * Cout)
        #   = 2 * prod(out)/Cout * prod(kernel)
        out = eqn.outvars[0].aval
        rhs = eqn.invars[1].aval
        dn = eqn.params["dimension_numbers"]
        c_out = out.shape[dn.out_spec[1]]
        return 2.0 * _prod(out.shape) / float(c_out) * _prod(rhs.shape)
    return 0.0


def _sub_jaxprs(params: dict):
    """Duck-typed: yield every Jaxpr/ClosedJaxpr in an eqn's params (works
    across jax versions without importing private core types)."""
    def _as_jaxpr(v):
        if hasattr(v, "eqns"):
            return v
        if hasattr(v, "jaxpr") and hasattr(getattr(v, "jaxpr"), "eqns"):
            return v.jaxpr
        return None

    for v in params.values():
        j = _as_jaxpr(v)
        if j is not None:
            yield j
        elif isinstance(v, (list, tuple)):
            for u in v:
                j = _as_jaxpr(u)
                if j is not None:
                    yield j


def _jaxpr_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        total += _eqn_flops(eqn)
        subs = [_jaxpr_flops(s) for s in _sub_jaxprs(eqn.params)]
        if not subs:
            continue
        name = eqn.primitive.name
        if name == "scan":
            total += float(eqn.params.get("length", 1)) * sum(subs)
        elif name == "cond":
            # static upper bound: the taken branch is data-dependent
            total += max(subs)
        else:  # pjit / remat / custom_* / while (body counted once)
            total += sum(subs)
    return total


@contextlib.contextmanager
def _xla_reference_paths():
    """Force the einsum-attention / XLA-conv trace so Pallas custom calls
    (opaque to the jaxpr walk) never appear. Same math, same model FLOPs."""
    from ..models import layers

    saved_impl = layers.ATTENTION_IMPL
    keys = ("SDT_PALLAS_CONV", "SDT_PALLAS_UPCONV", "SDT_FUSED_QKV")
    saved_env = {k: os.environ.get(k) for k in keys}
    layers.ATTENTION_IMPL = "einsum"
    os.environ.update({k: "0" for k in keys})
    try:
        yield
    finally:
        layers.ATTENTION_IMPL = saved_impl
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def model_flops(fn, *args) -> float:
    """Matmul + conv FLOPs of one ``fn(*args)`` call.

    Pure abstract tracing — no device work, so real-scale towers count in
    seconds on host. ``args`` may be arrays or ``jax.ShapeDtypeStruct``s.
    """
    with _xla_reference_paths():
        closed = jax.make_jaxpr(fn)(*args)
    return _jaxpr_flops(closed.jaxpr)


def mfu(img_per_sec: float, flops_per_img: float,
        peak: float | None = None) -> float:
    peak = peak or float(os.environ.get("SDT_PEAK_FLOPS", V5E_PEAK_BF16))
    return img_per_sec * flops_per_img / peak
