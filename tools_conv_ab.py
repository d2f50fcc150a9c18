"""Ad-hoc: same-session A/B of the fused Pallas 3x3 conv on the real TPU.

Three stages, each guarded so a Mosaic failure reports instead of aborting:
  1. numerics: fused kernel vs lax.conv at two decode shapes (with and
     without the GN-affine+SiLU prologue / residual epilogue);
  2. per-shape timing: kernel vs XLA conv emitter on the four decode probe
     shapes from the r3 close-out (whole-loop wall with a trailing scalar
     reduction — per-op block_until_ready lies through the tunnel);
  3. in-situ: full VAE decode [4,64,64,4] -> 512^2, SDT_PALLAS_CONV=0 vs 1,
     same process, whole-call wall time best-of-3.

Usage: python tools_conv_ab.py [stage]   (stage in {num, shapes, decode};
default all)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from safe_denoiser_tpu.ops.conv3x3 import conv3x3, supports  # noqa: E402

SHAPES = [  # (x_shape, co): the decode-leg probe set from the r3 close-out
    ((4, 128, 128, 512), 512),   # dec128
    ((4, 256, 256, 512), 512),   # dec256
    ((4, 256, 256, 256), 256),   # dec256c
    ((4, 512, 512, 128), 128),   # dec512
]


def _lax_ref(x, w, b, pre=None, act=None, residual=None):
    if pre is not None:
        x = (x * pre[0].astype(x.dtype)[:, None, None, :]
             + pre[1].astype(x.dtype)[:, None, None, :])
    if act == "silu":
        x = x * jax.nn.sigmoid(x)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                       dimension_numbers=dn,
                                       preferred_element_type=jnp.float32)
    out = out + b.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)


def _case(shape, co, seed=0):
    rng = np.random.RandomState(seed)
    ci = shape[-1]
    x = jnp.asarray(rng.randn(*shape) * 0.5, jnp.float32).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, ci, co) * 0.05,
                    jnp.float32).astype(jnp.bfloat16)
    b = jnp.asarray(rng.randn(co) * 0.1, jnp.float32).astype(jnp.bfloat16)
    return x, w, b


def stage_num():
    for shape, co in [((2, 64, 64, 512), 512), ((2, 128, 128, 256), 256)]:
        x, w, b = _case(shape, co)
        bsz, ci = shape[0], shape[-1]
        rng = np.random.RandomState(1)
        a_c = jnp.asarray(rng.rand(bsz, ci) * 0.5 + 0.75, jnp.float32)
        b_c = jnp.asarray(rng.randn(bsz, ci) * 0.2, jnp.float32)
        res = jnp.asarray(rng.randn(bsz, shape[1], shape[2], co),
                          jnp.float32).astype(jnp.bfloat16)
        for tag, kw in [("plain", {}),
                        ("fused", dict(pre_scale=a_c, pre_shift=b_c,
                                       act="silu", residual=res))]:
            got = np.asarray(conv3x3(x, w, b, **kw), np.float32)
            ref_kw = (dict(pre=(a_c, b_c), act="silu", residual=res)
                      if tag == "fused" else {})
            want = np.asarray(_lax_ref(x, w, b, **ref_kw), np.float32)
            d = np.abs(got - want)
            rel = d / (np.abs(want) + 1e-3)
            print(f"num {shape}x{co} {tag}: max|d|={d.max():.4f} "
                  f"maxrel={rel.max():.4f}", flush=True)


def _time(fn, *args, iters=20):
    # whole-loop wall with scalar-only transfer (tunnel rule)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    jax.block_until_ready(acc)
    return (time.perf_counter() - t0) / iters * 1e3


def stage_shapes():
    for shape, co in SHAPES:
        x, w, b = _case(shape, co)
        assert supports(shape, shape[-1], co)
        pall = jax.jit(lambda x, w, b: jnp.sum(
            conv3x3(x, w, b).astype(jnp.float32)))
        xla = jax.jit(lambda x, w, b: jnp.sum(
            _lax_ref(x, w, b).astype(jnp.float32)))
        tp = _time(pall, x, w, b)
        tx = _time(xla, x, w, b)
        print(f"shape {shape}->{co}: pallas {tp:.3f} ms  xla {tx:.3f} ms  "
              f"({tx / tp:.2f}x)", flush=True)


def stage_up():
    from safe_denoiser_tpu.ops.conv3x3 import conv3x3_up, supports_up

    # decoder upsample convs (half-res input shapes) + the UNet's 640ch one
    for shape, co, forms in [
            ((4, 64, 64, 512), 512, ("interleave", "planar")),
            ((4, 128, 128, 512), 512, ("interleave", "planar")),
            ((4, 256, 256, 256), 256, ("interleave", "planar")),
            ((8, 32, 32, 640), 640, ("planar",))]:
        x, w, b = _case(shape, co)
        assert supports_up(shape, shape[-1], co)
        bsz, h2, w2, ci = shape

        def xla_up(x, w, b):
            u = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (bsz, h2, 2, w2, 2, ci)).reshape(
                                     bsz, 2 * h2, 2 * w2, ci)
            return _lax_ref(u, w, b)

        want = np.asarray(jax.jit(xla_up)(x, w, b)[:, :64, :64, :32],
                          np.float32)
        tx = _time(jax.jit(lambda x, w, b: jnp.sum(
            xla_up(x, w, b).astype(jnp.float32))), x, w, b)
        for form in forms:
            try:
                got = np.asarray(
                    conv3x3_up(x, w, b, form=form)[:, :64, :64, :32],
                    np.float32)
                d = np.abs(got - want)
                tp = _time(jax.jit(functools.partial(
                    lambda fm, x, w, b: jnp.sum(
                        conv3x3_up(x, w, b, form=fm).astype(jnp.float32)),
                    form)), x, w, b)
                print(f"up {shape}->{co} [{form}]: max|d|={d.max():.4f}  "
                      f"pallas {tp:.3f} ms  xla {tx:.3f} ms  "
                      f"({tx / tp:.2f}x)", flush=True)
            except Exception as e:
                print(f"up {shape}->{co} [{form}] FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


def stage_decode():
    from safe_denoiser_tpu.models import SD14_VAE, AutoencoderKL

    rng = jax.random.PRNGKey(0)
    vae = AutoencoderKL(SD14_VAE, dtype=jnp.bfloat16)
    vae_params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02,
                           jnp.bfloat16 if (s.dtype == jnp.float32
                                            and len(s.shape) > 1) else s.dtype),
        jax.eval_shape(
            lambda: vae.init({"params": rng},
                             jnp.zeros((1, 512, 512, 3)), rng)))
    lat = jax.random.normal(rng, (4, 64, 64, 4), jnp.float32)

    def run(tag):
        f = jax.jit(lambda p, z: jnp.sum(
            vae.apply(p, z, method=vae.decode).astype(jnp.float32)))
        jax.block_until_ready(f(vae_params, lat))
        best = min(_time(f, vae_params, lat, iters=10) for _ in range(3))
        print(f"decode[{tag}]: {best:.2f} ms/batch4", flush=True)
        tdir = os.environ.get("SDT_AB_TRACE")
        if tdir:   # per-op attribution via tools_trace_cat <dir>/<tag>
            with jax.profiler.trace(os.path.join(tdir, tag)):
                jax.block_until_ready(f(vae_params, lat))
        return best

    os.environ["SDT_PALLAS_CONV"] = "0"
    t0 = run("xla")
    os.environ["SDT_PALLAS_CONV"] = "1"
    t1 = run("pallas-fused")
    print(f"decode in-situ: xla {t0:.2f} -> fused {t1:.2f} "
          f"({t0 / t1:.3f}x)", flush=True)
    # third variant: planar upsample lowering (the fallback if Mosaic
    # rejects the in-kernel interleave reshape) — each run() builds a fresh
    # jit so the env flip retraces
    try:
        os.environ["SDT_UP_FORM"] = "planar"
        t2 = run("pallas-fused-planar-up")
        print(f"decode in-situ planar-up: {t2:.2f} ({t0 / t2:.3f}x)",
              flush=True)
    finally:
        os.environ.pop("SDT_UP_FORM", None)
        os.environ["SDT_PALLAS_CONV"] = "0"


def main():
    stages = sys.argv[1:] or ["num", "shapes", "up", "decode"]
    for s in stages:
        try:
            {"num": stage_num, "shapes": stage_shapes, "up": stage_up,
             "decode": stage_decode}[s]()
        except Exception as e:  # Mosaic compile failures report, not abort
            print(f"STAGE {s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
