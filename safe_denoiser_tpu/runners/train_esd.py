"""ESD concept-erasure trainer CLI — produces the fine-tuned UNet
checkpoints the reference can only consume (its run_nudity.py:124-130 swaps
in pre-made ``esd``/``rece`` state dicts; this is where such artifacts come
from, per the ESD recipe of Gandikota et al. 2023).

Flow: load an HF-layout SD checkpoint, encode the concept prompt and the
empty prompt once, snapshot the frozen model, then iterate the fused
(loss+grad+adamw) train step of ``training/esd.py`` on (x_t, t) points drawn
near the concept's own sampling trajectory (``sample_xt_for_esd``). The
erased UNet is exported back to the torch interchange layout
(``models/weights_export.invert_unet``) as ``.safetensors`` or ``.pt`` —
loadable by ``--erase_concept_checkpoint`` here AND by torch/diffusers.

Usage:
    python train_esd.py --model_dir <ckpt> --prompt "nudity" \
        --train_method noxattn --iterations 1000 --save_path esd_nudity.pt
"""

from __future__ import annotations

import argparse
import os
import time

from ..utils.config import read_json
from ..utils.logging import Logger


def parse_args(argv=None) -> argparse.Namespace:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", type=str, default=None)
    pre_args, _ = pre.parse_known_args(argv)
    cfg = read_json(pre_args.config) if pre_args.config else {}
    g = cfg.get

    p = argparse.ArgumentParser(
        description="Safe-Denoiser TPU ESD erasure trainer", parents=[pre])
    p.add_argument("--model_dir", type=str, default=g("model_dir", None),
                   help="local HF-layout SD checkpoint dir (unet/ vae/ ...)")
    p.add_argument("--prompt", type=str, default=g("prompt", "nudity"),
                   help="concept to erase")
    p.add_argument("--train_method", type=str,
                   default=g("train_method", "noxattn"),
                   choices=["noxattn", "xattn", "selfattn", "full"],
                   help="parameter subset to fine-tune (ESD: noxattn for "
                        "global concepts like nudity, xattn for named "
                        "styles/objects)")
    p.add_argument("--iterations", type=int, default=g("iterations", 1000))
    p.add_argument("--lr", type=float, default=g("lr", 1e-5))
    p.add_argument("--negative_guidance", type=float,
                   default=g("negative_guidance", 1.0))
    p.add_argument("--start_guidance", type=float,
                   default=g("start_guidance", 3.0),
                   help="CFG scale for the partial denoise that draws x_t")
    p.add_argument("--denoise_steps", type=int, default=g("denoise_steps", 3),
                   help="coarse DDIM steps of the x_t draw (unrolled in-jit)")
    p.add_argument("--batch_size", type=int, default=g("batch_size", 1))
    p.add_argument("--image_length", type=int, default=g("image_length", 512))
    p.add_argument("--seed", type=int, default=g("seed", 42))
    p.add_argument("--log_every", type=int, default=g("log_every", 50))
    p.add_argument("--lora_rank", type=int, default=g("lora_rank", 0),
                   help="train a rank-r LoRA adapter instead of full "
                        "fine-tuning (0 = full fine-tune). Base weights "
                        "stay frozen; export is the merged UNet plus an "
                        "optional standalone adapter (--save_lora_path)")
    p.add_argument("--lora_alpha", type=float, default=g("lora_alpha", None),
                   help="LoRA merge alpha (default = rank, i.e. scale 1.0)")
    p.add_argument("--lora_targets", type=str,
                   default=g("lora_targets", None),
                   help="kernel subset for LoRA (default: derived from "
                        "--train_method; or xattn/selfattn/attn/full/"
                        "<path substring>)")
    p.add_argument("--save_lora_path", type=str,
                   default=g("save_lora_path", None),
                   help="also save the standalone adapter (.safetensors "
                        "or .pt) — loadable via SafeDiffusionPipeline."
                        "load_lora")
    p.add_argument("--save_path", type=str,
                   default=g("save_path", "./esd_unet.safetensors"),
                   help=".safetensors or .pt — the torch-layout erased UNet")
    p.add_argument("--save-dir", type=str, default=g("save_dir", None),
                   help="log dir (defaults to the save_path directory)")
    p.add_argument("--save_every", type=int, default=g("save_every", 0),
                   help="snapshot (params, opt_state, step, rng) every N "
                        "iterations (0 = off); atomic msgpack at "
                        "<save_path>.train_state")
    p.add_argument("--resume", action="store_true",
                   default=g("resume", False),
                   help="continue from <save_path>.train_state if present "
                        "(bit-identical to an uninterrupted run)")
    return p.parse_args(argv)


def export_unet(params, cfg, save_path: str) -> None:
    """Erased Flax UNet params → torch-layout state dict on disk."""
    import numpy as np

    from ..models.weights_export import invert_unet
    sd = invert_unet(params["params"], cfg)
    sd = {k: np.ascontiguousarray(np.asarray(v)) for k, v in sd.items()}
    if save_path.endswith(".safetensors"):
        from safetensors.numpy import save_file
        save_file(sd, save_path)
    else:
        from ..io import save_pt
        save_pt(sd, save_path)


def main(argv=None):
    args = parse_args(argv)
    if args.model_dir is None:
        raise SystemExit("--model_dir pointing at a local HF-layout SD "
                         "checkpoint is required (no network egress).")

    import jax
    import jax.numpy as jnp

    from ..pipeline.diffusion import SafeDiffusionPipeline
    from ..training import (ESDConfig, esd_param_mask, make_esd_train_step,
                            make_optimizer, sample_xt_for_esd)

    log_dir = args.save_dir or os.path.dirname(
        os.path.abspath(args.save_path))
    os.makedirs(log_dir, exist_ok=True)
    logger = Logger(os.path.join(log_dir, "train_logs.txt"))
    for arg in vars(args):
        logger.log(f"{arg}: {getattr(args, arg)}")

    pipe = SafeDiffusionPipeline.from_pretrained(args.model_dir,
                                                 logger=logger)
    b = args.batch_size
    embeds, _, _ = pipe.encode_prompt(args.prompt)
    ctx_u = jnp.tile(embeds[0], (b, 1, 1))   # [B, L, D] empty-prompt states
    ctx_c = jnp.tile(embeds[1], (b, 1, 1))   # [B, L, D] concept states

    params = pipe.unet_params
    cfg = ESDConfig(negative_guidance=args.negative_guidance,
                    learning_rate=args.lr)

    def apply_fn(p, x, t, ctx):
        return pipe.unet.apply(p, x, t, ctx)

    use_lora = args.lora_rank > 0
    if use_lora:
        from ..training import (apply_lora, init_lora_params, lora_scale,
                                make_lora_esd_train_step)
        targets = args.lora_targets or args.train_method
        lora = init_lora_params(params, jax.random.PRNGKey(args.seed + 1),
                                args.lora_rank, targets)
        scale = lora_scale(args.lora_rank, args.lora_alpha)
        n_train = sum(int(jnp.size(p))
                      for p in jax.tree_util.tree_leaves(lora))
        logger.log(f"lora rank={args.lora_rank} targets={targets}: "
                   f"{n_train:,} trainable parameters "
                   f"({len(lora)} kernels)")
        frozen = params     # base is never updated: it IS the teacher
        step = make_lora_esd_train_step(apply_fn, cfg, scale=scale)
        opt_state = make_optimizer(cfg).init(lora)
    else:
        frozen = jax.tree_util.tree_map(jnp.copy, params)  # params donated
        mask = esd_param_mask(params, args.train_method)
        n_train = sum(int(jnp.size(p)) for p, m in
                      zip(jax.tree_util.tree_leaves(params),
                          jax.tree_util.tree_leaves(mask)) if m)
        logger.log(f"train_method={args.train_method}: "
                   f"{n_train:,} trainable parameters")
        step = make_esd_train_step(apply_fn, cfg, param_mask=mask)
        opt_state = make_optimizer(cfg, mask).init(params)

    side = args.image_length // 8
    shape = (b, side, side, 4)
    draw = jax.jit(lambda p, r: sample_xt_for_esd(
        apply_fn, p, pipe.scheduler, ctx_c, ctx_u, r, shape,
        num_steps=args.denoise_steps, guidance_scale=args.start_guidance))

    rng = jax.random.PRNGKey(args.seed)
    ckpt_path = args.save_path + ".train_state"
    start_it = 0
    # the trained tree is the adapter under LoRA, the full params otherwise;
    # checkpoints/resume handle either transparently
    train_tree = lora if use_lora else params
    if args.resume and os.path.exists(ckpt_path):
        from ..training import restore_train_state
        train_tree, opt_state, start_it, rng, meta = restore_train_state(
            ckpt_path, train_tree, opt_state)
        ck_rank = int(meta.get("lora_rank", args.lora_rank))
        if ck_rank != args.lora_rank:
            # restore_train_state already rejects shape mismatches; this
            # catches the rank change before any further confusion (e.g. a
            # changed alpha/rank merge scale applied to restored factors)
            raise SystemExit(
                f"--resume with --lora_rank {args.lora_rank} but "
                f"{ckpt_path} was written at lora_rank {ck_rank}")
        logger.log(f"resumed from {ckpt_path} at iter {start_it}")

    t0 = time.time()
    for it in range(start_it, args.iterations):
        rng, k = jax.random.split(rng)
        x_t, t = draw(frozen, k)
        if use_lora:
            train_tree, opt_state, loss = step(train_tree, opt_state,
                                               params, x_t, t, ctx_c, ctx_u)
        else:
            train_tree, opt_state, loss = step(train_tree, frozen, opt_state,
                                               x_t, t, ctx_c, ctx_u)
        if it % args.log_every == 0 or it == args.iterations - 1:
            logger.log(f"iter {it}: loss {float(loss):.6f} "
                       f"({time.time() - t0:.1f}s)")
        if args.save_every and (it + 1) % args.save_every == 0:
            # the carried rng is saved POST-split, so the resumed stream
            # continues exactly where this one left off
            from ..training import save_train_state
            save_train_state(ckpt_path, train_tree, opt_state, it + 1, rng,
                             metadata={"prompt": args.prompt,
                                       "train_method": args.train_method,
                                       "lora_rank": args.lora_rank})

    if use_lora:
        # one compiled program — eager apply_lora would dispatch ~4 ops per
        # targeted kernel individually (each a tunnel RPC round-trip)
        merged = jax.jit(lambda p, l: apply_lora(p, l, scale))(params,
                                                               train_tree)
        export_unet(merged, pipe.unet.config, args.save_path)
        if args.save_lora_path:
            from ..training import save_lora
            save_lora(args.save_lora_path, train_tree, args.lora_rank,
                      args.lora_alpha, targets,
                      metadata={"prompt": args.prompt})
            logger.log(f"LoRA adapter saved: {args.save_lora_path}")
    else:
        export_unet(train_tree, pipe.unet.config, args.save_path)
    logger.log(f"Erased UNet saved: {args.save_path}")
    print("end")


if __name__ == "__main__":
    main()
