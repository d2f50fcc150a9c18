"""One-command real-asset parity runbook (VERDICT r3 next #5).

The standing ≤2% parity risk is that the repo has never touched the real
weights / banks / NudeNet ONNX (zero egress). This script is the prepared
answer: pointed at a directory of real assets, it runs the five BASELINE.md
benchmark configurations through the REAL runner entry points and emits a
comparison table against the PyTorch reference's recorded numbers —
so the day real assets appear, parity is one command away
(reference aggregation: run_nudity.py:507-529 + evaluate_coco30k_fid_clip.py).

Asset directory layout (everything optional except sd14/ — absent assets
skip their configs with a note, they never fail the run):

    assets/
      sd14/                      HF-layout SD-1.4 checkpoint dir
      sd3/                       HF-layout SD3-medium checkpoint dir
      nudenet.onnx               the real classifier_model.onnx
      bank/<name>/*.png          negative-image bank (task YAMLs generated)
      prompts/nudity.csv         i2p prompt CSV (else a tiny builtin set)
      prompts/coco.csv           COCO captions CSV
      prompts/copro.csv          CoPro CSV
      q16/prompts.p              Q16 learned-prompt pickle
      q16/clip_vision.safetensors  CLIP ViT-L/14 vision state dict (also
                                 used for the COCO offline CLIPScore)
      inception.safetensors      Inception-v3 weights (COCO FID)
      coco_ref_images/           COCO reference images (FID ground set)
      reference_results.json     the reference's measured numbers, e.g.
                                 {"nudity_toxic_ratio": 0.0431,
                                  "coco_clip_score": 31.2, ...}

Usage:
    python tools_parity_matrix.py --assets DIR [--out DIR] [--limit 10]
        [--steps 50] [--image_length 512]
    python tools_parity_matrix.py --selftest    # fabricated tiny assets,
        end-to-end dry run of the whole matrix (CPU-safe, used by tests)

Output: <out>/parity_matrix.json + a markdown table on stdout with each
metric, the reference value (when provided), the relative delta, and a
PASS/FAIL verdict at the ≤2% budget (BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------------------------
# config runners — each returns {metric_name: value} or raises SkipConfig
# --------------------------------------------------------------------------
class SkipConfig(Exception):
    pass


def _need(path, what):
    if not os.path.exists(path):
        raise SkipConfig(f"{what} not found at {path}")
    return path


def _write_task_yaml(out_dir, bank_root, bank_name, size, method="kernel_fast",
                     params=None):
    params = params or {"sigma": 3.15, "scale": 0.33, "beta_threshold": 7.0}
    p = os.path.join(out_dir, f"task_{bank_name}_{method}.yaml")
    lines = ["repellency:", f"  method: {method}", "  n_embed: 2", "  params:"]
    for k, v in params.items():
        lines.append(f"    {k}: {v}")
    lines += ["data:", "  name: artists", f"  root: {bank_root}",
              f"  class_info: {bank_name}", f"  size: {size}",
              "mean_processor: null"]
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def _builtin_csv(out_dir, name, n):
    p = os.path.join(out_dir, f"{name}.csv")
    with open(p, "w") as f:
        f.write("case_number,prompt,evaluation_seed,categories\n")
        for i in range(n):
            f.write(f"{i},portrait photo case {i},{i + 11},sexual\n")
    return p


def _limit_csv(src, out_dir, name, limit):
    import pandas as pd
    df = pd.read_csv(src).head(limit)
    p = os.path.join(out_dir, f"{name}_head{limit}.csv")
    df.to_csv(p, index=False)
    return p


def run_nudity_config(a, out):
    """BASELINE config 1: run_nudity toxic_ratio (NudeNet gate)."""
    ckpt = _need(os.path.join(a.assets, "sd14"), "SD-1.4 checkpoint")
    onnx = _need(os.path.join(a.assets, "nudenet.onnx"), "NudeNet model")
    bank_root = os.path.join(a.assets, "bank")
    banks = sorted(os.listdir(bank_root)) if os.path.isdir(bank_root) else []
    if not banks:
        raise SkipConfig(f"no negative bank under {bank_root}")
    task = _write_task_yaml(out, bank_root, banks[0], a.image_length)
    src = os.path.join(a.assets, "prompts", "nudity.csv")
    csv = (_limit_csv(src, out, "nudity", a.limit) if os.path.exists(src)
           else _builtin_csv(out, "nudity", min(a.limit, 5)))
    save = os.path.join(out, "nudity")
    from safe_denoiser_tpu.runners.nudity import main
    main(["--data", csv, "--save-dir", save, "--erase_id", "std_rep",
          "--model_dir", ckpt, "--task_config", task,
          "--category", "nudity", "--nudenet-path", onnx,
          "--num_inference_steps", str(a.steps),
          "--image_length", str(a.image_length)])
    dd = json.load(open(os.path.join(save, "detect_dict.json")))
    ratios = dd.get("toxic_ratio", {})
    avg = (float(np.mean(list(ratios.values()))) if ratios
           else float(np.mean(dd.get("unsafe", [0.0]))))
    return {"nudity_toxic_ratio": avg}


def run_coco_config(a, out):
    """BASELINE config 2: vanilla COCO sampling + offline CLIPScore/FID
    (offline metrics only when their tower weights are present)."""
    ckpt = _need(os.path.join(a.assets, "sd14"), "SD-1.4 checkpoint")
    src = os.path.join(a.assets, "prompts", "coco.csv")
    csv = (_limit_csv(src, out, "coco", a.limit) if os.path.exists(src)
           else _builtin_csv(out, "coco", min(a.limit, 5)))
    save = os.path.join(out, "coco")
    from safe_denoiser_tpu.runners.coco30k import main
    main(["--data", csv, "--save-dir", save, "--erase_id", "std",
          "--model_dir", ckpt, "--num_inference_steps", str(a.steps),
          "--image_length", str(a.image_length), "--batch_size", "2"])
    res = {"coco_images": float(len(os.listdir(os.path.join(save, "all"))))}
    # offline metrics use the documented asset layout; absent weights add a
    # NOTE (never a silent omission — the runbook's contract)
    clip_w = os.path.join(a.assets, "q16", "clip_vision.safetensors")
    if os.path.exists(clip_w):
        from safe_denoiser_tpu.evals.offline import evaluate_clip_score
        res["coco_clip_score"] = float(evaluate_clip_score(
            os.path.join(save, "all"), csv, weights_path=clip_w))
    else:
        a.notes["coco_clip_score"] = f"no CLIP vision weights at {clip_w}"
    inception_w = os.path.join(a.assets, "inception.safetensors")
    coco_ref = os.path.join(a.assets, "coco_ref_images")
    if os.path.exists(inception_w) and os.path.isdir(coco_ref):
        from safe_denoiser_tpu.evals.offline import evaluate_fid
        res["coco_fid"] = float(evaluate_fid(
            os.path.join(save, "all"), coco_ref,
            weights_path=inception_w))
    else:
        a.notes["coco_fid"] = (f"needs {inception_w} + {coco_ref}/ "
                               "(Inception weights; COCO reference images)")
    return res


def run_artist_config(a, out):
    """BASELINE config 3: artist erasure with sparse (SPELL) repellency."""
    ckpt = _need(os.path.join(a.assets, "sd14"), "SD-1.4 checkpoint")
    bank_root = os.path.join(a.assets, "bank")
    banks = sorted(os.listdir(bank_root)) if os.path.isdir(bank_root) else []
    if not banks:
        raise SkipConfig(f"no negative bank under {bank_root}")
    task = _write_task_yaml(out, bank_root, banks[0], a.image_length,
                            method="sparse",
                            params={"radius": 38.746, "scale": 1.6})
    save = os.path.join(out, "munch")
    from safe_denoiser_tpu.runners.artist import main
    main("munch", ["--save-dir", save, "--erase_id", "std_rep",
                   "--model_dir", ckpt, "--task_config", task,
                   "--num-samples", str(min(a.limit, 3)),
                   "--num_inference_steps", str(a.steps),
                   "--image_length", str(a.image_length)])
    return {"artist_images": float(len(os.listdir(os.path.join(save, "all"))))}


def run_copro_config(a, out):
    """BASELINE config 4: CoPro + Q16 inappropriate-probability ratio."""
    ckpt = _need(os.path.join(a.assets, "sd14"), "SD-1.4 checkpoint")
    q16 = _need(os.path.join(a.assets, "q16", "prompts.p"), "Q16 prompts")
    clip_w = _need(os.path.join(a.assets, "q16", "clip_vision.safetensors"),
                   "CLIP vision weights")
    bank_root = os.path.join(a.assets, "bank")
    banks = sorted(os.listdir(bank_root)) if os.path.isdir(bank_root) else []
    if not banks:
        raise SkipConfig(f"no negative bank under {bank_root}")
    task = _write_task_yaml(out, bank_root, banks[0], a.image_length)
    src = os.path.join(a.assets, "prompts", "copro.csv")
    csv = (_limit_csv(src, out, "copro", a.limit) if os.path.exists(src)
           else None)
    if csv is None:
        p = os.path.join(out, "copro.csv")
        with open(p, "w") as f:
            f.write("idx,unsafe_prompt,safe_prompt,concept,category\n")
            for i in range(min(a.limit, 5)):
                f.write(f"{i},portrait case {i},a hat,x,sexual\n")
        csv = p
    save = os.path.join(out, "copro")
    from safe_denoiser_tpu.runners.copro import main
    main(["--data", csv, "--save-dir", save, "--erase_id", "std_rep",
          "--model_dir", ckpt, "--task_config", task,
          "--q16_path", q16, "--clip_vision_weights", clip_w,
          "--num_inference_steps", str(a.steps),
          "--image_length", str(a.image_length)])
    dd = json.load(open(os.path.join(save, "detect_dict.json")))
    ratios = dd.get("toxic_ratio", {})
    avg = (float(np.mean(list(ratios.values()))) if ratios
           else float(np.mean(dd.get("unsafe", [0.0]))))
    return {"copro_inappropriate_ratio": avg}


def run_sd3_config(a, out):
    """BASELINE config 5: SD3 safe-denoiser nudity run."""
    ckpt = _need(os.path.join(a.assets, "sd3"), "SD3 checkpoint")
    onnx = _need(os.path.join(a.assets, "nudenet.onnx"), "NudeNet model")
    bank_root = os.path.join(a.assets, "bank")
    banks = sorted(os.listdir(bank_root)) if os.path.isdir(bank_root) else []
    if not banks:
        raise SkipConfig(f"no negative bank under {bank_root}")
    size = a.sd3_image_length
    task = _write_task_yaml(out, bank_root, banks[0], size,
                            params={"sigma": 2.75, "scale": 0.03})
    src = os.path.join(a.assets, "prompts", "nudity.csv")
    csv = (_limit_csv(src, out, "sd3_nudity", a.limit)
           if os.path.exists(src)
           else _builtin_csv(out, "sd3_nudity", min(a.limit, 3)))
    save = os.path.join(out, "sd3_nudity")
    from safe_denoiser_tpu.runners.sdv3 import main_nudity
    main_nudity(["--data", csv, "--save-dir", save, "--model_dir", ckpt,
                 "--task_config", task, "--category", "nudity",
                 "--nudenet-path", onnx,
                 "--num_inference_steps", str(a.steps),
                 "--image_length", str(size)])
    dd = json.load(open(os.path.join(save, "detect_dict.json")))
    ratios = dd.get("toxic_ratio", {})
    avg = (float(np.mean(list(ratios.values()))) if ratios
           else float(np.mean(dd.get("unsafe", [0.0]))))
    return {"sd3_toxic_ratio": avg}


CONFIGS = [
    ("1 nudity (NudeNet toxic_ratio)", run_nudity_config),
    ("2 coco30k (FID/CLIP fidelity)", run_coco_config),
    ("3 artist erasure (sparse)", run_artist_config),
    ("4 copro (Q16)", run_copro_config),
    ("5 sd3 nudity", run_sd3_config),
]


# --------------------------------------------------------------------------
def emit_table(results: dict, reference: dict, budget: float = 0.02):
    rows = []
    for metric, value in sorted(results.items()):
        ref = reference.get(metric)
        if ref is None:
            rows.append((metric, value, None, None, "no reference value"))
            continue
        delta = abs(value - ref) / max(abs(ref), 1e-12)
        rows.append((metric, value, ref, delta,
                     "PASS" if delta <= budget else "FAIL"))
    print("\n| metric | ours | reference | rel delta | <=2% verdict |")
    print("|---|---|---|---|---|")
    for m, v, r, d, verdict in rows:
        print(f"| {m} | {v:.4f} | "
              f"{'-' if r is None else f'{r:.4f}'} | "
              f"{'-' if d is None else f'{d:.2%}'} | {verdict} |")
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--assets", type=str, default=None)
    ap.add_argument("--out", type=str, default="./parity_out")
    ap.add_argument("--limit", type=int, default=10,
                    help="max prompts/samples per config")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--image_length", type=int, default=512)
    ap.add_argument("--sd3_image_length", type=int, default=1024)
    ap.add_argument("--selftest", action="store_true",
                    help="fabricate tiny assets and dry-run the full matrix")
    a = ap.parse_args(argv)

    if a.selftest:
        a.assets = _fabricate_selftest_assets()
        a.steps, a.limit = 2, 2
        a.image_length, a.sd3_image_length = 32, 16

    if not a.assets:
        ap.error("--assets DIR (or --selftest) is required")
    os.makedirs(a.out, exist_ok=True)
    a.notes = {}   # per-metric skip notes from inside configs

    results, skipped = {}, {}
    for name, fn in CONFIGS:
        try:
            print(f"[parity] running config {name} ...", flush=True)
            results.update(fn(a, a.out))
        except SkipConfig as e:
            skipped[name] = str(e)
            print(f"[parity] SKIP {name}: {e}", flush=True)
        except Exception as e:  # a failing config must not hide the others
            skipped[name] = f"ERROR: {type(e).__name__}: {e}"
            import traceback
            traceback.print_exc()

    ref_path = os.path.join(a.assets, "reference_results.json")
    reference = json.load(open(ref_path)) if os.path.exists(ref_path) else {}
    rows = emit_table(results, reference)
    payload = {
        "results": results,
        "reference": reference,
        "skipped": skipped,
        "notes": a.notes,
        "verdicts": {m: v for m, _, _, _, v in rows},
        "limit": a.limit, "steps": a.steps,
    }
    out_json = os.path.join(a.out, "parity_matrix.json")
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"\n[parity] wrote {out_json}")
    return payload


def _reshard_with_torch(weights_dir: str, stem: str, n_shards: int = 2):
    """Rewrite a single-file safetensors checkpoint dir as a SHARDED
    torch-safetensors checkpoint: ``{stem}-0000i-of-0000N.safetensors``
    shards written by ``safetensors.torch.save_file`` plus the HF
    ``weight_map`` index — the exact layout ``save_pretrained`` emits for
    models over the shard size limit (the sharded-T5 case our SD3 loader
    must handle on day one)."""
    import json

    import torch
    from safetensors.torch import save_file as torch_save_file

    from safe_denoiser_tpu.models.weights import load_state_dict

    src = os.path.join(weights_dir, "model.safetensors")
    sd = load_state_dict(src)
    os.remove(src)
    keys = sorted(sd)
    per = (len(keys) + n_shards - 1) // n_shards
    weight_map, total = {}, 0
    for i in range(n_shards):
        fname = f"{stem}-{i + 1:05d}-of-{n_shards:05d}.safetensors"
        chunk = keys[i * per:(i + 1) * per]
        torch_save_file(
            {k: torch.from_numpy(np.ascontiguousarray(sd[k]))
             for k in chunk},
            os.path.join(weights_dir, fname))
        weight_map.update({k: fname for k in chunk})
        total += sum(int(np.asarray(sd[k]).nbytes) for k in chunk)
    with open(os.path.join(weights_dir, f"{stem}.safetensors.index.json"),
              "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f)


def _export_torch_nudenet(path: str):
    """A NudeNet-classifier-shaped model (strided conv + BN + depthwise/
    pointwise separable conv + GAP + dense + softmax — the Xception family
    classify_pil.py runs) exported through the REAL ``torch.onnx``
    exporter, with the TF-converted graph's NHWC calling convention: the
    model takes [N, 256, 256, 3] floats and permutes internally, so the
    export carries the leading Transpose the real TF-converted file has."""
    import torch
    from torch import nn

    class _NudeNetStack(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 8, 3, stride=2, padding=1)
            self.bn = nn.BatchNorm2d(8)
            self.dw = nn.Conv2d(8, 8, 3, padding=1, groups=8)
            self.pw = nn.Conv2d(8, 16, 1)
            self.fc = nn.Linear(16, 2)

        def forward(self, x):
            x = x.permute(0, 3, 1, 2)
            x = torch.relu(self.bn(self.conv(x)))
            x = torch.relu(self.pw(self.dw(x)))
            x = x.mean(dim=(2, 3))
            return torch.softmax(self.fc(x), dim=1)

    torch.manual_seed(0)
    m = _NudeNetStack().eval()
    with torch.no_grad():
        m.bn.running_mean.normal_()
        m.bn.running_var.uniform_(0.5, 2.0)

    # torch.onnx.export without the `onnx` package installed (the
    # passthrough shim tests/test_onnx_torch_export.py uses)
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils
    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda b, custom_opsets: b
    try:
        torch.onnx.export(
            m, (torch.randn(2, 256, 256, 3),), path, dynamo=False,
            opset_version=13, input_names=["input_1"],
            output_names=["dense/Softmax:0"],
            dynamic_axes={"input_1": {0: "batch"}})
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def _fabricate_selftest_assets() -> str:
    """Tiny fabricated asset tree exercising every config path end-to-end
    (the dry run that proves the runbook works before real assets exist)."""
    import pickle
    import tempfile

    import torch
    import transformers
    from PIL import Image

    from tests.test_e2e_pipeline import _tiny_tokenizer
    from tests.test_nudenet_graph import _build_graph_and_torch
    from tests.test_runner_cli import _write_checkpoint
    from tests.test_sd3_from_pretrained import write_sd3_checkpoint

    root = tempfile.mkdtemp(prefix="parity_selftest_")
    import pathlib
    tok = _tiny_tokenizer()
    ck = _write_checkpoint(pathlib.Path(root), tok)   # writes root/ckpt
    os.rename(str(ck), os.path.join(root, "sd14"))
    write_sd3_checkpoint(pathlib.Path(root) / "sd3", tok)

    # REAL-PRODUCER re-authoring (VERDICT r4 #4 — first-contact hardening):
    # the assets below flow through the same writers the day-one real files
    # came from, so the selftest exercises our decoders against authentic
    # byte layouts, not just self-consistent fabrications. The ONNX
    # attribute-encoding bug only fell to exactly this technique
    # (tests/test_onnx_torch_export.py).

    # (a) sd14 UNet re-written as a SHARDED torch-safetensors checkpoint
    # (safetensors.torch writer + HF weight_map index — the layout
    # diffusers save_pretrained emits for big models)
    _reshard_with_torch(os.path.join(root, "sd14", "unet"),
                        "diffusion_pytorch_model")

    # (b) NudeNet classifier exported by the REAL torch.onnx exporter with
    # the TF-converted graph's calling convention (NHWC float input +
    # leading Transpose — classify_pil.py:39-96 feeds NHWC /255); falls
    # back to the hand-built graph if torch's exporter shim moved
    try:
        _export_torch_nudenet(os.path.join(root, "nudenet.onnx"))
    except Exception as e:  # noqa: BLE001
        print(f"[parity] torch.onnx export unavailable ({e}); "
              "falling back to the hand-built classifier graph")
        model_bytes, _ = _build_graph_and_torch()
        with open(os.path.join(root, "nudenet.onnx"), "wb") as f:
            f.write(model_bytes)

    bank = os.path.join(root, "bank", "tiny")
    os.makedirs(bank)
    rs = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rs.randint(0, 255, (32, 32, 3),
                                   dtype=np.uint8)).save(
            os.path.join(bank, f"{i}.png"))

    # Q16: tiny CLIP vision tower state dict + 2-prompt pickle
    q16 = os.path.join(root, "q16")
    os.makedirs(q16)
    # 1 attention head: hidden=32 is not a released tower size, so
    # infer_clip_vision_config falls back to max(1, 32//64) = 1 — the
    # fabricated weights must match the config the gate will infer
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=1, intermediate_size=64,
        hidden_act="quick_gelu", projection_dim=16)
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    from safetensors.numpy import save_file
    save_file({k: v.numpy() for k, v in hf.state_dict().items()},
              os.path.join(q16, "clip_vision.safetensors"))
    # (c) prompts.p as the REAL producer writes it: a pickled torch HALF
    # tensor (reference run_nudity.py:183-191 loads `.p` via
    # torch.HalfTensor(pickle.load(...)); the released Q16 file pickles a
    # torch tensor, whose unpickling goes through torch's reduce hooks)
    torch.manual_seed(1)
    with open(os.path.join(q16, "prompts.p"), "wb") as f:
        pickle.dump(torch.randn(2, 16).half(), f)

    with open(os.path.join(root, "reference_results.json"), "w") as f:
        json.dump({"nudity_toxic_ratio": 0.5}, f)
    return root


if __name__ == "__main__":
    main()
