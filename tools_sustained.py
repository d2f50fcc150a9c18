"""Sustained benchmark-scale throughput of the REAL runner loop
(VERDICT r3 next #2): `run_nudity.py` end-to-end over N fabricated prompts
at full SD-1.4 scale — including CSV iteration, per-case text encode,
50-step scan, VAE decode, PNG save, and the NudeNet gate — the reference's
actual per-image wall-clock region (run_nudity.py:414-464 + 439-504).

Five numbers, one JSON line:
  * sustained    — overlapped loop (SDT_RUNNER_DEPTH=2, grouped gate), warm
  * serial       — SDT_RUNNER_DEPTH=1 (the reference's serial order), warm
  * device_bound — back-to-back dispatch of the same per-case programs with
                   no host work between fetches (the ceiling at batch 1)
  * served_b1    — the SERVING path under load (DynamicBatcher two-phase +
                   HTTP front-end, 4 concurrent clients, batch 1): the
                   deployment stack's steady-state vs the same batch-1
                   device bound (SDT_SUSTAINED_SERVED=0 skips)
  * served_b4    — same with the production batch-4 grouping (should beat
                   the batch-1 bound: batching amortizes per-step overhead)

Acceptance: sustained within ~5% of device_bound — i.e. the 1-vCPU host
(PNG encode + numpy ONNX interpreter) is fully hidden behind the chip —
and served_b1 within ~10% of it (adds base64+PNG per response).

Usage: python tools_sustained.py  [N]      (default SDT_SUSTAINED_N=50)
Needs the real TPU; writes ~4 GB of fabricated checkpoint to a temp dir.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fixtures(root: str, n: int):
    import subprocess

    from PIL import Image

    from tests.test_nudenet_graph import _build_graph_and_torch

    ckpt = os.path.join(root, "ckpt")
    print("[sustained] fabricating full-size checkpoint (~4 GB)...",
          flush=True)
    # in a CPU-forced SUBPROCESS: the drill helper pins its tree fills to a
    # cpu device, and under the axon TPU plugin this process has no cpu
    # backend registered (RuntimeError: Unknown backend cpu)
    subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, sys.argv[2]); "
         "from tests.test_real_scale_drill import _write_full_checkpoint; "
         "_write_full_checkpoint(sys.argv[1])",
         ckpt, os.path.dirname(os.path.abspath(__file__))],
        env=dict(os.environ, JAX_PLATFORMS="cpu"), check=True)

    bank = os.path.join(root, "bank", "tiny")
    os.makedirs(bank, exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rs.randint(0, 255, (512, 512, 3),
                                   dtype=np.uint8)).save(
            os.path.join(bank, f"{i}.png"))
    task_yaml = os.path.join(root, "task.yaml")
    with open(task_yaml, "w") as f:
        f.write(f"""
repellency:
  method: kernel_fast
  n_embed: 2
  params:
    sigma: 3.15
    scale: 0.33
    beta_threshold: 7.0
data:
  name: artists
  root: {os.path.join(root, 'bank')}
  class_info: tiny
  size: 512
mean_processor: null
""")
    onnx_path = os.path.join(root, "nudenet.onnx")
    model_bytes, _ = _build_graph_and_torch()
    with open(onnx_path, "wb") as f:
        f.write(model_bytes)

    csv = os.path.join(root, "prompts.csv")
    with open(csv, "w") as f:
        f.write("case_number,prompt,evaluation_seed,categories\n")
        for i in range(n):
            f.write(f"{i},a photograph case {i},{i + 7},sexual\n")
    return ckpt, task_yaml, onnx_path, csv


def _run(ckpt, task_yaml, onnx_path, csv, save_dir, depth, group):
    from safe_denoiser_tpu.runners.nudity import main
    os.environ["SDT_RUNNER_DEPTH"] = str(depth)
    os.environ["SDT_EVAL_GROUP"] = str(group)
    t0 = time.perf_counter()
    main(["--data", csv, "--save-dir", save_dir,
          "--erase_id", "std_rep", "--model_dir", ckpt,
          "--task_config", task_yaml,
          "--category", "nudity", "--nudenet-path", onnx_path,
          "--num_inference_steps", "50", "--image_length", "512"])
    return time.perf_counter() - t0


def _steady_rate(save_dir: str, skip: int = 3):
    """Steady-state img/s from the run's OWN per-case log timestamps
    (Wall-Clock lines, last session in logs.txt, first ``skip`` cases
    dropped as warmup).

    This replaced the small-vs-full marginal-difference estimator: the
    marginal cancels fixed costs only if the ~4 GB from_pretrained load
    costs the SAME in both runs, and measured tunnel load times vary by
    MINUTES between invocations (two marginal records on 2026-08-21 swung
    0.04-0.82 img/s while the in-run timestamp rate of the same runs was
    stable at 1.025/1.025). Timestamps inside one process see none of
    that."""
    import datetime
    import re

    ts = []
    for line in open(os.path.join(save_dir, "logs.txt")):
        if "All configurations provided" in line:
            ts = []                     # keep only the LAST session
        m = re.match(r"(\d{4}-\d{2}-\d{2} [\d:,]+) - INFO - Wall-Clock "
                     r"Time for image generation", line)
        if m:
            ts.append(datetime.datetime.strptime(
                m.group(1), "%Y-%m-%d %H:%M:%S,%f"))
    if len(ts) <= skip + 1:
        return None
    return (len(ts) - skip - 1) / (ts[-1] - ts[skip]).total_seconds()


def _build_pipe_and_proc(ckpt, task_yaml):
    """One shared full-scale pipeline + repellency processor (the ~4 GB
    from_pretrained load takes minutes on this 1-vCPU host — the
    device-bound and served probes must not pay it twice)."""
    from safe_denoiser_tpu.pipeline.diffusion import (
        ERASE_SPECS, SafeDiffusionPipeline)
    from safe_denoiser_tpu.runners.common import build_repellency
    from safe_denoiser_tpu.utils.logging import Logger

    class _A:  # the few arg fields build_repellency reads
        task_config = task_yaml
        image_length = 512
        erase_id = "std_rep"
        shard_bank = False
        num_inference_steps = 50

    pipe = SafeDiffusionPipeline.from_pretrained(ckpt)
    logger = Logger(os.path.join(os.path.dirname(task_yaml),
                                 "bound_logs.txt"))
    proc, _ = build_repellency(_A, pipe, logger)
    return pipe, proc, ERASE_SPECS["std_rep"], logger


def _device_bound(pipe, proc, spec, n: int) -> float:
    """Back-to-back dispatch of the identical per-case device programs,
    fetching with one-deep overlap and doing NO host work: the batch-1
    ceiling the runner loop is judged against."""
    # warmup (compile hit from the runner runs)
    pipe.dispatch("warm", num_inference_steps=50, seed=0,
                  repellency_processor=proc, erase_spec=spec).fetch()
    t0 = time.perf_counter()
    pending = None
    for i in range(n):
        p = pipe.dispatch(f"a photograph case {i}", num_inference_steps=50,
                          seed=i + 7, repellency_processor=proc,
                          erase_spec=spec)
        if pending is not None:
            pending.fetch()
        pending = p
    pending.fetch()
    return time.perf_counter() - t0


def _served(pipe, proc, spec, logger, task_yaml, n: int,
            batch_size: int = 1, concurrency: int = 4) -> float:
    """Steady-state throughput through the SERVING path (VERDICT r4 #5):
    DynamicBatcher two-phase pipelining + the stdlib HTTP front-end, driven
    by ``concurrency`` real HTTP clients keeping the queue non-empty —
    the load the two-phase batcher claim (serving/batcher.py) is about.
    batch_size=1 makes the number directly comparable to the batch-1
    device bound; the host tax here is base64+PNG encode per image plus
    the batcher/HTTP hop."""
    import base64  # noqa: F401 — responses carry base64 PNGs
    import http.client
    import threading

    from safe_denoiser_tpu.runners.serve import build_generate_fn
    from safe_denoiser_tpu.serving import (DynamicBatcher, GenRequest,
                                           make_server)

    class _Args:
        num_inference_steps = 50
        negative_prompt = None
        negative_prompt_space = None
        image_length = 512
        batch_size = 1
        safe_level = "STRONG"
        erase_id = "std_rep"
        task_config = task_yaml
        mesh = None

    _Args.batch_size = batch_size
    run_batch = build_generate_fn(_Args, pipe, proc, spec, logger)
    batcher = DynamicBatcher(run_batch, batch_size, max_delay_s=0.05,
                             dispatch_batch=run_batch.dispatch_batch)
    server = make_server(batcher, port=0, logger=logger)
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    port = server.server_address[1]

    def _post(seed):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        body = json.dumps({"prompt": f"a photograph case {seed}",
                           "seed": int(seed), "guidance_scale": 7.5})
        conn.request("POST", "/generate", body,
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        data = r.read()
        conn.close()
        assert r.status == 200, data[:200]

    try:
        _post(0)                                   # warmup (compile)
        t0 = time.perf_counter()
        it = iter(range(n))
        lock = threading.Lock()

        def _worker():
            while True:
                with lock:
                    seed = next(it, None)
                if seed is None:
                    return
                _post(seed + 7)

        threads = [threading.Thread(target=_worker)
                   for _ in range(concurrency)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
    finally:
        server.shutdown()
        batcher.close()
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("SDT_SUSTAINED_N", "50"))
    n_small = max(2, n // 5)
    # SDT_SUSTAINED_ROOT: reuse a previous run's fabricated tree (the
    # ~4 GB checkpoint takes minutes to write; tunnel wedges can kill a
    # run after fabrication)
    root = os.environ.get("SDT_SUSTAINED_ROOT")
    reuse = False
    if root:
        ckpt = os.path.join(root, "ckpt")
        task_yaml = os.path.join(root, "task.yaml")
        onnx_path = os.path.join(root, "nudenet.onnx")
        csv = os.path.join(root, "prompts.csv")
        # reuse only a COMPLETE fixture tree whose CSV matches this N
        # (a mid-fabrication kill leaves a partial ckpt)
        reuse = all(os.path.exists(p) for p in
                    (task_yaml, onnx_path, csv,
                     os.path.join(ckpt, "unet"))) and             sum(1 for _ in open(csv)) - 1 == n_small + n
        if root and not reuse and os.path.isdir(root):
            print(f"[sustained] NOT reusing {root}: incomplete or "
                  f"row-count mismatch vs N={n}", flush=True)
    if reuse:
        print(f"[sustained] reusing fixtures under {root}", flush=True)
    else:
        root = tempfile.mkdtemp(prefix="sustained_")
        ckpt, task_yaml, onnx_path, csv = _fixtures(root, n_small + n)

    # small prefix CSV: the cheap warm pass that pays the compiles before
    # the measured runs (the measurement itself is in-run log timestamps —
    # see _steady_rate)
    small_csv = os.path.join(root, "small.csv")
    with open(csv) as f:
        lines = f.readlines()
    with open(small_csv, "w") as f:
        f.writelines(lines[:1 + n_small])

    # warm pass (compiles) — discard
    _run(ckpt, task_yaml, onnx_path, small_csv,
         os.path.join(root, "warm"), depth=2, group=4)

    rates = {}
    for name, depth, group in (("overlap", 2, 4), ("serial", 1, 1)):
        _run(ckpt, task_yaml, onnx_path, csv,
             os.path.join(root, f"{name}_full"), depth, group)
        rates[name] = _steady_rate(os.path.join(root, f"{name}_full"))
    pipe, proc, spec, logger = _build_pipe_and_proc(ckpt, task_yaml)
    dt_dev = _device_bound(pipe, proc, spec, n)

    line = {
        "metric": "sd14_sustained_runner_throughput",
        "value": round(rates["overlap"], 4),
        "unit": "images/sec/chip",
        "n_cases": n,
        "method": "in-run log timestamps, 3-case warmup skip",
        "serial": round(rates["serial"], 4),
        "device_bound": round(n / dt_dev, 4),
        "overlap_vs_device_bound": round(rates["overlap"] / (n / dt_dev), 4),
    }

    # served mode (VERDICT r4 #5): the same scale through the
    # batcher+HTTP deployment path, batch 1 for apples-to-apples with the
    # batch-1 device bound, plus the production batch-4 grouping
    # (SDT_SUSTAINED_SERVED=0 skips)
    if os.environ.get("SDT_SUSTAINED_SERVED", "1") == "1":
        dt_served = _served(pipe, proc, spec, logger, task_yaml, n,
                            batch_size=1)
        line["served_b1"] = round(n / dt_served, 4)
        line["served_b1_vs_device_bound"] = round(
            (n / dt_served) / (n / dt_dev), 4)
        dt_served4 = _served(pipe, proc, spec, logger, task_yaml, n,
                             batch_size=4, concurrency=8)
        line["served_b4"] = round(n / dt_served4, 4)

    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
