"""Same-session A/B: bf16 UNet (control) vs SDT_INT8=1 W8A8 wide-block
quantization (ops/quant.py::quantize_unet_params — level-2/mid C=1280
transformer dots only; the probe says l0 LOSES 0.66-0.77x, l2 WINS
1.33-1.70x), on the 50-step headline config. ABA ordering brackets
compile-service drift in ONE process (VERDICT r2 methodology)."""

import os

import bench


def run(tag):
    v = bench.bench_sd14()
    print(f"{tag}: {v:.4f} img/s", flush=True)
    return v


def main():
    os.environ.pop("SDT_INT8", None)
    a1 = run("control(bf16) #1")
    os.environ["SDT_INT8"] = "1"
    b = run("int8 wide-block ")
    os.environ.pop("SDT_INT8", None)
    a2 = run("control(bf16) #2")
    ctl = max(a1, a2)
    print(f"controls: {a1:.4f} / {a2:.4f}  (drift {a2 / a1 - 1:+.2%})")
    print(f"delta vs best control: {b / ctl - 1:+.2%}")


if __name__ == "__main__":
    main()
