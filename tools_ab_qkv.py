"""Same-session A/B: separate q/k/v projection dots (control) vs the fused
SDT_FUSED_QKV=1 packing (one [C,3*inner] self-attn dot, [C_kv,2*inner]
cross k/v dot — amortizes MXU output-lane padding, models/layers.py), on
the 50-step headline config. ABA ordering brackets compile-service drift
in ONE process (VERDICT r2 methodology)."""

import os

import bench


def run(tag):
    v = bench.bench_sd14()
    print(f"{tag}: {v:.4f} img/s", flush=True)
    return v


def main():
    os.environ["SDT_FUSED_QKV"] = "0"
    a1 = run("control(split) #1")
    os.environ["SDT_FUSED_QKV"] = "1"
    b = run("fused qkv        ")
    os.environ["SDT_FUSED_QKV"] = "0"
    a2 = run("control(split) #2")
    ctl = max(a1, a2)
    print(f"controls: {a1:.4f} / {a2:.4f}  (drift {a2 / a1 - 1:+.2%})")
    print(f"delta vs best control: {b / ctl - 1:+.2%}")


if __name__ == "__main__":
    main()
