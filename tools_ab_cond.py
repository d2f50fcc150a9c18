"""Same-session A/B: jnp.where-masked repellency window (control) vs the
lax.cond-gated hook, on the 50-step headline config at both BASELINE bank
sizes. Four traces in ONE process so compile-service drift cannot pollute
the comparison (VERDICT r2 methodology)."""

import os

import bench


def run(tag):
    v = bench.bench_sd14()
    print(f"{tag}: {v:.4f} img/s", flush=True)
    return v


def main():
    os.environ["SDT_WINDOW_COND"] = "0"
    c515 = run("control(where) M=515 ")
    os.environ["SDT_WINDOW_COND"] = "1"
    t515 = run("cond          M=515 ")
    bench.BANK_M = 3000
    os.environ["SDT_WINDOW_COND"] = "0"
    c3k = run("control(where) M=3000")
    os.environ["SDT_WINDOW_COND"] = "1"
    t3k = run("cond          M=3000")
    print(f"delta M=515 : {t515 / c515 - 1:+.2%}")
    print(f"delta M=3000: {t3k / c3k - 1:+.2%}")


if __name__ == "__main__":
    main()
