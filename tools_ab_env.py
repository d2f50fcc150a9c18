"""Generic same-session ABA harness: measure the 50-step headline with an
env switch off/on/off in ONE process (compile-service drift brackets, the
VERDICT r2 methodology). Usage:

    python tools_ab_env.py SDT_PALLAS_UPCONV [off_val on_val] [leg]

off/on default to 0/1; leg selects the bench function (sd14 default, sd3,
sd14_10, ...) by bench_<leg> name. Retraces happen because bench_sd14 builds a fresh
jit per call (same mechanism as tools_ab_cond.py / tools_ab_qkv.py)."""

import os
import sys

import bench


def run(tag, fn):
    v = fn()
    print(f"{tag}: {v:.4f} img/s", flush=True)
    return v


def main(argv):
    var = argv[0]
    off, on = (argv[1], argv[2]) if len(argv) > 2 else ("0", "1")
    leg = argv[3] if len(argv) > 3 else "sd14"
    fn = getattr(bench, f"bench_{leg}")
    os.environ[var] = off
    a1 = run(f"{var}={off} #1", fn)
    os.environ[var] = on
    b = run(f"{var}={on}    ", fn)
    os.environ[var] = off
    a2 = run(f"{var}={off} #2", fn)
    ctl = max(a1, a2)
    print(f"controls: {a1:.4f} / {a2:.4f}  (drift {a2 / a1 - 1:+.2%})")
    print(f"delta vs best control: {b / ctl - 1:+.2%}")


if __name__ == "__main__":
    main(sys.argv[1:])
