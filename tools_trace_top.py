"""Ad-hoc: list the top-N individual device ops (full op/fusion names, not
categories) in a saved jax.profiler trace — for attributing costs the
category view lumps together (e.g. the VAE decode 'copy' bucket).

Usage: python tools_trace_top.py /tmp/trace_dir [N]
"""

from __future__ import annotations

import collections
import sys

from tools_trace_cat import load_events


def main():
    trace_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    per_name = collections.Counter()
    count = collections.Counter()
    for e in load_events(trace_dir):
        if e["name"].startswith(("jit_", "while", "jit(")):
            continue
        per_name[e["name"]] += e["dur"]
        count[e["name"]] += 1
    total = sum(per_name.values())
    print(f"total categorized device time: {total / 1e3:.2f} ms")
    for name, dur in per_name.most_common(n):
        print(f"{dur / 1e3:9.3f} ms  x{count[name]:<4d} {name[:120]}")


if __name__ == "__main__":
    main()
