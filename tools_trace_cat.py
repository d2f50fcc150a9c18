"""Ad-hoc: aggregate a saved jax.profiler trace by op CATEGORY (name with the
trailing .NNN id and any parenthesized payload stripped), printing per-step
milliseconds for a 50-step scan. Skips the enclosing jit_/while wrappers so
the categories sum to device time spent in real ops.

Usage: python tools_trace_cat.py /tmp/trace_dir [steps]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir: str):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")), key=os.path.getmtime)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU:0" in str(e.get("args", {}).get("name", ""))}
    return [e for e in events
            if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e]


def categorize(trace_dir: str, steps: int = 50):
    per_cat = collections.Counter()
    total = 0.0
    for e in load_events(trace_dir):
        name = e["name"]
        if name.startswith(("jit_", "while", "jit(")):
            continue  # enclosing wrappers double-count their children
        cat = re.sub(r"[.\d]+$", "", re.sub(r"\(.*\)", "", name))
        per_cat[cat] += e["dur"]
        total += e["dur"]
    return per_cat, total


def main():
    trace_dir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    per_cat, total = categorize(trace_dir, steps)
    print(f"total categorized device time: {total/1e3:.2f} ms "
          f"({total/1e3/steps:.2f} ms/step over {steps} steps)")
    print(f"{'ms/step':>9}  {'%':>5}  category")
    for cat, dur in per_cat.most_common(25):
        print(f"{dur/1e3/steps:>9.3f}  {100*dur/total:>5.1f}  {cat}")


if __name__ == "__main__":
    main()
