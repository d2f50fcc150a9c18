"""Run-log parsing → per-case score CSV (reference mics/parse_score.py).

The load-bearing log lines (SURVEY.md §5) are:
  "Seed: S, Iter: I, Case#: C: target prompt: P"
  "Optimized image is unsafe: B, toxicity pred: F"
  "Wall-Clock Time for image generation (Case#: C): T seconds"
  "---------- Repellency applied at timestep T ----------"
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class CaseRecord:
    case_number: str = ""
    seed: int | None = None
    prompt: str = ""
    unsafe: bool | None = None
    pred: float | None = None
    wall_clock_s: float | None = None
    repellency_timesteps: list[float] = field(default_factory=list)


_CASE = re.compile(r"Seed: (\d+), Iter: \S+, Case#: (\S+): target prompt: (.*)")
_PRED = re.compile(r"Optimized image is unsafe: (\w+), toxicity pred: ([\d.eE+-]+)")
_TIME = re.compile(r"Wall-Clock Time for image generation \(Case#: (\S+)\): ([\d.]+) seconds")
_REP = re.compile(r"Repellency applied at timestep ([\d.]+)")


def parse_log(text: str) -> list[CaseRecord]:
    records: list[CaseRecord] = []
    current: CaseRecord | None = None
    for line in text.splitlines():
        m = _CASE.search(line)
        if m:
            current = CaseRecord(case_number=m.group(2), seed=int(m.group(1)),
                                 prompt=m.group(3))
            records.append(current)
            continue
        if current is None:
            continue
        m = _REP.search(line)
        if m:
            current.repellency_timesteps.append(float(m.group(1)))
            continue
        m = _PRED.search(line)
        if m:
            current.unsafe = m.group(1) == "True"
            current.pred = float(m.group(2))
            continue
        m = _TIME.search(line)
        if m:
            current.wall_clock_s = float(m.group(2))
    return records


def parse_log_file_to_csv(log_path: str, csv_path: str) -> int:
    import csv

    records = parse_log(open(log_path).read())
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["case_number", "seed", "prompt", "unsafe", "pred",
                    "wall_clock_s", "n_repellency_steps"])
        for r in records:
            w.writerow([r.case_number, r.seed, r.prompt, r.unsafe, r.pred,
                        r.wall_clock_s, len(r.repellency_timesteps)])
    return len(records)
