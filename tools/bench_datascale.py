"""Data-size scaling evidence -> BENCH/DATASCALE.md.

Complements BENCH/BASELINE.md's parallelism axis: run bench.py at two
DATA scales (sf0.01 and sf0.1 — 10x rows) at fixed parallelism and
report per-query wall-time ratio vs the 10x row ratio. Near-10x time at
10x rows (ratio ~1 after fixed-cost subtraction is not attempted — the
raw ratio is reported honestly) is the no-superlinear-blowup signal:
no quadratic joins, no accumulating state, no skew collapse as data
grows.

Usage: python tools/bench_datascale.py [lo_dir] [hi_dir] [cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sf_of_strict(sf_dir: str) -> float:
    """Scale factor from the directory name — REQUIRED to parse (the
    row ratio is derived from it; a silent fallback would report a
    bogus 1x ratio and flag noise as superlinear blowup)."""
    base = os.path.basename(sf_dir.rstrip("/"))
    if not base.startswith("sf"):
        raise SystemExit(f"cannot derive scale factor from {sf_dir!r}: "
                         f"directory must be named sf<float>")
    return float(base[2:])


def run(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_BENCH_REPS="2")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    lo = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    hi = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    t0 = time.strftime("%Y-%m-%d %H:%M:%S")
    row_ratio = sf_of_strict(hi) / sf_of_strict(lo)
    a, b = run(lo, cpus), run(hi, cpus)

    lines = [
        "# BENCH/DATASCALE — data-size scaling (fixed parallelism)",
        "",
        f"Generated {t0} by tools/bench_datascale.py: bench.py at "
        f"{lo} vs {hi} ({row_ratio:.0f}x rows), local[{cpus}], best-of-2.",
        "",
        "Time ratio near the row ratio (or below it, where fixed",
        "per-query costs dominate the small scale) is the",
        "no-superlinear-blowup signal: no quadratic join, no",
        "accumulating state, no skew collapse as data grows 10x.",
        "",
        "| query | sec @ small | sec @ big | time ratio | rows ratio | note |",
        "|---|---|---|---|---|---|",
    ]
    worst = 0.0
    noisy = []
    for q in a["queries"]:
        ta, tb = a["queries"][q], b["queries"].get(q)
        if tb is None or ta <= 0:
            continue
        r = tb / ta
        worst = max(worst, r)
        # a ratio far below 1 at 10x rows is physically impossible for a
        # data-proportional query — it means the small-scale measurement
        # was noise-dominated; flag it instead of calling it "sub-linear"
        note = "noise-dominated small-scale sample" if r < 0.7 else ""
        if note:
            noisy.append(q)
        lines.append(f"| {q} | {ta} | {tb} | {r:.2f}x | "
                     f"{row_ratio:.0f}x | {note} |")
    verdict = ("sub-linear to linear across every query."
               if worst <= row_ratio * 1.2 else
               "ABOVE the row ratio — investigate the flagged query.")
    lines += [
        "",
        f"Max time ratio: **{worst:.2f}x** at {row_ratio:.0f}x rows — "
        + verdict,
    ]
    if noisy:
        lines += [
            "",
            f"Queries flagged noise-dominated ({', '.join(noisy)}): their "
            "time DROPPED with 10x data, which only host-load variance "
            "can explain; they support no scaling conclusion either way.",
        ]
    lines.append("")
    path = os.path.join(REPO, "BENCH", "DATASCALE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print("written:", path)
    print("\n".join(lines))


if __name__ == "__main__":
    main()
