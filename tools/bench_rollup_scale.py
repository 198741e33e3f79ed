"""Data-size scaling probe for the geo-curation rollup family ->
appends a section to BENCH/DATASCALE.md.

The rollup/pyramid/cap-sample operators run on the synthesized
geotagged frame table (not the sf parquet dirs), so bench_datascale.py
does not cover them; this probe times them at 10x rows (fixed
parallelism, best-of-2, planted hot cell at BOTH scales so the skew
path is the thing being scaled).

Usage: python tools/bench_rollup_scale.py [lo_traj] [hi_traj]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from barefoot_spark.operators import tiles as T
from barefoot_spark.session import build_session
from barefoot_spark.sources import images as IM


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 4800
    frames_per = 32

    # pyramid last: its per-level localCheckpoint blocks linger until
    # GC and pollute later ops' timings (see bench_rollup_threads.py)
    ops = {
        "tile_image_rollup": lambda df: T.tile_image_rollup(
            df, res=8, salt_n=16),
        "tile_cap_sample": lambda df: T.tile_cap_sample(
            df, res=8, cap=32, salt_n=16),
        "tile_pyramid": lambda df: T.tile_rollup_pyramid(
            df, fine_res=8, coarse_levels=(6, 4), salt_n=16),
    }

    master = None

    def level(n_traj):
        # a FRESH session per level: the small level's checkpoint
        # blocks and executed jobs must not pollute the big level's
        # timings (this exact effect once produced a nonsense 0.54x
        # "speedup" at 10x rows)
        nonlocal master
        spark = build_session(app=f"rollup-scale-{n_traj}")
        spark.sparkContext.setLogLevel("ERROR")
        master = spark.sparkContext.master
        pdf = IM.synth_geo_frames_pdf(n_traj, frames_per)
        df = spark.createDataFrame(pdf).repartition(32)
        df = df.localCheckpoint(eager=True)     # exclude synth/ship cost
        out = {}
        for name, op in ops.items():
            op(df).count()                      # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                op(df).count()
                best = min(best, time.time() - t0)
            out[name] = best
        spark.stop()
        return out, len(pdf)

    a, n_a = level(lo)
    b, n_b = level(hi)
    lines = ["", f"## Rollup family data-size scaling "
             f"({n_a} -> {n_b} frames, {n_b / n_a:.0f}x rows, "
             f"{master}, fresh session per level, best-of-2, "
             f"hot cell planted at both scales)",
             "", "| op | sec @ small | sec @ big | time ratio |",
             "|---|---|---|---|"]
    worst = 0.0
    for name in ops:
        ratio = b[name] / a[name]
        worst = max(worst, ratio)
        lines.append(f"| {name} | {a[name]:.3f} | {b[name]:.3f} | "
                     f"{ratio:.2f}x |")
    lines += ["", f"Max time ratio **{worst:.2f}x** at "
              f"{n_b / n_a:.0f}x rows.", ""]
    with open(os.path.join(REPO, "BENCH", "DATASCALE.md"), "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
