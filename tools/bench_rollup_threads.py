"""Thread-axis (N vs 4N cores) scaling for the geo-curation rollup
family -> appends a section to BENCH/BASELINE.md.

One JVM at a time (sequential levels), so the sandbox's concurrent-JVM
quota does not distort the measurement; the CPU spin ceiling at
measurement time is recorded alongside. Order-insensitive output
checksums must match across levels (the determinism half of the
north rule's scaling criterion).

Usage: python tools/bench_rollup_threads.py [lo_cores] [hi_cores] [n_traj]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_traj = int(sys.argv[3]) if len(sys.argv) > 3 else 4800

    from barefoot_spark.operators import tiles as T
    from barefoot_spark.session import build_session
    from barefoot_spark.sources import images as IM

    pdf = IM.synth_geo_frames_pdf(n_traj, 32)

    # the pyramid runs LAST: each invocation creates per-level
    # localCheckpoint blocks that linger until GC and would pollute
    # the later ops' timings (measured: cap_sample 1.9s flat after
    # pyramid runs vs 1.2s in a clean session)
    ops = {
        "tile_image_rollup": lambda df: T.tile_image_rollup(
            df, res=8, salt_n=16),
        "tile_cap_sample": lambda df: T.tile_cap_sample(
            df, res=8, cap=32, salt_n=16),
        "tile_pyramid": lambda df: T.tile_rollup_pyramid(
            df, fine_res=8, coarse_levels=(6, 4), salt_n=16),
    }

    def checksum(out):
        row = (out.select(F.xxhash64(*out.columns).alias("h"))
               .agg(F.expr("bit_xor(h)").alias("s")).collect()[0])
        return int(row["s"] or 0)

    def level(cores):
        spark = build_session(app=f"rollup-threads-{cores}",
                              master=f"local[{cores}]",
                              shuffle_partitions=cores)
        spark.sparkContext.setLogLevel("ERROR")
        df = (spark.createDataFrame(pdf).repartition(cores)
              .localCheckpoint(eager=True))
        secs, cks = {}, {}
        for name, op in ops.items():
            op(df).count()                      # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                op(df).count()
                best = min(best, time.time() - t0)
            secs[name] = best
            cks[name] = checksum(op(df))
        spark.stop()
        return secs, cks

    a, ck_a = level(lo)
    b, ck_b = level(hi)
    lines = ["", f"## Rollup family thread-axis scaling "
             f"(local[{lo}] -> local[{hi}], {len(pdf)} frames, "
             f"sequential JVMs, best-of-2)", "",
             f"| op | local[{lo}] sec | local[{hi}] sec | speedup | "
             f"efficiency | checksums match |", "|---|---|---|---|---|---|"]
    worst = 1e9
    for name in ops:
        sp = a[name] / b[name]
        eff = sp / (hi / lo)
        worst = min(worst, eff)
        lines.append(f"| {name} | {a[name]:.3f} | {b[name]:.3f} | "
                     f"{sp:.2f}x | {eff:.2f} | "
                     f"{'YES' if ck_a[name] == ck_b[name] else 'NO'} |")
    lines += ["", f"min efficiency **{worst:.2f}** "
              f"(target >= 0.8 / ({hi}/{lo})-way).", ""]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
