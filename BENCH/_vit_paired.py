"""Same-JVM paired viterbi scaling probe: run local[lo] and local[hi]
SparkContexts sequentially in ONE python process (shared JVM, shared
JIT state) so the cross-process JVM-path drift cancels in the ratio.
Usage: python BENCH/_vit_paired.py [lo] [hi] [nparts]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from barefoot_spark import roads
from barefoot_spark.index import RoadIndex
from barefoot_spark.operators import match as M
from barefoot_spark.session import build_session
from barefoot_spark.sources import samples as SS

lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
nparts = int(sys.argv[3]) if len(sys.argv) > 3 else 16

idx0 = RoadIndex(roads.grid_pdf(24, seed=42), res=16)
geotags = SS.synth_traces(idx0, n_traces=1000, samples_per_trace=60, seed=42)


def measure(cpus, reps=3):
    spark = build_session(app=f"vitp-{cpus}", master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus, 8),
                          extra_conf={
                              "spark.sql.execution.arrow.maxRecordsPerBatch":
                              "1048576"})
    spark.sparkContext.setLogLevel("ERROR")
    idx_bc = spark.sparkContext.broadcast(idx0)
    samples_df = spark.createDataFrame(geotags).cache()
    n = samples_df.count()
    matched = M.match_traces(samples_df, idx_bc, num_partitions=nparts)
    q = matched.select(
        "trace_id", "seq", "edge_id", F.round("fraction", 9).alias("fr")) \
        .select(F.xxhash64("trace_id", "seq", "edge_id", "fr").alias("h"))
    best = None
    for _ in range(reps):
        t0 = time.time()
        q.agg(F.expr("bit_xor(h)"), F.count("*")).collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return best, n


# interleave lo/hi twice (ABBA) so residual JIT warm-up trends cancel
a1, n = measure(lo)
b1, _ = measure(hi)
b2, _ = measure(hi)
a2, _ = measure(lo)
ta, tb = min(a1, a2), min(b1, b2)
eff = (ta / tb) / (hi / lo)
print({"lo": lo, "hi": hi, "nparts": nparts,
       "lo_sec": [round(a1, 3), round(a2, 3)],
       "hi_sec": [round(b1, 3), round(b2, 3)],
       "speedup": round(ta / tb, 2), "efficiency": round(eff, 2)})
