"""Viterbi-stage-only scaling probe: fixed num_partitions across levels.
Usage: python BENCH/_vit_probe.py <cpus> <num_partitions>"""
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

cpus = int(sys.argv[1])
nparts = int(sys.argv[2])
spark = build_session(app=f"vit-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8),
                      extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch":
                                  "1048576"})
spark.sparkContext.setLogLevel("ERROR")
idx = RoadIndex(roads.grid_pdf(24, seed=42), res=16)
idx_bc = spark.sparkContext.broadcast(idx)
geotags = SS.synth_traces(idx, n_traces=1000, samples_per_trace=60, seed=42)
samples_df = spark.createDataFrame(geotags).cache()
n = samples_df.count()
matched = M.match_traces(samples_df, idx_bc, num_partitions=nparts)


def run():
    row = matched.select(
        "trace_id", "seq", "edge_id", F.round("fraction", 9).alias("fr")) \
        .select(F.xxhash64("trace_id", "seq", "edge_id", "fr").alias("h")) \
        .agg(F.expr("bit_xor(h)").alias("c"), F.count("*").alias("n")) \
        .collect()[0]
    return str(row["c"]), int(row["n"])


best, cs = None, None
for _ in range(3):
    t0 = time.time()
    cs = run()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print({"cpus": cpus, "nparts": nparts, "sec": round(best, 3),
       "rows_per_sec": round(n / best), "checksum": cs})
spark.stop()
