
import json, os, sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
from pyspark.sql import functions as F
from barefoot_spark import roads
from barefoot_spark.index import RoadIndex
from barefoot_spark.operators import joins as J, match as M, tiles as T
from barefoot_spark.sources import samples as SS
from barefoot_spark.session import build_session

slices = json.loads(sys.argv[1])     # slice ids this executor owns
cores = int(sys.argv[2])
out_path = sys.argv[3]
barrier_dir = sys.argv[4]

spark = build_session(app="exec-bench", master=f"local[{cores}]",
                      shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
grid_n = 24
idx = RoadIndex(roads.grid_pdf(grid_n, seed=42), res=16)
idx_bc = spark.sparkContext.broadcast(idx)
lat_lo, lat_hi = 48.0, 48.0 + grid_n * 0.005
lon_lo, lon_hi = 11.0, 11.0 + grid_n * 0.005

N_PROBE_TOTAL = 16_000_000
N_TILE_TOTAL = 160_000_000
N_TRACES_TOTAL = 480

def synth_points(total, slice_ids):
    per = total // 16
    dfs = [spark.range(s * per, (s + 1) * per, 1, max(cores, 2))
           for s in slice_ids]
    df = dfs[0]
    for d in dfs[1:]:
        df = df.union(d)
    return (df
            .withColumn("lat", F.lit(lat_lo) + (F.col("id") % 9973) / 9973.0
                        * F.lit(lat_hi - lat_lo))
            .withColumn("lon", F.lit(lon_lo) + ((F.col("id") * 7919) % 9973) / 9973.0
                        * F.lit(lon_hi - lon_lo))
            .withColumnRenamed("id", "point_id"))

def checksum(df, cols):
    # bit_xor aggregate: order-insensitive and overflow-free (Spark 4
    # runs ANSI mode by default, where sum() of hashes can overflow)
    row = df.select(F.xxhash64(*cols).alias("h")) \
        .agg(F.expr("bit_xor(h)").alias("s")).collect()[0]
    return int(row["s"] or 0)

# warm-up
J.radius_join(synth_points(1_600_000, slices[:1]), idx_bc, 100.0) \
    .agg(F.count("*")).collect()
geo_all = SS.synth_traces(idx, n_traces=N_TRACES_TOTAL, samples_per_trace=60, seed=42)
mine = geo_all[geo_all["trace_id"].apply(
    lambda t: int(t.split("-")[1]) % 16 in set(slices))]
sdf = spark.createDataFrame(mine).repartition(cores, "trace_id").cache()
n_samples = sdf.count()
M.match_traces(sdf.limit(240), idx_bc).agg(F.count("*")).collect()

res = {"slices": slices, "stages": {}, "checksums": {}}

# barrier: setup/warm-up (index build, trace synthesis, JVM warm) is
# heavy and staggered across workers; timed stages must not overlap
# another worker's setup. Signal ready, wait for the parent's go file.
with open(os.path.join(barrier_dir, f"ready_{slices[0]}"), "w") as f:
    f.write("1")
while not os.path.exists(os.path.join(barrier_dir, "go")):
    time.sleep(0.05)

t0 = time.time()
rj = J.radius_join(synth_points(N_PROBE_TOTAL, slices), idx_bc, 100.0)
cs = checksum(rj, ["point_id", "edge_id", F.round("fraction", 9).cast("string"),
                   F.round("distance", 6).cast("string")])
dt = time.time() - t0
res["stages"]["radius_join"] = {"rows": N_PROBE_TOTAL // 16 * len(slices),
                                "sec": round(dt, 3)}
res["checksums"]["radius_join"] = cs

t0 = time.time()
vm = M.match_traces(sdf, idx_bc)
cs = checksum(vm, ["trace_id", "seq", "edge_id", F.round("fraction", 9).cast("string")])
dt = time.time() - t0
res["stages"]["viterbi_match"] = {"rows": n_samples, "sec": round(dt, 3)}
res["checksums"]["viterbi_match"] = cs

t0 = time.time()
ta = T.assign_tiles(synth_points(N_TILE_TOTAL, slices), res=15, parent_res=7)
row = ta.agg(F.expr("bit_xor(xxhash64(point_id, cell, cell_p7))").alias("s"),
             F.count("*").alias("n")).collect()[0]
dt = time.time() - t0
res["stages"]["tile_assign"] = {"rows": int(row["n"]), "sec": round(dt, 3)}
res["checksums"]["tile_assign"] = int(row["s"])

with open(out_path, "w") as f:
    json.dump(res, f)
spark.stop()
