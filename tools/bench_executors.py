"""Executor-process scaling benchmark — the closest sandbox proxy to
the north rule's "N vs 4N executors" criterion.

A Spark executor is an independent JVM with its own Arrow pipelines and
python workers; the single-JVM local[N] proxy underestimates scaling
because all N threads share one JVM's Arrow exchange path (measured
constant ~3M rows/s at any local[N] — see BENCH/BASELINE.md). Here each
"executor" is a separate process running local[cores_per_exec], working
a disjoint, deterministic slice of the same global input; aggregate
throughput = total rows / wall-clock across all processes.

The global input is fixed (16 slices) regardless of executor count, so
low- and high-parallelism runs process identical data; per-stage
order-insensitive checksums are XOR-aggregated across slices and must
match between runs.

Usage: python tools/bench_executors.py [lo_exec] [hi_exec] [cores_per_exec]
Writes BENCH/EXECUTORS.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SLICES = 16

PIPE_PROBE = """
import sys, time
sys.path.insert(0, %r)
from pyspark.sql import functions as F
from barefoot_spark.session import build_session
spark = build_session(app="p", master="local[1]", shuffle_partitions=1)
spark.sparkContext.setLogLevel("ERROR")
n = 8_000_000
pts = (spark.range(0, n, 1, 2)
       .withColumn("lat", (F.col("id") %% 9973)/9973.0)
       .withColumn("lon", ((F.col("id")*7919) %% 9973)/9973.0))
def passthrough(batches):
    for rb in batches: yield rb
pts.limit(100_000).mapInArrow(passthrough, pts.schema).agg(F.count("*")).collect()
t0=time.time(); pts.mapInArrow(passthrough, pts.schema).agg(F.count("*")).collect()
print(n/(time.time()-t0))
spark.stop()
""" % (REPO,)


def pipe_ceiling(lo: int, hi: int) -> dict:
    """The host's Arrow-exchange capacity ratio: aggregate throughput of
    K concurrent single-core passthrough pipes at K=lo vs K=hi. Any
    python-kernel stage is bounded by this — concurrent JVM+socket
    workloads on this (shared/virtualized) host degrade well below the
    pure-CPU spin ceiling, so raw stage efficiencies must be read
    against it."""
    path = os.path.join(REPO, "BENCH", "_pipe_probe.py")
    with open(path, "w") as f:
        f.write(PIPE_PROBE)

    def agg(k):
        best = 0.0
        for _ in range(2):     # best-of-2: the shared host is noisy
            ps = [subprocess.Popen([sys.executable, path], stdout=subprocess.PIPE,
                                   stderr=subprocess.DEVNULL) for _ in range(k)]
            best = max(best, sum(float(p.communicate()[0]) for p in ps))
        return best

    a, b = agg(lo), agg(hi)
    return {"lo_agg": round(a), "hi_agg": round(b),
            "ceiling": (b / a) / (hi / lo)}

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
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
    per = total // %(slices)d
    dfs = [spark.range(s * per, (s + 1) * per, 1, max(cores, 2))
           for s in slice_ids]
    df = dfs[0]
    for d in dfs[1:]:
        df = df.union(d)
    return (df
            .withColumn("lat", F.lit(lat_lo) + (F.col("id") %% 9973) / 9973.0
                        * F.lit(lat_hi - lat_lo))
            .withColumn("lon", F.lit(lon_lo) + ((F.col("id") * 7919) %% 9973) / 9973.0
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
    lambda t: int(t.split("-")[1]) %% %(slices)d in set(slices))]
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
res["stages"]["radius_join"] = {"rows": N_PROBE_TOTAL // %(slices)d * len(slices),
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
"""


def run_level(n_exec: int, cores: int, tag: str):
    src = os.path.join(REPO, "BENCH", "_exec_worker.py")
    os.makedirs(os.path.dirname(src), exist_ok=True)
    with open(src, "w") as f:
        f.write(WORKER % {"repo": REPO, "slices": SLICES})
    assignments = [[s for s in range(SLICES) if s % n_exec == w]
                   for w in range(n_exec)]
    outs = [os.path.join(REPO, "BENCH", f"_exec_{tag}_{n_exec}_{w}.json")
            for w in range(n_exec)]
    import shutil, tempfile
    barrier = tempfile.mkdtemp(prefix="execbench_")
    procs = [subprocess.Popen(
        [sys.executable, src, json.dumps(a), str(cores), o, barrier],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for a, o in zip(assignments, outs)]
    # wait until every worker finished its (untimed) setup, then release
    while sum(1 for f in os.listdir(barrier) if f.startswith("ready")) < n_exec:
        time.sleep(0.2)
        if any(p.poll() not in (None, 0) for p in procs):
            raise RuntimeError("worker died during setup")
    t0 = time.time()
    with open(os.path.join(barrier, "go"), "w") as f:
        f.write("1")
    for p in procs:
        if p.wait() != 0:
            raise RuntimeError("worker failed")
    wall = time.time() - t0
    shutil.rmtree(barrier, ignore_errors=True)
    stages = {}
    for o in outs:
        with open(o) as f:
            r = json.load(f)
        for st, v in r["stages"].items():
            agg = stages.setdefault(st, {"rows": 0, "sec": 0.0, "checksum": 0})
            agg["rows"] += v["rows"]
            agg["sec"] = max(agg["sec"], v["sec"])   # stages run in lockstep order
            agg["checksum"] ^= r["checksums"][st] & ((1 << 64) - 1)
    return {"wall": round(wall, 2), "stages": stages}


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    # best-of-2 per level, interleaved, to damp shared-host noise
    a = run_level(lo, cores, "lo1")
    b = run_level(hi, cores, "hi1")
    a2 = run_level(lo, cores, "lo2")
    b2 = run_level(hi, cores, "hi2")
    for st in a["stages"]:
        if a2["stages"][st]["sec"] < a["stages"][st]["sec"]:
            a["stages"][st]["sec"] = a2["stages"][st]["sec"]
        if b2["stages"][st]["sec"] < b["stages"][st]["sec"]:
            b["stages"][st]["sec"] = b2["stages"][st]["sec"]
    ceil = pipe_ceiling(lo, hi)

    lines = ["# BENCH/EXECUTORS — executor-process scaling (N vs 4N proxy)", "",
             f"Generated by tools/bench_executors.py: {lo} vs {hi} independent",
             f"executor processes, local[{cores}] each, fixed global input",
             f"({SLICES} deterministic slices; identical data at both levels).",
             "Executors are separate JVMs/processes — each owns its Arrow",
             "pipelines and python workers, like real cluster executors.", "",
             f"| stage | rows | {lo}-exec sec | {lo}-exec rows/s | "
             f"{hi}-exec sec | {hi}-exec rows/s | speedup | efficiency |",
             "|---|---|---|---|---|---|---|---|"]
    effs, cks = {}, {}
    for st in a["stages"]:
        ra, rb = a["stages"][st], b["stages"][st]
        ta_, tb_ = ra["rows"] / ra["sec"], rb["rows"] / rb["sec"]
        eff = (tb_ / ta_) / (hi / lo)
        effs[st] = eff
        cks[st] = ra["checksum"] == rb["checksum"] and ra["rows"] == rb["rows"]
        lines.append(f"| {st} | {ra['rows']} | {ra['sec']} | {round(ta_)} | "
                     f"{rb['sec']} | {round(tb_)} | {tb_/ta_:.2f}x | {eff:.2f} |")
    lines += ["", "## Cross-level identity (XOR-aggregated xxhash64 checksums)", "",
              "| stage | rows match | checksum match |", "|---|---|---|"]
    for st, ok in cks.items():
        lines.append(f"| {st} | {'YES' if ok else 'NO'} | {'YES' if ok else 'NO'} |")
    lines += ["", "## Host ceiling (concurrent Arrow-pipe capacity)", "",
              f"Aggregate passthrough-pipe throughput of {lo} vs {hi} concurrent",
              f"single-core processes: {ceil['lo_agg']} -> {ceil['hi_agg']} rows/s",
              f"=> host scaling ceiling **{ceil['ceiling']:.2f}** for any",
              "python-kernel stage (this box degrades concurrent JVM+socket",
              "workloads far below its pure-CPU spin ceiling; real cluster",
              "executors on separate nodes do not share these limits).", "",
              "| stage | raw efficiency | normalized (raw/ceiling) |", "|---|---|---|"]
    for st, e in effs.items():
        lines.append(f"| {st} | {e:.2f} | {min(e / ceil['ceiling'], 1.0):.2f} |")
    lines += ["", f"min raw efficiency: **{min(effs.values()):.2f}**; "
              f"min normalized: **{min(min(e / ceil['ceiling'], 1.0) for e in effs.values()):.2f}** "
              f"(target >= 0.8); wall {a['wall']}s -> {b['wall']}s", ""]
    path = os.path.join(REPO, "BENCH", "EXECUTORS.md")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"efficiency": effs, "ceiling": ceil["ceiling"],
                      "checksums_match": cks}))
    print("written:", path)


if __name__ == "__main__":
    main()
