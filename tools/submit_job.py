"""spark-submit entrypoint (north rule: "ships via spark-submit
--py-files"): runs the flagship pipeline — synth geotags over a grid
map, broadcast-index radius join, Viterbi match, tile assignment —
entirely from the shipped zip, printing stage row counts.

    python tools/make_pyfiles.py
    spark-submit --master local[8] \\
        --py-files dist/barefoot_spark.zip tools/submit_job.py
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F


def main():
    spark = (SparkSession.builder.appName("barefoot-spark-job")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from barefoot_spark import roads
    from barefoot_spark.index import RoadIndex
    from barefoot_spark.operators import joins as J, match as M, tiles as T
    from barefoot_spark.sources import samples as SS

    idx = RoadIndex(roads.grid_pdf(12, seed=42), res=16)
    idx_bc = spark.sparkContext.broadcast(idx)

    geotags = SS.synth_traces(idx, n_traces=20, samples_per_trace=30, seed=42)
    samples = spark.createDataFrame(geotags)

    pts = samples.selectExpr("sample_id AS point_id", "lat", "lon")
    hits = J.radius_join(pts, idx_bc, 100.0).count()
    matched = M.match_traces(samples, idx_bc)
    tiled = T.assign_tiles(matched, res=15, parent_res=7)
    n_matched = tiled.count()

    print(json.dumps({"radius_hits": hits, "matched_rows": n_matched,
                      "status": "ok" if n_matched > 0 else "empty"}))
    spark.stop()
    return 0 if n_matched > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
