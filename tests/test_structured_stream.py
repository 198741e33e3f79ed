"""Structured Streaming matcher: state carries across micro-batches and
the streamed estimates equal the directly-driven online matcher."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from barefoot_spark import roads
from barefoot_spark.index import RoadIndex
from barefoot_spark.sources import samples as SS
from barefoot_spark.streaming import structured as ST
from barefoot_spark.streaming.online import OnlineMatcher


@pytest.fixture(scope="module")
def idx():
    return RoadIndex(roads.micro7_pdf(), res=15)


def test_stream_matches_online(spark, idx, tmp_path):
    idx_bc = spark.sparkContext.broadcast(idx)
    pdf = SS.synth_traces(idx, n_traces=2, samples_per_trace=12, seed=9)

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    schema = ("trace_id string, sample_id string, time long, "
              "lat double, lon double, azimuth double")
    stream = spark.readStream.schema(schema).parquet(in_dir)
    out = ST.match_stream(stream, idx_bc)
    q = (out.writeStream.format("memory").queryName("est")
         .option("checkpointLocation", ckpt).outputMode("append").start())

    # two micro-batches: first half, then second half of each trace
    first = pdf.groupby("trace_id").head(6)
    second = pdf[~pdf.index.isin(first.index)]
    spark.createDataFrame(first).coalesce(1).write.mode("append").parquet(in_dir)
    q.processAllAvailable()
    n1 = spark.sql("select count(*) c from est").collect()[0]["c"]
    spark.createDataFrame(second).coalesce(1).write.mode("append").parquet(in_dir)
    q.processAllAvailable()
    got = spark.sql("select * from est").toPandas()
    q.stop()

    assert n1 > 0 and len(got) > n1  # state continued across batches

    # oracle: drive the same samples through the online matcher directly
    om = OnlineMatcher(idx)
    expect = []
    for tid, g in pdf.groupby("trace_id"):
        for r in g.sort_values("time").itertuples(index=False):
            status, publish, row = om.update(tid, int(r.time), r.lat, r.lon, r.azimuth)
            if status == "ok" and publish:
                expect.append(row)
    exp = pd.DataFrame(expect, columns=[f.name for f in ST.ESTIMATE_SCHEMA.fields]) \
        .sort_values(["trace_id", "time"]).reset_index(drop=True)
    got = got.sort_values(["trace_id", "time"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["edge_id"].tolist() == exp["edge_id"].tolist()
    np.testing.assert_allclose(got["fraction"], exp["fraction"], atol=1e-12)
