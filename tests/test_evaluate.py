"""Evaluation utilities + online-state JSON round-trip."""

import json

import numpy as np
import pandas as pd
import pytest

from barefoot_spark import roads
from barefoot_spark.index import RoadIndex
from barefoot_spark.operators import evaluate as E
from barefoot_spark.sources import samples as SS
from barefoot_spark.streaming import online as OL


def test_align_identical_and_disjoint():
    edges = [0, 2, 4]
    lens = [100.0, 200.0, 50.0]
    m, pairs = E.align(edges, lens, edges)
    assert m == 350.0 and len(pairs) == 3
    m, pairs = E.align(edges, lens, [9, 11])
    assert m == 0.0 and pairs == []


def test_align_partial_and_error():
    left = [0, 2, 4, 6]
    lens = [10.0, 20.0, 30.0, 40.0]
    right = [0, 4, 6]     # edge 2 missed
    m, pairs = E.align(left, lens, right)
    assert m == 80.0
    assert E.error(left, lens, right) == pytest.approx(0.2)


def test_candidates_to_sequence(spark):
    pdf = pd.DataFrame({
        "trace_id": ["t"] * 5, "seq": range(5),
        "edge_id": [0, 0, 2, 2, 4]})
    out = E.candidates_to_sequence(spark.createDataFrame(pdf)).toPandas()
    assert out["edge_id"].tolist() == [0, 2, 4]


def test_subsample(spark):
    pdf = pd.DataFrame({
        "trace_id": ["t"] * 10, "time": [i * 1000 for i in range(10)]})
    out = E.subsample(spark.createDataFrame(pdf), interval_s=3).toPandas()
    assert sorted(out["time"] // 1000) == [0, 3, 6, 9]
    # last sample always kept even off-interval
    pdf2 = pd.DataFrame({"trace_id": ["t"] * 5, "time": [0, 1000, 2000, 3000, 3500]})
    out2 = E.subsample(spark.createDataFrame(pdf2), interval_s=3).toPandas()
    assert sorted(out2["time"]) == [0, 3000, 3500]


def test_subsample_non_second_aligned(spark):
    """Benchmark.java:170-177 truncates each timestamp to whole seconds
    (long division) BEFORE the diff/modulo — for non-second-aligned
    epoch-ms times the kept set must match a direct port of the Java
    loop, not a millisecond-diff modulo."""
    times = [137, 1137, 2500, 3137, 4999, 6137, 7000, 9137, 10500]

    def java_subsample(ts, interval):
        keep = [ts[0]]
        start = ts[0] // 1000
        for t in ts[1:-1]:
            if (t // 1000 - start) % interval == 0:
                keep.append(t)
        keep.append(ts[-1])
        return sorted(set(keep))

    pdf = pd.DataFrame({"trace_id": ["t"] * len(times), "time": times})
    for iv in (2, 3, 5):
        out = E.subsample(spark.createDataFrame(pdf), interval_s=iv) \
            .toPandas()
        assert sorted(out["time"]) == java_subsample(times, iv), iv


def test_online_state_json_roundtrip():
    """Serialize mid-stream, restore in a fresh matcher, continue —
    final sequence equals the uninterrupted run (the KState
    persistence/redistribution contract, markov/KState.java:63-118)."""
    idx = RoadIndex(roads.micro7_pdf(), res=15)
    samples = [(0, 48.001, 11.001), (60000, 48.001, 11.011),
               (120000, 48.001, 11.012), (180000, 48.010, 11.021)]

    full = OL.OnlineMatcher(idx)
    for t, lat, lon in samples:
        full.update("t", t, lat, lon)
    expect = full.sequence("t")

    part = OL.OnlineMatcher(idx)
    for t, lat, lon in samples[:2]:
        part.update("t", t, lat, lon)
    blob = json.dumps(OL.state_to_json(part.states["t"]))

    resumed = OL.OnlineMatcher(idx)
    resumed.states["t"] = OL.state_from_json(json.loads(blob))
    for t, lat, lon in samples[2:]:
        resumed.update("t", t, lat, lon)
    got = resumed.sequence("t")

    assert len(got) == len(expect) == 4
    for g, e in zip(got, expect):
        assert g[2] == e[2]
        assert abs(g[3] - e[3]) < 1e-12
