"""Route geometry + output formatter tests (Route.geometry /
MatcherKState sink analogs)."""

import json

import numpy as np
import pytest

from barefoot_spark import geo, roads
from barefoot_spark.index import RoadIndex
from barefoot_spark.operators import match as M, output as O
from barefoot_spark.sources import samples as SS


@pytest.fixture(scope="module")
def idx():
    return RoadIndex(roads.micro7_pdf(), res=15)


def test_route_geometry_single_edge(idx):
    # same-edge sub-clip: edge 0 from 0.2 to 0.8
    g = O.route_geometry(idx, [0], 0.2, 0.8)
    assert len(g) == 2
    lat0, lon0, _ = idx.edge_point(idx.eid_to_idx(np.array([0])), np.array([0.2]))
    assert abs(g[0][0] - lon0[0]) < 1e-9 and abs(g[0][1] - lat0[0]) < 1e-9


def test_route_geometry_multi_edge(idx):
    # edges 0 -> 2 -> 4 (roads 0,1,2 eastbound): start mid-0, end mid-2
    g = O.route_geometry(idx, [0, 2, 4], 0.5, 0.5)
    # start ~11.005, through 11.010, 11.020, end ~11.025
    lons = [p[0] for p in g]
    assert lons[0] == pytest.approx(11.005, abs=1e-6)
    assert lons[-1] == pytest.approx(11.025, abs=1e-6)
    assert lons == sorted(lons)
    # route length from geometry ~= sum of clipped edges
    glat = np.array([p[1] for p in g])
    glon = np.array([p[0] for p in g])
    d = float(np.sum(geo.distance(glat[:-1], glon[:-1], glat[1:], glon[1:])))
    expect = 0.5 * idx.edge_len[idx.eid_to_idx(np.array([0]))[0]] \
        + idx.edge_len[idx.eid_to_idx(np.array([2]))[0]] \
        + 0.5 * idx.edge_len[idx.eid_to_idx(np.array([4]))[0]]
    assert d == pytest.approx(expect, rel=1e-3)


def test_geojson_and_slim_sinks(spark, idx):
    idx_bc = spark.sparkContext.broadcast(idx)
    pdf = SS.synth_traces(idx, n_traces=2, samples_per_trace=10, seed=3)
    matched = M.match_traces(spark.createDataFrame(pdf), idx_bc)
    with_geom = O.with_route_geometry(matched, idx_bc)
    gj = O.to_geojson(with_geom).toPandas()
    assert len(gj) >= 1
    for s in gj["geojson"]:
        obj = json.loads(s)
        assert obj["type"] == "MultiLineString"
        assert len(obj["coordinates"]) >= 1
        for line in obj["coordinates"]:
            assert all(len(pt) == 2 for pt in line)

    slim = O.to_slim_json(matched).toPandas()
    assert len(slim) > 0
    rec = json.loads(slim.iloc[0]["slim"])
    assert "road" in rec and "frac" in rec
