"""RoadIndex parity tests against the reference's RoadMapTest /
QuadTreeIndexTest refsets (src/test/java/com/bmwcarit/barefoot/roadmap/
RoadMapTest.java:73-180) plus linear-scan oracles
(QuadTreeIndexTest.java:77-262 strategy)."""

import numpy as np
import pytest

from barefoot_spark import geo, roads
from barefoot_spark.index import RoadIndex


@pytest.fixture(scope="module")
def junction():
    return RoadIndex(roads.junction6_pdf(), res=15)


@pytest.fixture(scope="module")
def micro():
    return RoadIndex(roads.micro7_pdf(), res=15)


def directed_ids(idx, pt, base, frac):
    p, eidx, f, _ = idx.split(pt, base, frac)
    return set(idx.edge_id[eidx].tolist())


def test_directed_split_ids(junction):
    # RoadMapTest.testSplit: forward id = gid*2; backward id = gid*2+1
    # only for two-way roads (gids 2,4,5,6 two-way; 1,3 oneway)
    eids = set(junction.edge_id.tolist())
    assert eids == {2, 4, 5, 6, 8, 9, 10, 11, 12, 13}
    # backward edge swaps source/target
    i4f = junction.eid_to_idx(np.array([8]))[0]
    i4b = junction.eid_to_idx(np.array([9]))[0]
    assert junction.edge_src[i4f] == junction.edge_dst[i4b]
    assert junction.edge_dst[i4f] == junction.edge_src[i4b]


def test_spatial_nearest_refsets(junction):
    # RoadMapTest.testSpatialNearest
    pt, base, frac, dist = junction.nearest(np.array([48.083797]), np.array([11.343629]))
    assert directed_ids(junction, pt, base, frac) == {6}
    pt, base, frac, dist = junction.nearest(np.array([48.083752]), np.array([11.344827]))
    assert directed_ids(junction, pt, base, frac) == {8, 9}


def test_spatial_radius_refsets(junction):
    # RoadMapTest.testSpatialRadius
    pt, base, frac, _ = junction.radius(np.array([48.083797]), np.array([11.343629]), 10.0)
    assert directed_ids(junction, pt, base, frac) == {6}
    pt, base, frac, _ = junction.radius(np.array([48.083752]), np.array([11.344827]), 10.0)
    assert directed_ids(junction, pt, base, frac) == {8, 9}
    pt, base, frac, _ = junction.radius(np.array([48.084077]), np.array([11.344166]), 30.0)
    assert directed_ids(junction, pt, base, frac) == {2, 4, 5, 6, 8, 9}
    pt, base, frac, _ = junction.radius(np.array([48.084972]), np.array([11.344099]), 10.0)
    assert len(pt) == 0


def test_radius_matches_linear_scan(micro):
    # QuadTreeIndexTest strategy: compare against brute force over all
    # base geometries
    rng = np.random.default_rng(3)
    lat = rng.uniform(47.998, 48.012, 20)
    lon = rng.uniform(10.999, 11.031, 20)
    for r in (50.0, 200.0, 500.0):
        pt, base, frac, dist = micro.radius(lat, lon, r)
        got = {(int(p), int(micro.gid[b])) for p, b in zip(pt, base)}
        expect = set()
        for i in range(len(lat)):
            f, d = geo.polyline_intercept(
                micro.coords, micro.offsets,
                np.full(len(micro.gid), lat[i]), np.full(len(micro.gid), lon[i]),
                poly_for_point=np.arange(len(micro.gid)))
            for b in np.nonzero(d < r)[0]:
                expect.add((i, int(micro.gid[b])))
        assert got == expect, f"radius {r}"


def test_knearest_counts_and_order(micro):
    lat = np.array([48.001, 48.0005])
    lon = np.array([11.001, 11.019])
    pt, base, frac, dist = micro.knearest(lat, lon, 3)
    for i in range(2):
        sel = pt == i
        assert sel.sum() == 3
        d = dist[sel]
        assert np.all(np.diff(d) >= 0)
    # k=1 equals nearest (when no ties)
    pt1, base1, _, _ = micro.knearest(lat, lon, 1)
    ptn, basen, _, _ = micro.nearest(lat, lon)
    assert set(zip(pt1.tolist(), micro.gid[base1].tolist())) == \
        set(zip(ptn.tolist(), micro.gid[basen].tolist()))


def test_adjacency_successors(micro):
    # micro7 topology: base 0 (0->1) forward successors at vertex 1:
    # base0 backward(1), base1 fwd(2), base3 fwd(6)
    i = micro.eid_to_idx(np.array([0]))[0]
    succ = micro.successors[micro.succ_offsets[i]:micro.succ_offsets[i + 1]]
    assert set(micro.edge_id[succ].tolist()) == {1, 2, 6}
    # oneway base 3 (1->4): successors at vertex 4 = base4 fwd (8)
    i = micro.eid_to_idx(np.array([6]))[0]
    succ = micro.successors[micro.succ_offsets[i]:micro.succ_offsets[i + 1]]
    assert set(micro.edge_id[succ].tolist()) == {8}


def test_edge_point_geometry(micro):
    # midpoint of edge 0 (11.000->11.010 at lat 48) is ~11.005
    eidx = micro.eid_to_idx(np.array([0]))
    lat, lon, azi = micro.edge_point(eidx, np.array([0.5]))
    assert abs(lat[0] - 48.0) < 1e-6
    assert abs(lon[0] - 11.005) < 1e-6
    assert abs(azi[0] - 90.0) < 0.5  # eastbound
    # same spot on the backward edge: flipped fraction, westbound
    eidx = micro.eid_to_idx(np.array([1]))
    lat, lon, azi = micro.edge_point(eidx, np.array([0.5]))
    assert abs(lon[0] - 11.005) < 1e-6
    assert abs(azi[0] - 270.0) < 0.5
