"""Property-based tests (hypothesis) for the geodesic and cell-index
kernels — invariants that hold for ALL inputs, complementing the
fixture goldens (the reference has no property tests; these guard the
vectorized kernels against regressions on inputs no golden covers)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from barefoot_spark import cells, geo

lat_s = st.floats(min_value=-84.0, max_value=84.0, allow_nan=False)
lon_s = st.floats(min_value=-179.0, max_value=179.0, allow_nan=False)
res_s = st.integers(min_value=0, max_value=15)


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s, lat_s, lon_s)
def test_distance_symmetric_nonnegative(la1, lo1, la2, lo2):
    d12 = float(geo.distance(la1, lo1, la2, lo2))
    d21 = float(geo.distance(la2, lo2, la1, lo1))
    assert d12 >= 0.0
    assert abs(d12 - d21) <= 1e-6 * max(1.0, d12)
    if (la1, lo1) == (la2, lo2):
        assert d12 == 0.0


@settings(max_examples=100, deadline=None)
@given(lat_s, lon_s, st.floats(min_value=0.0, max_value=359.999),
       st.floats(min_value=0.1, max_value=2_000_000.0))
def test_direct_inverse_roundtrip(la, lo, azi, s):
    """direct then inverse recovers the distance (mm at city scale,
    relative at continental scale)."""
    la2, lo2, _ = geo.direct(la, lo, azi, s)
    d = float(geo.distance(la, lo, float(la2), float(lo2)))
    assert abs(d - s) <= max(1e-3, 1e-8 * s)


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s, res_s)
def test_cell_pack_unpack_roundtrip(la, lo, res):
    cell = int(cells.latlng_to_cell(np.array([la]), np.array([lo]), res)[0])
    r, ix, iy = cells.unpack(np.array([cell]))
    assert int(r[0]) == res
    assert cell == int(cells.pack(res, int(ix[0]), int(iy[0])))
    assert cell >= 0          # res <= 15 keeps the sign bit clear
    # the cell's center is inside the cell's own bounds
    clat, clon = cells.cell_center(np.array([cell]))
    edge = cells.res_edge_deg(res)
    assert abs(clat[0] - la) <= edge
    assert abs(clon[0] - lo) <= edge * 1.000001 or abs(abs(clon[0] - lo) - 360) <= edge


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s, res_s, res_s)
def test_cell_parent_is_prefix_consistent(la, lo, r1, r2):
    """parent(cell(p, fine), coarse) == cell(p, coarse) — the partition
    pruning contract."""
    fine, coarse = max(r1, r2), min(r1, r2)
    cf = cells.latlng_to_cell(np.array([la]), np.array([lo]), fine)
    cc = cells.latlng_to_cell(np.array([la]), np.array([lo]), coarse)
    assert int(cells.cell_to_parent(cf, coarse)[0]) == int(cc[0])


@settings(max_examples=100, deadline=None)
@given(lat_s, lon_s, lat_s, lon_s, lat_s, lon_s)
def test_intercept_foot_is_closest_on_segment(la1, lo1, la2, lo2, lac, loc):
    """The intercept foot (clamped to [0,1]) is no farther from c than
    either endpoint or the midpoint — within the projection method's
    validity domain: all points in one hemisphere around the foot
    (the reference documents the same caveat, Intersect.java:48-53;
    near-antipodal configurations are out of scope for the gnomonic /
    azimuthal-equidistant iteration)."""
    from hypothesis import assume
    assume(float(geo.distance(la1, lo1, la2, lo2)) < 8_000_000)
    assume(float(geo.distance(la1, lo1, lac, loc)) < 8_000_000)
    assume(float(geo.distance(la2, lo2, lac, loc)) < 8_000_000)
    f = float(np.clip(float(geo.intercept_segment(la1, lo1, la2, lo2, lac, loc)),
                      0.0, 1.0))
    fla, flo = geo.interpolate_segment(la1, lo1, la2, lo2, f)
    d_foot = float(geo.distance(lac, loc, float(fla), float(flo)))
    for g in (0.0, 0.5, 1.0):
        gla, glo = geo.interpolate_segment(la1, lo1, la2, lo2, g)
        d_g = float(geo.distance(lac, loc, float(gla), float(glo)))
        assert d_foot <= d_g + max(0.001, 1e-6 * d_g)
