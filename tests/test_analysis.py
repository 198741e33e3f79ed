"""Density clustering vs brute-force oracles (strategy of the
reference's DBCANTest/DBSCANTest/DBRCANTest)."""

import numpy as np
import pandas as pd
import pytest

from barefoot_spark import geo
from barefoot_spark.operators import analysis as A


def test_dbcan_1d_matches_duckdb_oracle(spark):
    rng = np.random.default_rng(42)
    vals = np.concatenate([rng.uniform(0, 1, 30), rng.uniform(5, 5.5, 20),
                           np.array([10.0])])  # two clusters + one noise point
    pdf = pd.DataFrame({"id": np.arange(len(vals)), "value": vals})
    out = A.dbcan_1d(spark.createDataFrame(pdf), eps=0.2, min_pts=3) \
        .toPandas().sort_values("id").reset_index(drop=True)

    import duckdb
    con = duckdb.connect()
    con.register("vals", pdf)
    want = con.execute(A.dbcan_1d_oracle_sql("vals", 0.2, 3)) \
        .df().sort_values("id").reset_index(drop=True)
    got_c = out["cluster_id"].fillna(-1).astype(int).tolist()
    want_c = want["cluster_id"].fillna(-1).astype(int).tolist()
    assert got_c == want_c
    # noise point has no cluster
    assert got_c[-1] == -1
    assert len({c for c in got_c if c >= 0}) == 2


def test_dbscan_2d_geodesic(spark):
    # two dense blobs 5km apart + isolated noise
    rng = np.random.default_rng(7)

    def blob(lat0, lon0, n, spread_m):
        b = rng.uniform(0, 360, n)
        d = rng.uniform(0, spread_m, n)
        lat, lon, _ = geo.direct(np.full(n, lat0), np.full(n, lon0), b, d)
        return lat, lon

    la1, lo1 = blob(48.0, 11.0, 25, 80)
    la2, lo2 = blob(48.05, 11.0, 25, 80)
    lat = np.concatenate([la1, la2, [48.2]])
    lon = np.concatenate([lo1, lo2, [11.2]])
    pdf = pd.DataFrame({"point_id": np.arange(len(lat)), "lat": lat, "lon": lon})
    out = A.dbscan_2d(spark.createDataFrame(pdf), eps_m=150.0, min_pts=4) \
        .toPandas().sort_values("point_id").reset_index(drop=True)
    c = out["cluster_id"].to_numpy()
    # blob 1 all one cluster, blob 2 another, noise unclustered
    assert len(set(c[:25])) == 1 and not pd.isna(c[0])
    assert len(set(c[25:50])) == 1 and not pd.isna(c[25])
    assert c[0] != c[25]
    assert pd.isna(c[50])


def test_dbscan_2d_haversine_matches_bruteforce(spark):
    """metric="haversine" (the DuckDB-oracle metric) must equal a
    brute-force numpy DBSCAN using the identical haversine formula:
    same cores, same min-label components, same min-core-neighbor
    border attachment, same noise."""
    rng = np.random.default_rng(21)
    lat = 48.0 + rng.uniform(0, 0.02, 120)
    lon = 11.0 + rng.uniform(0, 0.03, 120)
    eps_m, min_pts = 150.0, 4
    pdf = pd.DataFrame({"point_id": np.arange(120), "lat": lat, "lon": lon})
    out = A.dbscan_2d(spark.createDataFrame(pdf), eps_m=eps_m,
                      min_pts=min_pts, metric="haversine") \
        .toPandas().sort_values("point_id")["cluster_id"] \
        .fillna(-1).astype(int).to_numpy()

    d = A.haversine_np(lat[:, None], lon[:, None], lat[None, :], lon[None, :])
    adj = (d <= eps_m) & ~np.eye(120, dtype=bool)
    core = adj.sum(axis=1) + 1 >= min_pts
    label = np.where(core, np.arange(120), -1)
    changed = True
    while changed:      # min-label propagation over the core subgraph
        changed = False
        for i in np.flatnonzero(core):
            nb = np.flatnonzero(adj[i] & core)
            if len(nb):
                m = min(label[i], label[nb].min())
                if m < label[i]:
                    label[i] = m
                    changed = True
                for j in nb:
                    if m < label[j]:
                        label[j] = m
                        changed = True
    want = np.full(120, -1)
    want[core] = label[core]
    for i in np.flatnonzero(~core):
        nb = np.flatnonzero(adj[i] & core)
        if len(nb):
            want[i] = label[nb].min()
    assert list(out) == list(want)
    assert (want >= 0).any() and (want == -1).any()   # non-trivial case


def test_dbrcan_wraps_midnight(spark):
    # time-of-day ring: cluster spanning midnight (23.9h + 0.1h)
    vals = np.array([23.8, 23.9, 23.95, 0.05, 0.1, 0.2, 12.0, 12.05, 12.1, 6.0])
    pdf = pd.DataFrame({"id": np.arange(len(vals)), "value": vals})
    out = A.dbrcan_mod(spark.createDataFrame(pdf), modulus=24.0, eps=0.3, min_pts=3) \
        .toPandas().sort_values("id").reset_index(drop=True)
    c = out["cluster_id"].fillna(-1).astype(int).to_numpy()
    # midnight cluster: ids 0..5 together despite the wrap
    assert len(set(c[:6])) == 1 and c[0] >= 0
    # noon cluster separate
    assert len(set(c[6:9])) == 1 and c[6] >= 0 and c[6] != c[0]
    # isolated 6.0 is noise
    assert c[9] == -1

def test_dbcan_1d_core_matches_duckdb_oracle(spark):
    """Exact-DBSCAN 1-D (reference DBCAN.java:48-100 semantics) — Spark
    window pipeline vs the DuckDB twin on mixed dense/sparse data."""
    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.normal(0, 0.05, 40), rng.normal(2, 0.03, 25),
                           rng.uniform(0, 5, 15)])
    pdf = pd.DataFrame({"id": np.arange(len(vals)), "value": vals})
    out = A.dbcan_1d_core(spark.createDataFrame(pdf), eps=0.1, min_pts=5) \
        .toPandas().sort_values("id").reset_index(drop=True)
    import duckdb
    con = duckdb.connect()
    con.register("vals", pdf)
    want = con.execute(A.dbcan_1d_core_oracle_sql("vals", 0.1, 5)) \
        .df().sort_values("id").reset_index(drop=True)
    got_c = out["cluster_id"].fillna(-1).astype(int).tolist()
    want_c = want["cluster_id"].fillna(-1).astype(int).tolist()
    assert got_c == want_c
    assert len({c for c in got_c if c >= 0}) >= 2


def test_dbcan_1d_core_density_not_gap_run():
    """Distinguishes exact-core semantics from gap-run: 4 points spaced
    exactly eps apart with min_pts=4 -> every point has only 3 eps-
    neighbors -> all noise (DBSCAN), whereas gap-run would cluster."""
    import duckdb
    pdf = pd.DataFrame({"id": [0, 1, 2, 3], "value": [0.0, 0.1, 0.2, 0.3]})
    con = duckdb.connect()
    con.register("vals", pdf)
    out = con.execute(A.dbcan_1d_core_oracle_sql("vals", 0.1, 4)).df()
    assert out["cluster_id"].isna().all()


def test_dbrcan_bounds_reference_goldens():
    """DBRCANTest.testBounds (DBRCANTest.java:424-462) verbatim."""
    cases = [
        ([-0.95, -0.3, 0.25, 1.45, 1.5], 0.6, 0.075, 0.0, (0.25, 0.3)),
        ([0.0, 1.2], 0.6, 0.075, 0.0, (0.0, 0.0)),
        ([0.0, 1.2, 1.85], 0.6, 0.075, 0.0, (0.0, 0.05)),
        ([-0.1, 0.0, 0.5, 1.2, 1.9], 0.6, 0.1, 0.0, (0.5, 0.1)),
        ([-0.1, 0.0, 0.5, 1.2, 1.9], 0.3, 0.1, 0.0, None),
    ]
    for vals, m, e, b, want in cases:
        got = A.dbrcan_bounds(vals, m, e, b)
        if want is None:
            assert got is None, (vals, got)
        else:
            assert got is not None
            assert abs(got[0] - want[0]) < 1e-10 and abs(got[1] - want[1]) < 1e-10


DBRCAN_F_LIST = [-1.9, -1.7, -1.4, -1.25, -1.2, 0.05, 0.7, 0.75, 0.9, 1.2,
                 1.3, 1.7, 2.0, 2.3, 2.35, 2.8, 3.1, 3.15, 3.2, 3.5, 3.55,
                 3.6, 5.4, 5.5, 6.0]


def test_dbrcan_function_reference_goldens():
    """DBRCANTest.testFunction (DBRCANTest.java:505-597) verbatim."""
    cases = [
        ([], 2.4, 0.1, 0.0, [(0.0, 0)]),
        ([-1.9, -1.75, -1.7, 0.7, 0.9, 2.8, 3.1, 3.15, 3.2, 5.4, 5.5, 5.8],
         2.4, 0.1, 0.0,
         [(0.0, 0), (0.4, 2), (0.5, 4), (0.6, 8), (0.8, 4), (0.9, 2), (1.0, 0)]),
        (DBRCAN_F_LIST, 2.4, 0.1, 0.0,
         [(0.0, 2), (0.05, 0), (0.4, 2), (0.5, 4), (0.6, 8), (0.9, 2),
          (1.0, 8), (1.3, 0), (1.7, 1), (1.7, 0), (2.0, 1), (2.0, 0), (2.3, 2)]),
        (DBRCAN_F_LIST, 2.4, 0.1, 0.05,
         [(0.0, 2), (0.1, 0), (0.35, 2), (0.45, 4), (0.55, 8), (0.95, 8),
          (1.35, 0), (1.65, 1), (1.75, 0), (1.95, 1), (2.05, 0), (2.25, 2)]),
    ]
    for vals, m, e, b, want in cases:
        got = A.dbrcan_function(vals, m, e, b)
        assert len(got) == len(want), (got, want)
        for g, w in zip(got, want):
            assert abs(g[0] - w[0]) < 1e-10 and g[1] == w[1], (got, want)


def test_dbrcan_function_df_groups(spark):
    """Distributed per-group density functions == the kernel run
    group-by-group on the driver."""
    g1 = DBRCAN_F_LIST
    g2 = [-1.9, -1.75, -1.7, 0.7, 0.9, 2.8, 3.1, 3.15, 3.2, 5.4, 5.5, 5.8]
    pdf = pd.DataFrame({
        "group_id": ["a"] * len(g1) + ["b"] * len(g2),
        "value": g1 + g2})
    out = A.dbrcan_function_df(spark.createDataFrame(pdf), modulo=2.4,
                               eps=0.1, buffer=0.0).toPandas()
    for gid, vals in (("a", g1), ("b", g2)):
        want = A.dbrcan_function(vals, 2.4, 0.1, 0.0)
        sub = out[out.group_id == gid].sort_values(
            ["x", "minimum"], ascending=[True, False])
        got = list(zip(sub.x, sub.minimum))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert abs(g[0] - w[0]) < 1e-10 and g[1] == w[1]


def _cmp_frames(a, b):
    a = a.toPandas().sort_values("id").reset_index(drop=True)
    b = b.toPandas().sort_values("id").reset_index(drop=True)
    assert a["value"].tolist() == b["value"].tolist()
    assert a["cluster_id"].fillna(-1).astype(int).tolist() == \
        b["cluster_id"].fillna(-1).astype(int).tolist()


@pytest.mark.parametrize("case", ["random", "straddle", "one_big", "ties"])
def test_dbcan_bucketed_equals_global(spark, case):
    """The range-bucketed dbcan_1d / dbcan_1d_core must return exactly
    the global-window results, including clusters that straddle bucket
    boundaries, a single cluster spanning every bucket, and duplicate
    values sitting exactly on boundaries."""
    rng = np.random.default_rng(7)
    if case == "random":
        vals = np.round(np.concatenate([
            rng.uniform(0, 3, 200), rng.uniform(10, 10.4, 60),
            rng.uniform(20, 40, 100)]), 4)
    elif case == "straddle":
        # dense chains with max gap just under eps — every quantile
        # boundary cuts through a live cluster
        vals = np.round(np.cumsum(rng.uniform(0.01, 0.19, 400)), 6)
    elif case == "one_big":
        vals = np.round(np.arange(0, 50, 0.05), 6)   # one giant chain
    else:
        vals = np.repeat(np.arange(0, 20, 0.5), 5)   # heavy duplicates
    pdf = pd.DataFrame({"id": np.arange(len(vals)), "value": vals})
    df = spark.createDataFrame(pdf)
    for nb in (4, 8):
        _cmp_frames(A.dbcan_1d(df, eps=0.2, min_pts=3, n_buckets=nb),
                    A.dbcan_1d_global(df, eps=0.2, min_pts=3))
        _cmp_frames(A.dbcan_1d_core(df, eps=0.2, min_pts=5, n_buckets=nb),
                    A.dbcan_1d_core_global(df, eps=0.2, min_pts=5))


def test_dbcan_bucketed_no_single_partition_exchange(spark):
    """Scale contract: the bucketed paths plan NO single-partition
    exchange (the global window variants do — that is why they are not
    the default)."""
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame({"id": np.arange(500),
                        "value": np.round(rng.uniform(0, 100, 500), 4)})
    df = spark.createDataFrame(pdf)
    for out in (A.dbcan_1d(df, eps=0.5, min_pts=3, n_buckets=8),
                A.dbcan_1d_core(df, eps=0.5, min_pts=3, n_buckets=8)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan[:2000]
    plan = A.dbcan_1d_global(df, eps=0.5, min_pts=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in plan


def test_dbrcan_mod_bucketed_cut(spark):
    """dbrcan_mod's bucketed largest-gap search must pick the same ring
    cut as a brute-force numpy scan, including the wrap-preference tie."""
    rng = np.random.default_rng(3)
    vals = np.round(np.concatenate([
        rng.uniform(1, 3, 80), rng.uniform(9, 11, 80),
        rng.uniform(22, 23.6, 60)]), 4)
    pdf = pd.DataFrame({"id": np.arange(len(vals)), "value": vals})
    out = A.dbrcan_mod(spark.createDataFrame(pdf), modulus=24.0, eps=0.3,
                       min_pts=3, n_buckets=8).toPandas()
    # wrap cluster: 22..23.6 and 1..3 must NOT merge (gap 23.6->1+24=1.4
    # > eps) but each dense band clusters
    lab = out.sort_values("id")["cluster_id"].fillna(-1).astype(int).to_numpy()
    assert len({l for l in lab if l >= 0}) >= 3


def test_dbcan_bucketed_equals_global_property(spark):
    """Property sweep: seeded random value sets (mixed dense/sparse,
    duplicates, negatives) — bucketed dbcan_1d and dbcan_1d_core must
    equal the global-window forms for every draw and bucket count."""
    rng = np.random.default_rng(99)
    for trial in range(6):
        n = int(rng.integers(40, 400))
        parts = []
        for _ in range(int(rng.integers(1, 5))):
            c = rng.uniform(-50, 50)
            parts.append(c + rng.uniform(0, rng.choice([0.5, 5.0]),
                                         int(rng.integers(5, n // 2 + 6))))
        vals = np.round(np.concatenate(parts), 4)
        if rng.uniform() < 0.5:
            vals = np.repeat(vals[: max(4, len(vals) // 3)], 3)
        pdf = pd.DataFrame({"id": np.arange(len(vals)), "value": vals})
        df = spark.createDataFrame(pdf)
        eps = float(rng.choice([0.05, 0.3, 1.0]))
        mp = int(rng.integers(2, 7))
        nb = int(rng.choice([3, 5, 8]))
        _cmp_frames(A.dbcan_1d(df, eps, mp, n_buckets=nb),
                    A.dbcan_1d_global(df, eps, mp))
        _cmp_frames(A.dbcan_1d_core(df, eps, mp, n_buckets=nb),
                    A.dbcan_1d_core_global(df, eps, mp))

def test_dbcan_core_ghost_gate_eps_boundary(spark):
    """Round-2 driver red row, reduced: duplicate values exactly eps
    apart with a bucket boundary ON a lattice value.  In IEEE doubles
    1.56 - 1.55 = 0.010000000000000231 > 0.01, while the RANGE frame's
    1.56 - 0.01 = 1.5499999999999998 <= 1.55 — a boundary-eps gate
    written as `high_b - value <= eps` therefore fails to replicate the
    1.55 donors and the 1.56 home rows lose core status.  The gates must
    use the frame's op order (threshold = boundary -/+ eps)."""
    vals = [1.53, 1.54, 1.55, 1.55, 1.56, 1.56, 1.57]
    pdf = pd.DataFrame({"id": np.arange(len(vals)), "value": vals})
    df = spark.createDataFrame(pdf)
    # explicit boundary at 1.56: the exact adversarial placement
    got = A._dbcan_1d_core_bucketed(df, eps=0.01, min_pts=5,
                                    value_col="value", id_col="id",
                                    bounds=[1.56])
    _cmp_frames(got, A.dbcan_1d_core_global(df, eps=0.01, min_pts=5))


def test_dbcan_bucketed_eps_lattice_sweep(spark):
    """Eps-lattice property: values on an exact 0.01 lattice (multiples
    of 0.01 — maximally adversarial for binary floats, every quantile
    boundary lands exactly eps from neighbors), bucketed == global for
    dbcan_1d / dbcan_1d_core across bucket counts {2, 8, 32, 64}.
    The round-2 suite missed the ghost-gate bug because bucket count
    followed defaultParallelism and never placed a boundary
    eps-adjacent to data."""
    rng = np.random.default_rng(42)
    # dense lattice runs (consecutive multiples of eps) + sparse gaps:
    # most values have a neighbor at exactly eps distance
    parts = []
    for c in rng.integers(0, 4000, 12):
        n = int(rng.integers(5, 60))
        parts.append((c + np.arange(n)) / 100.0)
    vals = np.concatenate(parts)
    # duplicates: multiplicity matters for min_pts counts
    vals = np.concatenate([vals, rng.choice(vals, 200)])
    pdf = pd.DataFrame({"id": np.arange(len(vals)), "value": vals})
    df = spark.createDataFrame(pdf)
    g1 = A.dbcan_1d_global(df, eps=0.01, min_pts=3)
    g2 = A.dbcan_1d_core_global(df, eps=0.01, min_pts=5)
    for nb in (2, 8, 32, 64):
        _cmp_frames(A.dbcan_1d(df, eps=0.01, min_pts=3, n_buckets=nb), g1)
        _cmp_frames(A.dbcan_1d_core(df, eps=0.01, min_pts=5, n_buckets=nb),
                    g2)


def test_dbrcan_mod_eps_lattice_sweep(spark):
    """Eps-lattice sweep for the modular path: bucketed dbrcan_mod must
    equal its single-bucket (global-shaped) form on lattice residues
    across bucket counts."""
    rng = np.random.default_rng(17)
    parts = []
    for c in rng.integers(0, 2300, 8):
        parts.append((c + np.arange(int(rng.integers(4, 40)))) / 100.0)
    vals = np.concatenate(parts) % 24.0
    pdf = pd.DataFrame({"id": np.arange(len(vals)), "value": vals})
    df = spark.createDataFrame(pdf)

    def canon(out):
        p = out.toPandas().sort_values("id").reset_index(drop=True)
        return p["cluster_id"].fillna(-1).astype(int).tolist()

    base = canon(A.dbrcan_mod(df, modulus=24.0, eps=0.01, min_pts=3,
                              n_buckets=1))
    for nb in (2, 8, 32):
        assert canon(A.dbrcan_mod(df, modulus=24.0, eps=0.01, min_pts=3,
                                  n_buckets=nb)) == base
