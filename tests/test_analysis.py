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
