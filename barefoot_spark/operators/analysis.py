"""Density clustering operators: DBSCAN (2-D geodesic), DBCAN (1-D),
DBRCAN (modular 1-D) — analogs of the reference's analysis package
(analysis/DBSCAN.java:37-154, DBCAN.java:28-218, DBRCAN.java:52-477).

DBCAN is pure SQL-window logic (gap analysis), so it runs entirely in
Catalyst and has an exact DuckDB oracle. DBSCAN builds the ε-neighbor
graph with the same cell-bucketed radius-join pattern as the spatial
joins, then resolves clusters by iterative label propagation
(DataFrame joins, converges in O(log n) rounds on typical data).
DBRCAN rotates the ring at the largest gap and reuses DBCAN.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .. import cells, geo


def dbcan_1d(values: DataFrame, eps: float, min_pts: int,
             value_col="value", id_col="id") -> DataFrame:
    """1-D density clustering: maximal runs of sorted values where each
    gap <= eps; clusters need >= min_pts members (DBCAN semantics:
    epsilon-neighborhood density over ordered doubles). Returns
    (id, value, cluster_id) with cluster_id = min id in cluster, or
    NULL for noise. Window functions only — no UDF."""
    w = Window.orderBy(value_col, id_col)
    gapped = values.select(
        F.col(id_col), F.col(value_col),
        (F.col(value_col) - F.lag(value_col).over(w)).alias("gap"))
    grp = gapped.withColumn(
        "new_cluster",
        F.when(F.col("gap").isNull() | (F.col("gap") > eps), 1).otherwise(0))
    grp = grp.withColumn("cluster_seq", F.sum("new_cluster").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    counts = Window.partitionBy("cluster_seq")
    return (grp
            .withColumn("cluster_size", F.count("*").over(counts))
            .withColumn("cluster_id",
                        F.when(F.col("cluster_size") >= min_pts,
                               F.min(id_col).over(counts)))
            .select(id_col, value_col, "cluster_id"))


def dbcan_1d_oracle_sql(table: str, eps: float, min_pts: int,
                        value_col="value", id_col="id") -> str:
    """DuckDB twin of dbcan_1d."""
    return f"""
        WITH g AS (
            SELECT {id_col} AS id, {value_col} AS value,
                   {value_col} - lag({value_col}) OVER
                       (ORDER BY {value_col}, {id_col}) AS gap
            FROM {table}
        ), c AS (
            SELECT id, value,
                   sum(CASE WHEN gap IS NULL OR gap > {eps!r}e0 THEN 1 ELSE 0 END)
                       OVER (ORDER BY value, id ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cluster_seq
            FROM g
        )
        SELECT id, value,
               CASE WHEN count(*) OVER (PARTITION BY cluster_seq) >= {min_pts}
                    THEN min(id) OVER (PARTITION BY cluster_seq) END AS cluster_id
        FROM c
    """


def dbscan_2d(points: DataFrame, eps_m: float, min_pts: int,
              id_col="point_id", max_rounds: int = 30) -> DataFrame:
    """Geodesic DBSCAN. Stages:
    1. self radius-join via cell buckets (cover each point's eps
       envelope, equi-join on cell, exact geodesic refine in a pandas
       kernel) -> ε-neighbor edge list;
    2. core points = count(neighbors)+1 >= min_pts;
    3. clusters = connected components of the core-core subgraph via
       iterative min-label propagation (each round: join labels across
       edges, take min; stop when stable);
    4. border points attach to the min core-neighbor label.
    Returns (point_id, cluster_id NULL for noise)."""
    res = cells.res_for_edge_m(max(eps_m, 1.0) * 2)
    pts = points.select(id_col, "lat", "lon").cache()

    # 1. candidate pairs: points sharing a cell of the eps-cover
    def cover(pdf_iter):
        for pdf in pdf_iter:
            lat = pdf["lat"].to_numpy(np.float64)
            lon = pdf["lon"].to_numpy(np.float64)
            row, cell = cells.cover_radius(lat, lon, eps_m, res)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[row],
                "lat": lat[row], "lon": lon[row], "cell": cell})

    import pyspark.sql.types as T
    id_type = points.schema[id_col].dataType
    cov_schema = T.StructType([
        T.StructField(id_col, id_type), T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()), T.StructField("cell", T.LongType())])
    cov = pts.mapInPandas(cover, cov_schema)
    home = pts.mapInPandas(
        lambda it: (pd.DataFrame({
            id_col: p[id_col],
            "lat": p["lat"], "lon": p["lon"],
            "cell": cells.latlng_to_cell(p["lat"].to_numpy(), p["lon"].to_numpy(), res)})
            for p in it), cov_schema)

    cand = (cov.alias("l").join(home.alias("r"), "cell")
            .filter(F.col(f"l.{id_col}") != F.col(f"r.{id_col}"))
            .select(F.col(f"l.{id_col}").alias("a"), F.col("l.lat").alias("alat"),
                    F.col("l.lon").alias("alon"), F.col(f"r.{id_col}").alias("b"),
                    F.col("r.lat").alias("blat"), F.col("r.lon").alias("blon"))
            .dropDuplicates(["a", "b"]))

    def refine(pdf_iter):
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            d = geo.distance(pdf["alat"].to_numpy(), pdf["alon"].to_numpy(),
                             pdf["blat"].to_numpy(), pdf["blon"].to_numpy())
            keep = d <= eps_m
            yield pdf.loc[keep, ["a", "b"]]

    edge_schema = T.StructType([T.StructField("a", id_type), T.StructField("b", id_type)])
    edges = cand.mapInPandas(refine, edge_schema).cache()

    # 2. core points
    deg = edges.groupBy("a").agg(F.count("*").alias("nbrs"))
    core = (pts.join(deg, pts[id_col] == deg["a"], "left")
            .select(F.col(id_col),
                    (F.coalesce(F.col("nbrs"), F.lit(0)) + 1 >= min_pts).alias("is_core")))

    # 3. label propagation over core-core edges
    core_ids = core.filter("is_core").select(F.col(id_col).alias("node"))
    cc_edges = (edges.join(core_ids.withColumnRenamed("node", "a"), "a")
                .join(core_ids.withColumnRenamed("node", "b"), "b")
                .select("a", "b").cache())
    labels = core_ids.select("node", F.col("node").alias("label"))
    for _ in range(max_rounds):
        nbr_min = (cc_edges.join(labels, cc_edges["b"] == labels["node"])
                   .groupBy("a").agg(F.min("label").alias("nbr_label")))
        new_labels = (labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
                      .select("node", F.least("label", F.coalesce("nbr_label", "label"))
                              .alias("label")).cache())
        changed = (new_labels.alias("n").join(labels.alias("o"), "node")
                   .filter(F.col("n.label") != F.col("o.label")).limit(1).count())
        labels = new_labels
        if changed == 0:
            break

    # 4. border points: min label among core neighbors
    core_lbl = labels.withColumnRenamed("node", "cid").withColumnRenamed("label", "cluster_id")
    border = (edges.join(core_lbl, edges["b"] == core_lbl["cid"])
              .groupBy("a").agg(F.min("cluster_id").alias("border_label")))
    out = (pts.select(id_col)
           .join(core_lbl.withColumnRenamed("cid", id_col), id_col, "left")
           .join(border.withColumnRenamed("a", id_col), id_col, "left")
           .select(F.col(id_col),
                   F.coalesce("cluster_id", "border_label").alias("cluster_id")))
    return out


def dbrcan_mod(values: DataFrame, modulus: float, eps: float, min_pts: int,
               value_col="value", id_col="id") -> DataFrame:
    """Modular 1-D clustering (DBRCAN): residues on a ring of given
    modulus; clusters may wrap. Implemented with the rotate-at-largest-
    gap trick (SURVEY.md §2.6): shift all residues so the largest gap
    sits at the ring cut, then ordinary 1-D gap clustering; cluster ids
    reported as min original id."""
    w = Window.orderBy("residue", id_col)
    resid = values.select(
        F.col(id_col), F.col(value_col),
        F.pmod(F.col(value_col), F.lit(modulus)).alias("residue"))
    gaps = resid.select(
        "residue",
        (F.col("residue") - F.lag("residue").over(w)).alias("gap"))
    # wrap-around gap = first + modulus - last
    agg = resid.agg(F.min("residue").alias("lo"), F.max("residue").alias("hi")).collect()[0]
    wrap_gap = agg["lo"] + modulus - agg["hi"]
    max_gap_row = (gaps.filter(F.col("gap").isNotNull())
                   .orderBy(F.desc("gap"), "residue").limit(1).collect())
    cut = agg["lo"] if (not max_gap_row or wrap_gap >= max_gap_row[0]["gap"]) \
        else max_gap_row[0]["residue"]
    rotated = resid.withColumn(
        "rot", F.pmod(F.col("residue") - F.lit(float(cut)), F.lit(modulus)))
    clustered = dbcan_1d(rotated.select(id_col, F.col("rot").alias("value")),
                         eps, min_pts, value_col="value", id_col=id_col)
    return (clustered.withColumnRenamed("value", "rotated_residue")
            .join(resid.select(id_col, "residue"), id_col))
