"""Skew handling: salted repartition / two-phase aggregation.

North-rule obligation: "skew from dense urban cells is handled with
salted repartitioning and AQE hints". AQE skew-join splitting is enabled
globally (session.py); this module adds the explicit patterns for the
cases AQE cannot fix:

- ``salted_agg``: two-phase aggregation for hot grouping keys (a single
  mega-city cell can hold 10^9 images — one reducer would take it all).
  Phase 1 groups on (key, salt) so the hot key spreads across
  ``salt_n`` reducers with map-side partial aggregation; phase 2 merges
  the per-salt partials.
- ``salted_repartition``: spreads hot keys across partitions for
  kernel stages that only need co-location, not exact grouping
  (e.g. the broadcast-probe stages, which are keyless anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MERGEABLE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(df: DataFrame, key_cols, aggs, salt_n: int = 32) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: dict output_name -> (op, input_col) with op in
    {count, sum, min, max} (algebraic ops — they re-merge exactly).
    Produces the same result as ``df.groupBy(keys).agg(...)`` with the
    hot-key reduce fanned out ``salt_n`` ways.
    """
    key_cols = list(key_cols)
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_n).cast("int"))
    phase1_exprs = []
    for name, (op, col) in aggs.items():
        fn = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}[op]
        phase1_exprs.append(fn(col).alias(f"__p_{name}"))
    p1 = salted.groupBy(*key_cols, "__salt").agg(*phase1_exprs)
    phase2_exprs = []
    for name, (op, _col) in aggs.items():
        merge = MERGEABLE[op]
        phase2_exprs.append(merge(f"__p_{name}").alias(name))
    return p1.groupBy(*key_cols).agg(*phase2_exprs)


def salted_repartition(df: DataFrame, key_col: str, salt_n: int = 32,
                       num_partitions: int | None = None) -> DataFrame:
    """Repartition by (key, random salt) — co-locates roughly by key but
    caps any single key's partition share at ~1/salt_n."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_n).cast("int"))
    parts = [num_partitions] if num_partitions else []
    return salted.repartition(*parts, key_col, "__salt").drop("__salt")


def top_key_share(df: DataFrame, key_col: str) -> float:
    """Diagnostic: fraction of rows held by the hottest key (decide
    whether to salt)."""
    total = df.count()
    if total == 0:
        return 0.0
    top = (df.groupBy(key_col).count().orderBy(F.desc("count")).limit(1)
           .collect()[0]["count"])
    return top / total
