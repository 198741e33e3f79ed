"""Matching-quality evaluation: path alignment, error metric,
candidate-sequence utilities (analogs of matcher/Benchmark.java:28-179).

`align` is the reference's dynamic program maximizing matched length
between two edge sequences; `error` is unmatched-length / left-length;
`candidates_to_sequence` dedups consecutive identical vertex pairs;
`subsample` keeps every k-th second plus first/last (expressible as a
window filter on the samples DataFrame)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def align(left_edges, left_lens, right_edges):
    """DP alignment maximizing the summed length of left edges that also
    appear, in order, in the right sequence (Benchmark.align,
    matcher/Benchmark.java:28-94). Returns (matched_length, pairs) where
    pairs are (left_idx, right_idx)."""
    n, m = len(left_edges), len(right_edges)
    score = np.zeros((n + 1, m + 1))
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            hit = score[i - 1][j - 1] + left_lens[i - 1] \
                if left_edges[i - 1] == right_edges[j - 1] else -np.inf
            score[i][j] = max(score[i - 1][j], score[i][j - 1], hit)
    # backtrack
    pairs = []
    i, j = n, m
    while i > 0 and j > 0:
        if left_edges[i - 1] == right_edges[j - 1] and \
                score[i][j] == score[i - 1][j - 1] + left_lens[i - 1]:
            pairs.append((i - 1, j - 1))
            i, j = i - 1, j - 1
        elif score[i][j] == score[i - 1][j]:
            i -= 1
        else:
            j -= 1
    return float(score[n][m]), pairs[::-1]


def error(left_edges, left_lens, right_edges):
    """(unmatched left length) / (total left length)
    (Benchmark.error, matcher/Benchmark.java:136-155)."""
    total = float(np.sum(left_lens))
    if total == 0:
        return 0.0
    matched, _ = align(left_edges, left_lens, right_edges)
    return (total - matched) / total


def candidates_to_sequence(matched: DataFrame) -> DataFrame:
    """Dedup consecutive identical edges per trace
    (Benchmark.candidatesToSequence, matcher/Benchmark.java:103-124):
    lag-window filter."""
    w = Window.partitionBy("trace_id").orderBy("seq")
    return (matched
            .withColumn("__prev", F.lag("edge_id").over(w))
            .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("edge_id")))
            .drop("__prev"))


def subsample(samples: DataFrame, interval_s: int) -> DataFrame:
    """Keep every interval-th second plus the first and last sample per
    trace (Benchmark.subsample, matcher/Benchmark.java:165-179).

    The reference truncates each epoch-ms timestamp to whole SECONDS
    (``time() / 1000`` in Java long division) before the diff/modulo —
    so for non-second-aligned times the kept set is defined by the
    second-granular diff, not the millisecond diff. ``div`` mirrors
    Java's truncating division (times are positive)."""
    w = Window.partitionBy("trace_id")
    sec_diff = F.expr("time div 1000") - F.expr("__t0 div 1000")
    return (samples
            .withColumn("__t0", F.min("time").over(w))
            .withColumn("__t1", F.max("time").over(w))
            .filter((sec_diff % interval_s == 0)
                    | (F.col("time") == F.col("__t1")))
            .drop("__t0", "__t1"))
