"""Graph topology operators over the directed-edges DataFrame.

Analogs of barefoot's Graph construction and weakly-connected
components (topology/Graph.java:89-187). Adjacency for the routing
kernel lives in RoadIndex (CSR, broadcast); here are the DataFrame-level
operators: successor edge lists and component labeling via iterative
min-label propagation over the undirected vertex graph (the reference's
BFS over successors+neighbors collapses to vertex connectivity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def successors(edges: DataFrame) -> DataFrame:
    """Per-edge successor list: all edges whose source vertex equals
    this edge's target (Graph.construct semantics). Self-equi-join on
    the vertex key."""
    nxt = edges.select(F.col("source").alias("nxt_source"),
                       F.col("edge_id").alias("succ_id"))
    return (edges.select("edge_id", "target")
            .join(nxt, F.col("target") == F.col("nxt_source"), "left")
            .groupBy("edge_id")
            .agg(F.sort_array(F.collect_list("succ_id")).alias("successors")))


def connected_components(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Weakly-connected components (Graph.components,
    topology/Graph.java:131-187): vertex label = min vertex id reachable
    over undirected edges; edges labeled by their source's component.
    Iterative label propagation — O(diameter) rounds of two shuffles;
    at continental scale swap in a GraphFrames-style large-star/
    small-star variant, same contract. Returns (edge_id, component)."""
    verts = (edges.select(F.col("source").alias("v"))
             .union(edges.select(F.col("target").alias("v"))).distinct())
    und = (edges.select(F.col("source").alias("a"), F.col("target").alias("b"))
           .union(edges.select(F.col("target").alias("a"), F.col("source").alias("b")))
           .distinct().cache())
    labels = verts.select("v", F.col("v").alias("label"))
    for _ in range(max_rounds):
        nbr = (und.join(labels, und["b"] == labels["v"])
               .groupBy("a").agg(F.min("label").alias("nbr_label")))
        new_labels = (labels.join(nbr, labels["v"] == nbr["a"], "left")
                      .select("v", F.least("label", F.coalesce("nbr_label", "label"))
                              .alias("label")).cache())
        changed = (new_labels.alias("n").join(labels.alias("o"), "v")
                   .filter(F.col("n.label") != F.col("o.label")).limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return (edges.select("edge_id", "source")
            .join(labels.withColumnRenamed("v", "source"), "source")
            .select("edge_id", F.col("label").alias("component")))
