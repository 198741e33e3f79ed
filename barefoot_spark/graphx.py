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
        # localCheckpoint, not just cache: each round references the
        # previous labels twice (join + convergence compare), so the
        # logical plan doubles per round and the driver OOMs on
        # explain-string generation past ~25 rounds without truncation
        new_labels = (labels.join(nbr, labels["v"] == nbr["a"], "left")
                      .select("v", F.least("label", F.coalesce("nbr_label", "label"))
                              .alias("label")).localCheckpoint(eager=True))
        changed = (new_labels.alias("n").join(labels.alias("o"), "v")
                   .filter(F.col("n.label") != F.col("o.label")).limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    # labels are localCheckpointed each round, so the returned plan no
    # longer references und — release the cache instead of leaking one
    # entry per invocation
    und.unpersist()
    return (edges.select("edge_id", "source")
            .join(labels.withColumnRenamed("v", "source"), "source")
            .select("edge_id", F.col("label").alias("component")))


def connected_components_star(edges: DataFrame, max_rounds: int = 25) -> DataFrame:
    """Weakly-connected components via alternating large-star /
    small-star (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the continental-scale path promised by
    connected_components' contract: converges in O(log^2 n) rounds
    regardless of graph diameter, vs O(diameter) for plain label
    propagation, and every round is two key-partitioned shuffles with
    map-side combine (groupBy min). Same output contract:
    (edge_id, component = min reachable vertex id).

    large-star: for each undirected neighbor pair (u,v) with v > u,
    link v -> min(N(v) ∪ {v}); small-star: link each u and its smaller
    neighbors to the overall min. Parent pointers double toward the
    component minimum. Terminates when the parent map is stable.
    Lineage is truncated each round (localCheckpoint): each round
    stacks groupBy+explode+distinct plans, and without truncation the
    logical plan grows geometrically and OOMs the driver long before
    the data does — the applied form of the ckpt stage-commit
    discipline (a real cluster run would checkpoint to the stage
    table instead)."""
    labels = components_star_nodes(
        edges.select(F.col("source").alias("u"), F.col("target").alias("v")),
        max_rounds)
    verts = (edges.select(F.col("source").alias("vtx"))
             .union(edges.select(F.col("target").alias("vtx"))).distinct())
    full = (verts.join(labels, "vtx", "left")
            .select("vtx", F.coalesce("label", "vtx").alias("label")))
    return (edges.select("edge_id", "source")
            .join(full.withColumnRenamed("vtx", "source"), "source")
            .select("edge_id", F.col("label").alias("component")))


def components_star_nodes(pairs_df: DataFrame,
                          max_rounds: int = 25,
                          contract_rounds: int = 2) -> DataFrame:
    """Node-level large-star/small-star kernel shared by
    connected_components_star and dbscan_2d's cluster resolution:
    (u, v) pair DataFrame in, (vtx, label = min reachable vertex id)
    out, for every vertex appearing in at least one pair (callers
    coalesce isolated vertices to their own id). Input is symmetrized
    internally, so directed or undirected pair sets both work.

    Before the star loop, `contract_rounds` rounds of min-neighbor
    star contraction shrink the pair set: every vertex merges into
    least(self, min neighbor) — exact (contraction along edges
    preserves components, and the component min survives every round
    because it is smaller than all its neighbors), and each round is
    one groupBy-min plus two relabel joins, cheaper than a star round
    (no collect_list/explode). On an eps-graph with mean degree ~100
    (dbscan at sf0.01: 316k pairs) one round cuts the pair set ~65x,
    so the O(log^2 n) star loop runs on a few thousand pairs instead
    of hundreds of thousands and converges in 1-2 rounds."""
    # parent map starts as each undirected edge (both directions)
    u0, v0 = pairs_df.columns[0], pairs_df.columns[1]
    base = pairs_df.select(F.col(u0).alias("u"), F.col(v0).alias("v"))
    und = (base.union(base.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
           .filter(F.col("u") != F.col("v")).distinct())
    pairs = und.localCheckpoint(eager=True)

    # min-neighbor contraction pre-pass (lineage truncated per round —
    # same plan-growth discipline as the star loop below)
    mappings = []
    for _ in range(contract_rounds):
        lbl = (pairs.groupBy("u").agg(F.min("v").alias("mv"))
               .select("u", F.least("u", "mv").alias("l"))
               .localCheckpoint(eager=True))
        m_u = lbl.select(F.col("u").alias("ju"), F.col("l").alias("lu"))
        m_v = lbl.select(F.col("u").alias("jv"), F.col("l").alias("lv"))
        pairs = (pairs.join(m_u, pairs["u"] == m_u["ju"])
                 .join(m_v, pairs["v"] == m_v["jv"])
                 .select(F.col("lu").alias("u"), F.col("lv").alias("v"))
                 .filter(F.col("u") != F.col("v")).distinct()
                 .localCheckpoint(eager=True))
        mappings.append(lbl)
        if pairs.limit(1).count() == 0:
            break

    for rnd in range(max_rounds):
        # large-star: group by u over the SYMMETRIZED neighbors v
        # (the pair set is directed after a small-star round); m =
        # min(u, min(v)); emit (v, m) for v > u — strictly-larger
        # neighbors hook to the minimum
        sym = pairs.union(pairs.select(F.col("v").alias("u"),
                                       F.col("u").alias("v")))
        nbrs = sym.groupBy("u").agg(F.collect_list("v").alias("vs"))
        m = F.least(F.col("u"), F.array_min("vs"))
        large = (nbrs.select(F.col("u"), m.alias("m"),
                             F.filter("vs", lambda x: x > F.col("u")).alias("big"))
                 .select(F.explode("big").alias("u"), F.col("m").alias("v"))
                 .filter(F.col("u") != F.col("v")).distinct())
        # small-star: group by u; emit (x, m) for every x in
        # {u} ∪ {v in N(u): v <= u}
        nbrs2 = large.union(large.select(F.col("v").alias("u"), F.col("u").alias("v"))) \
            .groupBy("u").agg(F.collect_list("v").alias("vs"))
        m2 = F.least(F.col("u"), F.array_min("vs"))
        small = (nbrs2.select(
            F.col("u"), m2.alias("m"),
            F.array_union(F.filter("vs", lambda x: x <= F.col("u")),
                          F.array(F.col("u"))).alias("small"))
            .select(F.explode("small").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v")).distinct())
        new_pairs = small.localCheckpoint(eager=True)
        # converged when the pair set is stable (all stars point at
        # roots): no additions AND no removals vs the previous round —
        # one symmetric-difference job, not two exceptAll jobs
        if rnd and new_pairs.exceptAll(pairs) \
                .union(pairs.exceptAll(new_pairs)).limit(1).count() == 0:
            pairs = new_pairs
            break
        pairs = new_pairs

    # min per vertex: at convergence pairs are star edges (one root per
    # u); the groupBy also makes a max_rounds cutoff degrade gracefully
    labels = pairs.groupBy(F.col("u").alias("vtx")) \
        .agg(F.min("v").alias("label"))

    # compose the contraction mappings back out: a vertex's label is
    # its contracted id's star label, or the contracted id itself when
    # that id's component fully collapsed before the star loop (the
    # collapsed label is the component min by the invariant above);
    # the final filter restores the roots-omitted output contract
    for lbl in reversed(mappings):
        labels = (lbl.join(labels.withColumnRenamed("vtx", "l2"),
                           lbl["l"] == F.col("l2"), "left")
                  .select(F.col("u").alias("vtx"),
                          F.coalesce("label", F.col("l")).alias("label")))
    return labels.filter(F.col("vtx") != F.col("label"))
