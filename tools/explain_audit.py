"""Physical-plan audit: captures `explain("formatted")` for the
engine's headline queries and greps the plan facts that matter at
100 TB — parquet filter pushdown (PushedFilters), column pruning
(ReadSchema), broadcast joins for small dimensions, whole-stage
codegen spans, and the absence of unexpected shuffles.

Writes EXPLAIN.md at the repo root. Usage:
    python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from barefoot_spark.session import build_session
import barefoot_spark.entry_queries as EQ

AUDITS = [
    # (query, facts to assert in the plan)
    ("lineitem_pricing", ["PushedFilters: [IsNotNull(l_shipdate)",
                          "codegen id"]),
    ("top_customers", ["BroadcastHashJoin", "codegen id"]),
    ("radius_join", ["BroadcastNestedLoopJoin", "codegen id"]),
    ("radius_join_fast", ["BroadcastHashJoin", "codegen id"]),
    ("nearest_join_fast", ["BroadcastHashJoin", "Window"]),
    # directed_edges' literal fixture constant-folds to LocalTableScans
    # under the Union — nothing left to codegen (optimal)
    ("directed_edges", ["Union"]),
    ("raster_vector_join", ["BroadcastHashJoin"]),
    # emission stage: cell-cover + directed-edge dims broadcast, the
    # refine/emission math stays in whole-stage codegen
    ("emission_stage", ["BroadcastHashJoin", "codegen id"]),
    ("tile_assign", ["codegen id"]),
    ("event_sessions", ["codegen id", "Window"]),
    ("exact_dedup", ["HashAggregate"]),          # partial agg = map-side combine
    ("jaccard_pairs", ["BroadcastHashJoin"]),
    ("ann_topk", ["codegen id"]),
    # PQ-ADC: encode + score stay in whole-stage codegen; the per-query
    # LUT side is the broadcast side of the join; top-k via partitioned
    # window (never a single partition)
    ("pq_ann_topk", ["BroadcastNestedLoopJoin", "codegen id", "Window",
                     "!SinglePartition"]),
    # IVFPQ composed: the probe side is broadcast and the join is an
    # EQUI-join on list_id (the partition-prunable IVF shape — contrast
    # pq_ann_topk's nested-loop full scan); ADC + re-rank stay in
    # codegen'd windows, never a single partition
    ("ivfpq_ann_topk", ["BroadcastHashJoin", "codegen id", "Window",
                        "!SinglePartition", "!BroadcastNestedLoopJoin"]),
    # end-to-end dedup deliverable: cluster labels + sizes join back
    # onto the corpus as broadcasts — the full documents table is
    # never shuffled by the keep-list stage
    ("dedup_keep_canonical", ["BroadcastHashJoin"]),
    # phash image dedup: band candidates come from a hash EQUI-join
    # (never a cartesian pair scan); the hamming verify is codegen'd
    # bit_count over the two scalar sig columns; the hot-bucket guard's
    # chunk-pair salt explode is physically present on both sides
    ("phash_dedup", ["BroadcastHashJoin", "bit_count", "codegen id",
                     "!CartesianProduct", "explode(sequence("]),
    # per-split running token sum: the window partitions by the split
    # key — never a single global partition
    ("token_budget_sample", ["Window", "!SinglePartition"]),
    # greedy packing kernel: one Arrow group-map per split partition
    ("pack_sequences", ["FlatMapGroupsInPandas", "!SinglePartition"]),
    # composed curation pipeline: every stage joins on keys (md5
    # window, band bucket, broadcast keep-list) — nothing quadratic
    ("curate_corpus", ["Window", "BroadcastHashJoin", "!CartesianProduct"]),
    # "!fact" = the fact must be ABSENT from the plan
    # hot-bucket guard: the LSH self-join must key on the chunk PAIR
    # (bucket + both salt columns), so no shuffle key ever owns more
    # than ~cap^2 of a degenerate bucket's pair space
    ("cosine_near_dup", ["Left keys [3]: [bucket", "explode(sequence("]),
    # multimodal curation flagship: gates are row-local filters, exact
    # dedup is a keyed window, keep-list joins broadcast — nothing
    # quadratic anywhere in the composition (the banded pair subtree
    # incl. its bit_count verify is behind the star kernel's
    # checkpoint; phash_dedup audits it directly)
    ("curate_images", ["Window", "BroadcastHashJoin",
                       "!CartesianProduct"]),
    # per-cell image rollup: partial HashAggregates everywhere (the
    # hot cell fans out over salt / distinct-member keys), NO Expand —
    # the multi-countDistinct single-reducer trap is avoided by
    # dedup-then-count in separate aggs — and the three branches
    # re-join on the post-agg cell key as broadcasts
    ("tile_image_rollup", ["HashAggregate", "BroadcastHashJoin",
                           "!Expand", "!SinglePartition",
                           "!CartesianProduct"]),
    # multi-resolution pyramid: coarse zoom levels re-merge from the
    # materialized finer frontier by cell-id arithmetic — same
    # no-Expand / no-single-reducer obligations as the flat rollup
    ("tile_pyramid", ["Union", "HashAggregate", "!Expand",
                      "!SinglePartition", "!CartesianProduct"]),
    # mixture rebalance: windows key on (source, salt) — a hot source
    # ranks as salt_n partitions; filters are row-local
    ("mixture_sample", ["Window", "!SinglePartition",
                        "!CartesianProduct", "!Expand"]),
    # vision batch packing: both windows key on (bucket, salt) — a
    # hot aspect bucket ranks as salt_n partitions, never one sort
    ("pack_image_batches", ["Window", "!SinglePartition",
                            "!CartesianProduct", "!Expand"]),
    # geo-curation flagship: thinning kernel is one Arrow group-map
    # per trajectory, cap windows key on (cell, salt), disposition
    # joins are id-keyed — nothing quadratic, no global sort
    ("curate_frames", ["FlatMapGroupsInPandas", "Window",
                       "!SinglePartition", "!CartesianProduct",
                       "!Expand"]),
    # geographic balancing: two keyed windows — (cell, salt) then
    # cell over <= salt_n*cap survivors — never a single partition
    ("tile_cap_sample", ["Window", "!SinglePartition",
                         "!CartesianProduct", "!Expand"]),
    # cross-modal consistency gate: one single-distinct agg per side
    # (two-level partial agg, no Expand), broadcast join-back
    ("caption_spam", ["HashAggregate", "BroadcastHashJoin", "!Expand",
                      "!SinglePartition", "!CartesianProduct"]),
    # trajectory frame thinning: one Arrow group-map per trajectory
    # partition — never a single global partition
    ("frame_thinning", ["FlatMapGroupsInPandas", "!SinglePartition"]),
    # batch-vs-index probe: candidates from the banded equi-join with
    # the salt INSIDE the 3-part join key (blk, key, chunk) — a hot
    # index bucket never collapses onto one shuffle key; hamming
    # verify is codegen'd bit_count; best-match pick is a keyed window
    ("incremental_dedup", ["bit_count", "Window", "!CartesianProduct"]),
    # decontamination: the gram-join subtree (benchmark grams
    # broadcast against the corpus explode) is behind the
    # materialized hit set — the visible plan is the flag join-back,
    # which must be a broadcast over a doc_id-only parquet scan; the
    # per-doc distinct counts show no Expand and no single reducer
    ("decontaminate", ["BroadcastHashJoin",
                       "ReadSchema: struct<doc_id:bigint>",
                       "!Expand", "!CartesianProduct",
                       "!SinglePartition"]),
    ("dbcan_events", ["Window", "!SinglePartition"]),
    ("dbcan_core_events", ["Window", "!SinglePartition"]),
    ("dbrcan_mod_events", ["Window", "!SinglePartition"]),
    ("subsample_traces", ["Window", "!SinglePartition"]),
    ("candidate_sequence", ["Window", "!SinglePartition"]),
    ("sample_dup_times", ["HashAggregate", "!SinglePartition"]),
]


def column_pruning_check(spark, sf_dir):
    """lineitem scan for a 2-column projection must read 2 columns."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 30)
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = m.group(1).count(":") if m else -1
    pushed = "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30" in plan
    return plan, cols, pushed


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    # AQE off for the audit only: AdaptiveSparkPlan prints the
    # pre-execution plan without codegen annotations; the static plan
    # shows the codegen spans we assert. (Engine sessions keep AQE on.)
    spark = build_session(app="explain-audit",
                          extra_conf={"spark.sql.adaptive.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    lines = ["# EXPLAIN audit — physical-plan facts for the headline queries",
             "",
             f"Generated by tools/explain_audit.py (sf_dir={sf_dir}).",
             "Each row asserts plan properties that must hold for the",
             "100 TB deployment: pushdown reaches the parquet scan, small",
             "dimensions broadcast, hot expressions stay inside",
             "whole-stage codegen.", "",
             "| query | plan fact | present |", "|---|---|---|"]

    all_ok = True
    plans = {}
    for name, facts in AUDITS:
        df = EQ.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        plans[name] = plan
        for fact in facts:
            if fact.startswith("!"):
                ok = fact[1:] not in plan
                lines.append(f"| {name} | no `{fact[1:]}` | "
                             f"{'YES' if ok else '**VIOLATED**'} |")
            else:
                ok = fact in plan
                lines.append(f"| {name} | `{fact}` | "
                             f"{'YES' if ok else '**MISSING**'} |")
            all_ok &= ok

    plan, ncols, pushed = column_pruning_check(spark, sf_dir)
    lines += ["", "## Column pruning / predicate pushdown probe", "",
              "2-column projection with a quantity filter over lineitem:",
              f"- parquet ReadSchema column count: **{ncols}** (expect 2)",
              f"- filter pushed to scan: **{'YES' if pushed else 'NO'}**"]
    all_ok &= (ncols == 2) and pushed

    lines += ["", "## Shuffle inventory (radius_join probe path)", "",
              "The broadcast-index probe (`joins.radius_join`) plans zero",
              "shuffles on the point side — `mapInArrow` over the scan —",
              "verified by the absence of `Exchange` below the probe:", ""]
    buf = io.StringIO()
    from barefoot_spark import roads
    from barefoot_spark.index import RoadIndex
    from barefoot_spark.operators import joins as J
    idx_bc = spark.sparkContext.broadcast(RoadIndex(roads.micro7_pdf(), res=15))
    pts = spark.range(1000).select(
        F.col("id").alias("point_id"),
        (F.lit(48.0) + F.col("id") % 100 / 10000.0).alias("lat"),
        (F.lit(11.0) + F.col("id") % 97 / 10000.0).alias("lon"))
    with redirect_stdout(buf):
        J.radius_join(pts, idx_bc, 200.0).explain("formatted")
    probe_plan = buf.getvalue()
    n_exchange = probe_plan.count("Exchange")
    lines.append(f"`Exchange` operators in probe plan: **{n_exchange}** (expect 0)")
    all_ok &= n_exchange == 0

    lines += ["", """## Materialization strategy (fault tolerance at cluster scale)

The shared-subtree materializations in `minhash_dedup`, `simhash_dedup`
and the bucketed DBCAN segmentation are parameterized via
`ckpt.materialize(df, mode, runner, stage)`:

- `mode="local"` (default, single-JVM optimal): eager `localCheckpoint`
  — lineage truncated onto executor-local blocks, GC-reclaimed, no
  cache-entry leak. NOT fault-tolerant: on a real cluster, losing an
  executor after the checkpoint kills the job because the truncated
  lineage cannot recompute the lost blocks.
- `mode="reliable"` (production): parquet commit through
  `ckpt.StageRunner.run_stage` — survives executor loss (tasks re-read
  committed files), records per-partition lineage + metrics rows, and
  re-running the same stage resumes from the committed output.

`tests/test_datapipe.py::test_materialize_reliable_equals_local` proves
both modes return identical rows for all three operators."""]
    lines += ["", f"## Verdict: {'ALL FACTS HOLD' if all_ok else 'VIOLATIONS PRESENT'}",
              "", "<details><summary>Full formatted plans</summary>", ""]
    for name, plan in plans.items():
        lines += [f"### {name}", "```", plan.strip()[:4000], "```", ""]
    lines += [probe_plan and "### radius_join probe", "```",
              probe_plan.strip()[:3000], "```", "</details>", ""]

    with open("/root/repo/EXPLAIN.md", "w") as f:
        f.write("\n".join(lines))
    print(f"EXPLAIN.md written; all_ok={all_ok}")
    spark.stop()


if __name__ == "__main__":
    main()
