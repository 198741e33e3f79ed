"""Checkpoint/lineage/resume tests: stage skip on re-run, metrics rows,
partition-granular resume, cross-run checksum equality."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from barefoot_spark.ckpt import StageRunner
from barefoot_spark.operators import tiles as T


@pytest.fixture()
def points_df(spark):
    pdf = pd.DataFrame({
        "point_id": np.arange(2000),
        "lat": np.random.default_rng(1).uniform(5, 80, 2000),
        "lon": np.random.default_rng(2).uniform(-170, 170, 2000),
    })
    return spark.createDataFrame(pdf)


def test_stage_resume_skips(spark, points_df, tmp_path):
    runner = StageRunner(spark, str(tmp_path))
    calls = []

    def build():
        calls.append(1)
        return T.assign_tiles(points_df, res=14)

    out1 = runner.run_stage("tiles", build)
    assert out1.count() == 2000
    assert len(calls) == 1
    out2 = runner.run_stage("tiles", build)   # resume: no rebuild
    assert len(calls) == 1
    assert out2.count() == 2000

    m = runner.metrics().toPandas()
    assert set(m["stage"]) == {"tiles"}
    assert m["output_rows"].sum() == 2000
    assert m["checksum"].notna().all()


def test_checksum_stable_across_parallelism(spark, points_df, tmp_path):
    r1 = StageRunner(spark, str(tmp_path / "a"))
    r2 = StageRunner(spark, str(tmp_path / "b"))
    df1 = T.assign_tiles(points_df.coalesce(1), res=14)
    df4 = T.assign_tiles(points_df.repartition(7), res=14)
    r1.run_stage("tiles", lambda: df1)
    r2.run_stage("tiles", lambda: df4)
    c1 = r1.stage_checksum("tiles")
    c2 = r2.stage_checksum("tiles")
    assert c1 == c2  # identical tile assignments at any parallelism


def test_stage_runner_scheme_qualified_uri(spark, points_df, tmp_path):
    """Completion/manifest probes must go through the Hadoop FS API, not
    os.path: a scheme-qualified base (here file:, standing in for
    hdfs://—s3a:// on a cluster) must still detect completed stages and
    resume instead of recomputing. os.path.exists('file:/...') is False
    on every POSIX driver, which is exactly the silent-recompute bug
    this guards against."""
    base = "file:" + str(tmp_path / "sch")
    runner = StageRunner(spark, base)
    calls = []

    def build():
        calls.append(1)
        return T.assign_tiles(points_df, res=14)

    out1 = runner.run_stage("tiles", build)
    assert out1.count() == 2000
    assert runner.is_complete("tiles")
    # a FRESH runner over the same URI resumes (no driver-local state)
    runner2 = StageRunner(spark, base)
    out2 = runner2.run_stage("tiles", build)
    assert len(calls) == 1
    assert out2.count() == 2000
    # scheme-aware joins: outputs actually landed under the URI
    assert (tmp_path / "sch" / "tiles" / "_SUCCESS").exists()


def test_partitioned_resume_string_key(spark, tmp_path):
    """run_partitioned_stage with a STRING partition key (the
    documented H3-prefix-string use case): the manifest schema must
    derive from the key column type, not assume long."""
    pdf = pd.DataFrame({"point_id": np.arange(40),
                        "pfx": [f"cell{i % 4}" for i in range(40)]})
    df = spark.createDataFrame(pdf)
    runner = StageRunner(spark, "file:" + str(tmp_path / "sk"))
    calls = []

    def transform(d):
        calls.append(d.select("pfx").distinct().count())
        return d.withColumn("flag", F.lit(1))

    out1 = runner.run_partitioned_stage("s", df, "pfx", transform)
    assert out1.count() == 40 and calls == [4]
    out2 = runner.run_partitioned_stage("s", df, "pfx", transform)
    assert out2.count() == 40 and calls == [4]   # full resume
    extra = spark.createDataFrame(pd.DataFrame(
        {"point_id": [99], "pfx": ["cell9"]}))
    out3 = runner.run_partitioned_stage("s", df.unionByName(extra),
                                        "pfx", transform)
    assert out3.count() == 41 and calls == [4, 1]
    keys = {r[0] for r in runner.completed_keys("s").collect()}
    assert keys == {"cell0", "cell1", "cell2", "cell3", "cell9"}


def test_partitioned_resume(spark, points_df, tmp_path):
    runner = StageRunner(spark, str(tmp_path))
    tiled = T.assign_tiles(points_df, res=14, parent_res=2)

    seen_batches = []

    def transform(df):
        seen_batches.append(df.select("cell_p2").distinct().count())
        return df.withColumn("flag", F.lit(1))

    out1 = runner.run_partitioned_stage("probe", tiled, "cell_p2", transform)
    total = out1.count()
    assert total == 2000
    n_keys_first = seen_batches[0]

    # resume: everything done -> transform not called again
    out2 = runner.run_partitioned_stage("probe", tiled, "cell_p2", transform)
    assert len(seen_batches) == 1
    assert out2.count() == 2000

    # new data in a fresh partition key is processed incrementally
    # (points_df is northern-hemisphere only, so a southern point
    # lands in a parent cell with no completed manifest entry)
    extra = spark.createDataFrame(pd.DataFrame({
        "point_id": [99999], "lat": [-85.0], "lon": [0.1]}))
    tiled2 = T.assign_tiles(extra, res=14, parent_res=2).unionByName(tiled)
    out3 = runner.run_partitioned_stage("probe", tiled2, "cell_p2", transform)
    assert len(seen_batches) == 2
    assert seen_batches[1] <= n_keys_first  # only the missing key(s)
