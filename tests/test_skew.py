"""Salted aggregation equals plain aggregation; hot keys spread."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from barefoot_spark.operators import skew


@pytest.fixture()
def skewed(spark):
    # one mega-hot cell (80% of rows) + a long tail
    n = 50000
    rng = np.random.default_rng(3)
    keys = np.where(rng.random(n) < 0.8, 7, rng.integers(100, 200, n))
    pdf = pd.DataFrame({"cell": keys, "v": rng.integers(0, 1000, n)})
    return spark.createDataFrame(pdf)


def test_salted_agg_equals_plain(spark, skewed):
    plain = (skewed.groupBy("cell")
             .agg(F.count("v").alias("n"), F.sum("v").alias("s"),
                  F.min("v").alias("mn"), F.max("v").alias("mx"))
             .toPandas().sort_values("cell").reset_index(drop=True))
    salted = skew.salted_agg(
        skewed, ["cell"],
        {"n": ("count", "v"), "s": ("sum", "v"),
         "mn": ("min", "v"), "mx": ("max", "v")},
        salt_n=16).toPandas().sort_values("cell").reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, salted[plain.columns], check_dtype=False)


def test_top_key_share_and_salted_repartition(spark, skewed):
    share = skew.top_key_share(skewed, "cell")
    assert share > 0.7
    out = skew.salted_repartition(skewed, "cell", salt_n=16, num_partitions=16)
    # the hot key no longer sits in one partition
    sizes = (out.withColumn("pid", F.spark_partition_id())
             .filter(F.col("cell") == 7)
             .groupBy("pid").count().toPandas())
    assert len(sizes) >= 4
