"""Distributed global ranking (operators/ranking.py): the exact-ntile
and global-row-number results must be IDENTICAL to the single-
partition window formulations they replace, for sizes that exercise
uneven tile splits, tie values, and bucket boundaries."""

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.ranking import (
    with_exact_ntile,
    with_global_row_number,
)


@pytest.mark.parametrize("n,tiles", [(1, 4), (7, 4), (40, 4), (103, 7)])
def test_exact_ntile_matches_window_ntile(spark, n, tiles):
    df = spark.range(n).select(
        (F.col("id") * 37 % 11).cast("double").alias("v"),  # heavy ties
        F.col("id").alias("k"),
    )
    got = {
        (r["k"]): r["bin"]
        for r in with_exact_ntile(df, ["v", "k"], tiles).collect()
    }
    want = {
        r["k"]: r["bin"]
        for r in df.select(
            "k", F.ntile(tiles).over(W.orderBy("v", "k")).alias("bin")
        ).collect()
    }
    assert got == want


def test_global_row_number_matches_window(spark):
    df = spark.range(257).select(
        (F.col("id") % 13).cast("double").alias("v"), F.col("id").alias("k")
    )
    ranked, total = with_global_row_number(df, ["v", "k"], n_buckets=8)
    assert total == 257
    got = {r["k"]: r["rn"] for r in ranked.collect()}
    want = {
        r["k"]: r["rn"]
        for r in df.select(
            "k", F.row_number().over(W.orderBy("v", "k")).alias("rn")
        ).collect()
    }
    assert got == want


def test_no_single_partition_window_in_plan(spark):
    df = spark.range(1000).select(
        F.col("id").cast("double").alias("v"), F.col("id").alias("k")
    )
    plan = (
        with_exact_ntile(df, ["v", "k"], 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
