"""Runtime bloom-filter injection: rewrite fires for selective shuffle
joins and never changes the answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.plans.runtime_filters import (
    enable_runtime_bloom,
    has_runtime_bloom,
)


def _join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(30,4)"))
            .cast("double")
            .alias("qty"),
        )
    )


def test_bloom_filter_injected_for_shuffle_join(spark, sf_dir):
    with enable_runtime_bloom(spark):
        # force a shuffle join: a broadcastable build side makes the
        # bloom filter pointless and Spark correctly skips it
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = _join(spark, sf_dir)
            assert has_runtime_bloom(df)
            with_bloom = df.collect()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    plain = _join(spark, sf_dir).collect()
    assert sorted(map(tuple, with_bloom)) == sorted(map(tuple, plain))


def test_bloom_filter_skipped_for_broadcast_join(spark, sf_dir):
    """With broadcast available the build side ships whole — Spark
    must NOT pay for a redundant bloom filter."""
    with enable_runtime_bloom(spark):
        df = _join(spark, sf_dir)
        assert not has_runtime_bloom(df)
