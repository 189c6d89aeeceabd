"""Bucketed-layout tests: the join that shuffles nothing.

Proves the scale claim, not just the API: joining two tables bucketed
on the join key plans ZERO shuffle Exchanges, while the same join on
plain parquet plans at least one per side — and both produce
identical rows.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.plans.bucketing import (
    exchange_count,
    read_table,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(
        orders, "b_orders", "o_orderkey", n_buckets=8,
        path=str(base / "orders"),
    )
    write_bucketed(
        lineitem, "b_lineitem", "l_orderkey", n_buckets=8,
        path=str(base / "lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _join(o, l):
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(30,4)"))
            .cast("double")
            .alias("qty"),
        )
    )


def test_bucketed_join_plans_no_shuffle(spark, sf_dir, bucketed):
    t_orders, t_lineitem = bucketed
    # autoBroadcastJoin would hide the point at this scale factor —
    # force the join strategy a fact-to-fact join uses at 100 TB
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed_join = _join(
            read_table(spark, t_orders), read_table(spark, t_lineitem)
        )
        assert exchange_count(bucketed_join) == 0, (
            bucketed_join._jdf.queryExecution().executedPlan().toString()
        )

        plain_join = _join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        )
        assert exchange_count(plain_join) >= 2  # one shuffle per side
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_same_answer(spark, sf_dir, bucketed):
    t_orders, t_lineitem = bucketed
    got = sorted(
        tuple(r)
        for r in _join(
            read_table(spark, t_orders), read_table(spark, t_lineitem)
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in _join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        ).collect()
    )
    assert got == want and len(got) > 0


def test_bucketed_aggregation_no_shuffle(spark, bucketed):
    """Aggregation on the bucket key also skips its Exchange: partial
    results per bucket ARE final (hash-partitioned layout)."""
    t_orders, _ = bucketed
    agg = (
        read_table(spark, t_orders)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert exchange_count(agg) == 0


def test_bucketed_corpus_index_antijoin(spark, sf_dir, tmp_path):
    """Pins corpus_pipeline's 100 TB claim: a fingerprint index
    bucketed on fp anti-joins a delta's fingerprints with ZERO
    Exchange on the index side — the index (the corpus-sized side)
    is never shuffled; only the delta-sized probe repartitions to
    match the bucketing."""
    from nbody6_data_pipeline_spark.corpus_pipeline import _tokenset_fp

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fps = docs.select("doc_id", _tokenset_fp().alias("fp"))
    spark.sql("DROP TABLE IF EXISTS b_fingerprints")
    write_bucketed(
        fps, "b_fingerprints", "fp", n_buckets=8,
        path=str(tmp_path / "fingerprints"),
    )
    delta_fps = docs.filter(F.col("doc_id") % 40 == 0).select(
        "doc_id", _tokenset_fp().alias("fp")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        survivors = delta_fps.join(
            read_table(spark, "b_fingerprints").select("fp"),
            "fp",
            "left_anti",
        )
        plan = (
            survivors._jdf.queryExecution().executedPlan().toString()
        )
        # exactly one Exchange: the delta probe repartitioning into
        # the index's bucketing; the index side scan is shuffle-free
        assert exchange_count(survivors) == 1, plan
        assert "Exchange hashpartitioning(fp" in plan
        # and the result is still correct: every delta fp is indexed
        assert survivors.count() == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_fingerprints")
