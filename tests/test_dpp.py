"""Dynamic partition pruning (DPP) evidence: a hive-partitioned fact
joined on its partition column to a selectively-filtered dimension
must prune fact directories AT RUNTIME from the dim-side values —
the mechanism that makes star-schema joins over a date-partitioned
100 TB fact read only the qualifying days. The static-pruning analogue
for this engine's layouts is tests/test_vector_index.py (planning-time
PartitionFilters); this pins the RUNTIME variant Spark inserts as a
dynamicpruning subquery on the scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def partitioned_fact(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dpp_fact"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        li.withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("ship_month")
        .parquet(out)
    )
    return out


def test_dim_filter_prunes_fact_partitions_at_runtime(
    spark, partitioned_fact
):
    fact = spark.read.parquet(partitioned_fact)
    months = sorted(
        r["ship_month"]
        for r in fact.select("ship_month").distinct().collect()
        if r["ship_month"] is not None
    )
    assert len(months) > 4, "fixture needs several partitions"
    # dimension with a selective filter on the join (=partition) column
    dim = (
        fact.select("ship_month")
        .distinct()
        .filter(F.col("ship_month").isin(months[:2]))
    )
    joined = fact.join(dim, "ship_month").groupBy("ship_month").count()

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "no dynamic-pruning subquery on the fact scan — the join would "
        "read every partition of a 100 TB fact:\n" + plan[:2000]
    )

    # and the pruning is real: the fact scan touches only the 2
    # qualifying month directories' files
    rows = joined.collect()
    assert {r["ship_month"] for r in rows} == set(months[:2])
    # input_file_name must be projected BEFORE the join (it rejects
    # multi-source plans); the scan under it still carries the
    # dynamic-pruning subquery
    touched = (
        fact.select(
            "ship_month", F.input_file_name().alias("f")
        )
        .join(dim, "ship_month")
        .select("f")
        .distinct()
        .count()
    )
    total = fact.select(F.input_file_name()).distinct().count()
    assert touched < total, (touched, total)


def test_dpp_results_match_static_filter(spark, partitioned_fact):
    """The DPP'd join must return exactly what a statically-pruned
    filter returns — runtime pruning is an optimization, never a
    semantics change."""
    fact = spark.read.parquet(partitioned_fact)
    months = sorted(
        r["ship_month"]
        for r in fact.select("ship_month").distinct().collect()
        if r["ship_month"] is not None
    )[:2]
    dim = (
        fact.select("ship_month").distinct().filter(
            F.col("ship_month").isin(months)
        )
    )
    via_join = {
        (r["ship_month"], r["count"])
        for r in fact.join(dim, "ship_month")
        .groupBy("ship_month")
        .count()
        .collect()
    }
    via_filter = {
        (r["ship_month"], r["count"])
        for r in fact.filter(F.col("ship_month").isin(months))
        .groupBy("ship_month")
        .count()
        .collect()
    }
    assert via_join == via_filter
