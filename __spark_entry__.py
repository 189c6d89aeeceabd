"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over nbody6_data_pipeline_spark.queries — the engine's
query registry. Each registry entry pairs a Spark DataFrame
implementation (SURVEY.md §2 operator) with an equivalent DuckDB
oracle SQL string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The A2/A3 scoped-aggregation pattern (TPC-H-Q1-shaped pricing
    summary) — the engine's minimum end-to-end slice (SURVEY §7.1).
    """
    from nbody6_data_pipeline_spark.queries import registry

    return registry()["pricing_summary"]["spark"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from nbody6_data_pipeline_spark.queries import registry

    return {name: spec["spark"] for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    non-SQL-expressible ops — driver records a rows-only check)."""
    from nbody6_data_pipeline_spark.queries import registry

    return {
        name: spec["oracle"]
        for name, spec in registry().items()
        if spec["oracle"] is not None
    }
