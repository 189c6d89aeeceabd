"""SQL-surface contract (SURVEY §7.0): every stage output is a
DataFrame, so every stage output is SQL-registerable — the engine is
an analytics engine reachable from plain ``spark.sql``, not only a
DataFrame library.

These tests register the synthetic tables as temp views via
``register_views`` and run registry queries through ``spark.sql``:
for `pricing_summary` and `join_enrichment` the DuckDB oracle text is
itself valid Spark SQL, so the EXACT oracle string runs on Spark and
must reproduce the DataFrame-API result bit-for-bit; the anti-join
uses Spark's `LEFT ANTI JOIN` spelling of the oracle's `ANTI JOIN`.
"""

from __future__ import annotations

from nbody6_data_pipeline_spark.queries import (
    register_views,
    registry,
)


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_register_views_exposes_all_tables(spark, sf_dir):
    register_views(spark, sf_dir)
    for t in ("region", "lineitem", "documents", "embeddings"):
        assert spark.sql(f"SELECT * FROM {t} LIMIT 1").count() >= 0
    n = spark.sql("SELECT COUNT(*) AS n FROM nation").collect()[0]["n"]
    assert n > 0


def test_oracle_sql_runs_on_spark_pricing_summary(spark, sf_dir):
    register_views(spark, sf_dir)
    reg = registry()
    api = _rows(reg["pricing_summary"]["spark"](spark, sf_dir))
    sql = _rows(spark.sql(reg["pricing_summary"]["oracle"]))
    assert api == sql


def test_oracle_sql_runs_on_spark_join_enrichment(spark, sf_dir):
    register_views(spark, sf_dir)
    reg = registry()
    api = _rows(reg["join_enrichment"]["spark"](spark, sf_dir))
    sql = _rows(spark.sql(reg["join_enrichment"]["oracle"]))
    assert api == sql


def test_spark_sql_anti_join_matches_api(spark, sf_dir):
    register_views(spark, sf_dir)
    reg = registry()
    api = _rows(reg["anti_join_missing"]["spark"](spark, sf_dir))
    sql = _rows(
        spark.sql(
            """
            SELECT c.c_custkey, c.c_name
            FROM customer c
            LEFT ANTI JOIN orders o ON c.c_custkey = o.o_custkey
            ORDER BY c.c_custkey
            """
        )
    )
    assert api == sql


def test_query_outputs_are_registerable(spark, sf_dir):
    # A registry query's OUTPUT becomes a view other SQL can build on —
    # the "stage output is SQL-registerable" half of the contract.
    register_views(spark, sf_dir, queries=("pricing_summary",))
    total = spark.sql(
        "SELECT SUM(count_order) AS n FROM q_pricing_summary"
    ).collect()[0]["n"]
    li = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
    assert total == li
