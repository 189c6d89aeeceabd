"""Bucketed-table layout for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-to-fact join (lineitem x orders,
snapshots x alignment, doc-grams x doc-grams) is the shuffle of both
sides on the join key. Bucketing amortizes that shuffle into the
WRITE: `bucketBy(n, key)` hash-partitions each side into the same n
buckets on disk, so every subsequent join/aggregation on that key is
planned without an Exchange — Spark reads bucket i of both sides into
the same task (SortMergeJoin with no shuffle, or bucket-local hash
aggregation).

This module is the engine's materialization layer for repeatedly
joined tables (the reference re-reads and re-merges its per-run CSV
caches on every analysis pass — reference utils.py:57-76,
collect_simulation_stats.py:171-199 — which is exactly the workload
bucketing exists for).

Bucketed tables require the session catalog (`saveAsTable`), since
bucket metadata lives in the metastore. `spark.sql.sources.v2.bucketing`
and AQE coexist: Spark keeps the no-shuffle plan when both sides'
bucket counts match (or one divides the other with
spark.sql.bucketing.coalesceBucketsInJoin.enabled).

Verification: tests/test_bucketing.py asserts the physical plan of a
bucketed self-join / join contains NO Exchange on the bucketed key,
and that results match the unbucketed plan exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 16,
    sort: bool = True,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (and optionally sorted)
    parquet table. Sorting within buckets lets SortMergeJoin skip its
    sort as well — the join becomes a pure streaming merge of
    pre-sorted bucket files."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan —
    the quantity bucketing is supposed to drive to zero for key-joins.
    Exposed so tests and plan audits can assert on it."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
