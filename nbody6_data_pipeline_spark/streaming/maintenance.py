"""Streaming incremental materialized-view maintenance.

The streaming counterpart of `queries_cdc.q_events_incremental_rollup`:
a daily per-type rollup is kept as ALGEBRAIC PARTIALS (count + exact
decimal sum) in a parquet-backed partial log; each micro-batch appends
only ITS OWN partials — the base data is never re-read, and reading
the view is a re-aggregation of the (tiny) partial log.

Exactly-once without a transactional sink: partials are written
partitioned by batch_id with dynamic partition overwrite, so a
replayed batch (foreachBatch re-runs the last batch id after crash
recovery) REPLACES its own partition instead of double-counting —
same recovery contract as streaming/ingest.py.

Compaction: the partial log grows by one partition per micro-batch;
`compact()` folds all partitions into a single consolidated partial
set under a reserved batch id. Because count and decimal-sum are
algebraic, compaction is itself just the merge — no access to raw
events — and the view's value is unchanged (test-asserted).

At 100 TB the partial log is partitioned by (batch_id) and tiny
relative to the corpus (one row per (day, type) per batch); the view
read touches no raw data at all. This is the lakehouse MV-maintenance
design (Delta/Iceberg incremental refresh) expressed on plain parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["make_mv_processor", "start_rollup_mv", "read_view", "compact"]

_DAY_US = 86_400_000_000
_COMPACTED_BATCH_ID = -1


def _partials(batch_df: DataFrame) -> DataFrame:
    """Per-batch algebraic partials of the daily per-type rollup.
    Decimal sum so partials merge losslessly in any order/grouping."""
    from nbody6_data_pipeline_spark.queries import event_us

    return (
        batch_df.select(
            (event_us(batch_df) / F.lit(_DAY_US)).cast("long").alias("day"),
            "event_type",
            "value",
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("p_n"),
            # sum(decimal(30,6)) widens to decimal(38,6); pin it so every
            # log partition (batch or compacted) has one physical type
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("decimal(38,6)")
            .alias("p_sum"),
        )
    )


def make_mv_processor(out_base: str):
    """foreachBatch function: aggregate THIS batch to partials and
    write them under the batch's own partition (dynamic overwrite =>
    crash-replay idempotent)."""
    log_dir = os.path.join(out_base, "partials")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                _partials(batch_df)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(log_dir)
            )
        finally:
            if prev is None:
                s.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return process_batch


def start_rollup_mv(spark: SparkSession, stream: DataFrame, out_base: str):
    """Attach the MV maintainer to an event stream and start it."""
    return (
        stream.writeStream.foreachBatch(make_mv_processor(out_base))
        .option("checkpointLocation", os.path.join(out_base, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def read_view(spark: SparkSession, out_base: str) -> DataFrame:
    """Merge-on-read: fold the partial log into the current view. The
    decimal partial sums re-merge exactly, so this equals a full
    recompute over every event ever streamed (test-asserted)."""
    log = spark.read.parquet(os.path.join(out_base, "partials"))
    return (
        log.groupBy("day", "event_type")
        .agg(
            F.sum("p_n").alias("n_events"),
            F.sum("p_sum").cast("double").alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


def compact(spark: SparkSession, out_base: str) -> None:
    """Fold log partitions into one consolidated partial set under the
    reserved batch id. Pure partial-merge — raw events are never
    touched.

    Crash-replay safety: foreachBatch may RE-RUN the highest batch id
    after a recovery (its partition write landed but the checkpoint
    commit did not), so the newest batch partition is EXCLUDED from
    the fold — a replay then overwrites that partition in place and
    nothing is double-counted. The rewrite also deletes exactly the
    partitions it read (snapshot taken up front), so a batch partition
    written concurrently is never dropped. The merged read is staged
    through a localCheckpoint so it completes before its inputs are
    removed."""
    import re
    import shutil

    log_dir = os.path.join(out_base, "partials")
    part_dirs = {
        int(m.group(1)): os.path.join(log_dir, d)
        for d in os.listdir(log_dir)
        for m in [re.match(r"batch_id=(-?\d+)$", d)]
        if m
    }
    newest = max(part_dirs)
    fold_ids = [b for b in part_dirs if b != newest]
    if len(fold_ids) < 2:
        return  # nothing to gain
    merged = (
        spark.read.parquet(*[part_dirs[b] for b in fold_ids])
        .groupBy("day", "event_type")
        .agg(
            F.sum("p_n").alias("p_n"),
            # back to the log's exact partial type: a different decimal
            # width would make future batch partitions schema-incompatible
            F.sum("p_sum").cast("decimal(38,6)").alias("p_sum"),
        )
        .localCheckpoint()
    )
    merged.write.mode("overwrite").parquet(
        os.path.join(log_dir, f"batch_id={_COMPACTED_BATCH_ID}")
    )
    for b in fold_ids:
        if b != _COMPACTED_BATCH_ID:
            shutil.rmtree(part_dirs[b])
