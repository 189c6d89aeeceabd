"""Streaming incremental MV maintenance: per-batch partials, replay
idempotency, compaction — the view must always equal a full recompute
over every event streamed so far."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Row
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.streaming.maintenance import (
    compact,
    make_mv_processor,
    read_view,
    start_rollup_mv,
)

_DAY_US = 86_400_000_000


def _event_rows(day_type_values):
    # ts as epoch-NANOS longs (the LONG branch of queries.event_us);
    # midday so integer day extraction is unambiguous
    return [
        Row(
            event_id=i,
            ts=(d * _DAY_US + 12 * 3_600_000_000) * 1000,
            event_type=t,
            value=float(v),
        )
        for i, (d, t, v) in enumerate(day_type_values)
    ]


def _write_batch(spark, tmp_path, stream_dir, name, mtime, rows):
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / f"stage_{name}")
    )
    src = glob.glob(str(tmp_path / f"stage_{name}" / "part-*.parquet"))[0]
    dst = stream_dir / f"{name}.parquet"
    shutil.copy(src, dst)
    os.utime(dst, (mtime, mtime))


def _expected(spark, all_rows):
    return {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in spark.createDataFrame(all_rows)
        .select(
            (F.expr("ts div 1000") / F.lit(_DAY_US)).cast("long").alias("day"),
            "event_type",
            "value",
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }


def _view_dict(spark, out):
    return {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in read_view(spark, str(out)).collect()
    }


def test_mv_maintenance_matches_recompute(spark, tmp_path):
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    out = tmp_path / "mv"

    a = _event_rows([(0, "click", 1.5), (0, "view", 2.0), (1, "click", 0.25)])
    b = _event_rows([(0, "click", 4.5), (1, "view", 1.0)])
    c = _event_rows([(2, "purchase", 9.0), (1, "click", 0.5)])
    _write_batch(spark, tmp_path, stream_dir, "a", 1_000_000, a)
    _write_batch(spark, tmp_path, stream_dir, "b", 1_000_100, b)
    _write_batch(spark, tmp_path, stream_dir, "c", 1_000_200, c)

    schema = spark.read.parquet(str(stream_dir)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = start_rollup_mv(spark, stream, str(out))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert _view_dict(spark, out) == _expected(spark, a + b + c)
    # one partition per micro-batch in the partial log
    log = spark.read.parquet(str(out / "partials"))
    assert log.select("batch_id").distinct().count() == 3

    # compaction folds all but the NEWEST batch partition (which a
    # crash-replay may overwrite) without changing the view
    compact(spark, str(out))
    assert _view_dict(spark, out) == _expected(spark, a + b + c)
    log = spark.read.parquet(str(out / "partials"))
    assert {r.batch_id for r in log.select("batch_id").distinct().collect()} == {-1, 2}

    # a replay of the newest batch after compaction must not double-count
    proc = make_mv_processor(str(out))
    proc(spark.createDataFrame(c), batch_id=2)
    assert _view_dict(spark, out) == _expected(spark, a + b + c)

    # a post-compaction batch lands next to the compacted partition
    d = _event_rows([(3, "view", 4.0), (0, "click", 1.0)])
    proc(spark.createDataFrame(d), batch_id=7)
    assert _view_dict(spark, out) == _expected(spark, a + b + c + d)

    # second compaction folds {-1, 2} into generation -2 and keeps 7
    compact(spark, str(out))
    assert _view_dict(spark, out) == _expected(spark, a + b + c + d)
    log = spark.read.parquet(str(out / "partials"))
    assert {r.batch_id for r in log.select("batch_id").distinct().collect()} == {-2, 7}


def test_mv_compaction_crash_windows(spark, tmp_path):
    """A compaction interrupted in either crash window must never
    change the view: pre-commit leaves a staging dir (inputs
    authoritative), post-commit leaves folded inputs on disk (the
    committed generation's manifest excludes them)."""
    out = tmp_path / "mv"
    proc = make_mv_processor(str(out))
    a = _event_rows([(0, "click", 1.0), (1, "view", 2.0)])
    b = _event_rows([(0, "click", 3.0)])
    c = _event_rows([(2, "purchase", 7.0)])
    for i, rows in enumerate([a, b, c]):
        proc(spark.createDataFrame(rows), batch_id=i)
    want = _expected(spark, a + b + c)

    # pre-commit crash: a stale staging dir must be invisible to
    # read_view and garbage-collected by the next compact
    log_dir = out / "partials"
    stale = log_dir / "_tmp_compact99"
    stale.mkdir()
    (stale / "junk.txt").write_text("leftover")
    assert _view_dict(spark, out) == want

    compact(spark, str(out))  # folds {0, 1}, keeps 2; GCs the staging dir
    assert not stale.exists()
    assert _view_dict(spark, out) == want
    log = spark.read.parquet(str(log_dir))
    assert {r.batch_id for r in log.select("batch_id").distinct().collect()} == {-1, 2}

    # post-commit crash: recreate a folded input (partition 0 exists
    # again while generation -1's manifest lists it). read_view must
    # exclude it; the next compact must delete it without folding it.
    proc(spark.createDataFrame(a), batch_id=0)
    assert _view_dict(spark, out) == want
    proc(spark.createDataFrame(c), batch_id=3)  # growth so compact has work
    compact(spark, str(out))  # GC deletes stale 0; folds {-1, 2}; keeps 3
    assert not (log_dir / "batch_id=0").exists()
    assert _view_dict(spark, out) == _expected(spark, a + b + c + c)


def test_mv_compact_guards(spark, tmp_path):
    """compact() is a no-op (no exception) on a missing log dir, an
    empty log dir, and a single-partition log."""
    out = tmp_path / "mv"
    compact(spark, str(out))  # log dir never created
    (out / "partials").mkdir(parents=True)
    compact(spark, str(out))  # exists but empty
    proc = make_mv_processor(str(out))
    proc(spark.createDataFrame(_event_rows([(0, "click", 1.0)])), batch_id=0)
    compact(spark, str(out))  # one partition: nothing to fold
    assert _view_dict(spark, out) == _expected(
        spark, _event_rows([(0, "click", 1.0)])
    )


def test_mv_replay_idempotent(spark, tmp_path):
    out = tmp_path / "mv"
    proc = make_mv_processor(str(out))
    a = _event_rows([(0, "click", 1.0), (1, "view", 2.0)])
    b = _event_rows([(1, "view", 5.0)])
    proc(spark.createDataFrame(a), batch_id=0)
    proc(spark.createDataFrame(b), batch_id=1)
    # crash recovery: batch 1 re-runs — must replace, not double-count
    proc(spark.createDataFrame(b), batch_id=1)
    assert _view_dict(spark, out) == _expected(spark, a + b)
