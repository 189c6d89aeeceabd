"""Validation-utility tests (pass and fail paths, SURVEY §5 item 4)."""

from __future__ import annotations

import pytest

from nbody6_data_pipeline_spark.operators.validate import (
    assert_no_nulls,
    assert_same_timestamps,
    assert_timestamps_consistent,
    assert_unique_key,
)


def test_no_nulls(spark):
    ok = spark.createDataFrame([(1, 2.0), (2, 3.0)], ["a", "b"])
    assert_no_nulls(ok)
    bad = spark.createDataFrame([(1, 2.0), (2, None)], ["a", "b"])
    with pytest.raises(ValueError, match="NULL/NaN"):
        assert_no_nulls(bad)
    nan = spark.createDataFrame([(1, float("nan"))], ["a", "b"])
    with pytest.raises(ValueError, match="NULL/NaN"):
        assert_no_nulls(nan)


def test_unique_key(spark):
    ok = spark.createDataFrame([(1, 1), (1, 2)], ["t", "n"])
    assert_unique_key(ok, ["t", "n"])
    with pytest.raises(ValueError, match="Duplicate"):
        assert_unique_key(
            spark.createDataFrame([(1, 1), (1, 1)], ["t", "n"]), ["t", "n"]
        )


def test_timestamps_consistent(spark):
    ok = spark.createDataFrame([(1.0, 1.01)], ["a", "b"])
    assert_timestamps_consistent(ok, [], "a", "b")
    with pytest.raises(ValueError, match="mismatch"):
        assert_timestamps_consistent(
            spark.createDataFrame([(1.0, 1.5)], ["a", "b"]), [], "a", "b"
        )


def test_same_timestamps(spark):
    ok = spark.createDataFrame(
        [("s1", 0.0), ("s1", 1.0), ("s2", 0.0), ("s2", 1.0)], ["s", "t"]
    )
    assert_same_timestamps(ok, "s", "t")
    with pytest.raises(ValueError, match="differ"):
        assert_same_timestamps(
            spark.createDataFrame([("s1", 0.0), ("s2", 1.0)], ["s", "t"]),
            "s",
            "t",
        )


def test_streaming_session_window(spark, sf_dir, tmp_path):
    import shutil

    from nbody6_data_pipeline_spark.streaming.events import (
        read_event_stream,
        session_event_counts,
    )

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "p.parquet")
    stream = read_event_stream(spark, str(d))
    agg = session_event_counts(stream, gap="30 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM t_sessions").collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)
