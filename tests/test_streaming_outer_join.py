"""Pins the stream-stream LEFT OUTER join NULL-emission contract
that queries_streaming._oj_oracle() replays in batch SQL:

  1. global watermark = MIN over both sides' watermarks;
  2. NULL-emit iff left_time + join_window < wm (STRICT: a row whose
     match deadline equals the watermark stays in state);
  3. rows never crossing the threshold are censored (absent), not
     emitted;
  4. matched rows emit normally and never also produce a NULL row.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from pyspark.sql import functions as F

T0 = dt.datetime(2020, 1, 1)


def _t(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


_sinks = iter(range(10**6))


def _run_outer(spark, rows):
    """10s join window, 5s watermark delay both sides; rows land in
    one data file followed by two empty heartbeats."""
    staging = tempfile.mkdtemp(prefix="oj_pin_")
    try:
        batches = [rows, [], []]
        for i, batch in enumerate(batches):
            tmp = tempfile.mkdtemp()
            spark.createDataFrame(
                batch, "ts timestamp_ntz, typ string, k string, u bigint"
            ).coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(
                f for f in os.listdir(tmp) if f.endswith(".parquet")
            )
            dst = os.path.join(staging, f"{i:03d}.parquet")
            shutil.copy(os.path.join(tmp, part), dst)
            os.utime(dst, (1_000_000_000 + 60 * i, 1_000_000_000 + 60 * i))
            shutil.rmtree(tmp, ignore_errors=True)

        schema = spark.read.parquet(staging).schema
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
            .withColumn("event_time", F.col("ts").cast("timestamp"))
        )
        left = (
            s.filter(F.col("typ") == "click")
            .select(
                F.col("k").alias("ck"),
                F.col("u").alias("cu"),
                F.col("event_time").alias("ct"),
            )
            .withWatermark("ct", "5 seconds")
        )
        right = (
            s.filter(F.col("typ") == "purchase")
            .select(
                F.col("k").alias("pk"),
                F.col("u").alias("pu"),
                F.col("event_time").alias("pt"),
            )
            .withWatermark("pt", "5 seconds")
        )
        j = left.join(
            right,
            (F.col("cu") == F.col("pu"))
            & (F.col("pt") >= F.col("ct"))
            & (F.col("pt") <= F.col("ct") + F.expr("INTERVAL 10 SECONDS")),
            "leftOuter",
        )
        name = f"oj_pin_sink_{next(_sinks)}"
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                j.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .start()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return {
            r["ck"]: r["pk"]
            for r in spark.sql(f"SELECT ck, pk FROM {name}").collect()
        }
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def test_null_emission_boundary_and_censoring(spark):
    # click max 95 -> left wm 90; purchase max 200 -> right wm 195;
    # GLOBAL wm = min = 90.
    out = _run_outer(
        spark,
        [
            (_t(79), "click", "c_flush", 1),  # 79+10=89 < 90: NULL row
            (_t(80), "click", "c_boundary", 1),  # 80+10=90 == 90: held
            (_t(81), "click", "c_held", 1),  # 91 > 90: held
            (_t(95), "click", "c_wm_setter", 1),  # sets left max
            (_t(200), "purchase", "p_far", 2),  # sets right max; no match
        ],
    )
    assert out == {"c_flush": None}, out
    # c_boundary present would mean the eviction boundary went
    # inclusive; c_held/c_wm_setter present would mean censoring broke.
    # Only the strictly-expired row appears — rule 2 and 3.


def test_matched_rows_do_not_also_null_emit(spark):
    out = _run_outer(
        spark,
        [
            (_t(0), "click", "c_matched", 1),
            (_t(5), "purchase", "p_match", 1),
            (_t(20), "click", "c_unmatched", 1),  # 30 < wm: NULL row
            (_t(100), "click", "c_max", 1),  # left max 100 -> wm 95
            (_t(100), "purchase", "p_max", 2),  # right max 100 -> wm 95
        ],
    )
    assert out["c_matched"] == "p_match"
    assert out["c_unmatched"] is None
    assert "c_max" not in out  # deadline 110 > 95: censored


def test_global_watermark_is_min_of_both_sides(spark):
    # left wm would be 195 alone, but right max 30 drags global to 25:
    # a click with deadline 35 > 25 must stay censored even though the
    # left side's own watermark passed it long ago.
    out = _run_outer(
        spark,
        [
            (_t(25), "click", "c_old", 1),  # 35 > 25: held
            (_t(0), "click", "c_ancient", 1),  # 10 < 25: NULL row
            (_t(200), "click", "c_left_max", 1),
            (_t(30), "purchase", "p_right_max", 2),
        ],
    )
    assert out == {"c_ancient": None}, out
