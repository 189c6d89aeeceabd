"""Streaming quality gate: promote-or-quarantine routing, report log,
replay idempotency."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.streaming.quality import make_quality_gate


def _checks():
    return {
        "null_text": F.col("text").isNull(),
        "short_text": F.length(F.coalesce(F.col("text"), F.lit(""))) < 3,
    }


def test_gate_routes_and_reports(spark, tmp_path):
    base = str(tmp_path / "gate")
    gate = make_quality_gate(base, _checks(), max_violation_rate=0.2)

    clean = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(20)], ["doc_id", "text"]
    )
    poisoned = spark.createDataFrame(
        [(i, None if i % 2 else f"doc {i}") for i in range(20)],
        ["doc_id", "text"],
    )
    gate(clean, 0)
    gate(poisoned, 1)

    acc = spark.read.parquet(os.path.join(base, "accepted"))
    quar = spark.read.parquet(os.path.join(base, "quarantine"))
    rep = spark.read.parquet(os.path.join(base, "reports"))

    assert acc.count() == 20
    assert set(r["batch_id"] for r in acc.select("batch_id").collect()) == {0}
    assert quar.count() == 20
    assert set(r["batch_id"] for r in quar.select("batch_id").collect()) == {1}
    # reports for both batches, with the null check hot on batch 1
    got = {
        (r["batch_id"], r["check_name"]): r["n_violations"]
        for r in rep.collect()
    }
    assert got[(0, "null_text")] == 0
    assert got[(1, "null_text")] == 10


def test_gate_replay_idempotent(spark, tmp_path):
    base = str(tmp_path / "gate")
    gate = make_quality_gate(base, _checks(), max_violation_rate=0.2)
    batch = spark.createDataFrame(
        [(i, f"steady document {i}") for i in range(10)], ["doc_id", "text"]
    )
    gate(batch, 7)
    gate(batch, 7)  # foreachBatch crash-replay re-sends the batch id
    acc = spark.read.parquet(os.path.join(base, "accepted"))
    assert acc.count() == 10  # replaced, not duplicated
    rep = spark.read.parquet(os.path.join(base, "reports"))
    assert rep.filter(F.col("batch_id") == 7).count() == len(_checks())
