"""Structured Streaming smoke + multimodal plumbing tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    fake_decode,
    frame_sample_plan,
)
from nbody6_data_pipeline_spark.streaming.events import (
    read_event_stream,
    run_stream_to_memory,
    windowed_event_counts,
)


def test_streaming_windowed_counts(spark, sf_dir, tmp_path):
    # file-stream sources need a DIRECTORY of files
    import shutil

    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-000.parquet")
    stream = read_event_stream(spark, str(stream_dir))
    assert stream.isStreaming
    agg = windowed_event_counts(stream, window="6 hours")
    out = run_stream_to_memory(spark, agg, name="t_events_agg")
    rows = out.collect()
    assert len(rows) > 0
    total = sum(r["n_events"] for r in rows)
    # stream total matches the batch count over the same files
    batch_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == batch_n


def test_multimodal_feature_extraction(spark):
    data = [
        (1, "image", bytes(range(64)), 8, 8, None),
        (2, "audio", b"\xff" * 32, None, None, 2000),
        (3, "video", b"\x01\x02\x03\x04" * 100, 16, 16, 3500),
    ]
    media = spark.createDataFrame(data, MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert set(feats) == {1, 2, 3}
    assert all(len(v) == FEATURE_DIM for v in feats.values())
    # deterministic fake decode matches the local computation
    want = fake_decode(bytes(range(64)), "image")
    assert feats[1] == pytest.approx(want.tolist(), rel=1e-12)


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [(3, "video", None, 16, 16, 3500), (4, "image", None, 1, 1, None)],
        MEDIA_SCHEMA,
    )
    plan = frame_sample_plan(media, every_ms=1000).collect()
    # 3500ms at 1000ms cadence -> 3 frames; images excluded
    assert {(r["media_id"], r["frame_idx"], r["offset_ms"]) for r in plan} == {
        (3, 0, 0), (3, 1, 1000), (3, 2, 2000),
    }
