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


@pytest.mark.parametrize("state_provider", ["memory", "rocksdb"])
def test_streaming_first_event_dedup_multi_batch(spark, tmp_path, state_provider):
    """State must survive micro-batch boundaries: batch 2 carries an
    EARLIER event for an existing key (update emitted) and a duplicate
    later event (suppressed). Files are named so the source ingests
    them in order with maxFilesPerTrigger forcing separate triggers.

    Parametrized over both state-store backends: the default in-memory
    provider and RocksDB (the 100 TB-key-cardinality production path,
    VERDICT r2 next-round #5) — semantics must be identical."""
    from pyspark.sql import Row

    from nbody6_data_pipeline_spark.session import configure_state_store
    from nbody6_data_pipeline_spark.streaming.events import (
        first_event_dedup,
    )

    configure_state_store(spark, state_provider)

    stream_dir = tmp_path / "dedup_stream"
    stream_dir.mkdir()

    def write_batch(name, mtime, rows):
        import glob as g
        import os
        import shutil

        spark.createDataFrame(
            [
                Row(
                    event_id=i, ts=t * 1000, user_id=u,
                    event_type=e, value=1.0, props="{}",
                )
                for i, t, u, e in rows
            ]
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage_{name}")
        )
        src = g.glob(str(tmp_path / f"stage_{name}" / "part-*.parquet"))[0]
        dst = stream_dir / f"{name}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (mtime, mtime))  # deterministic ingest order

    # batch a: key (1,'x') first seen at ts_us=5000; key (2,'y') at 7000
    write_batch("a", 1_000_000, [(10, 5000, 1, "x"), (11, 7000, 2, "y")])
    # batch b: earlier event for (1,'x') -> improvement; later dup
    # for (2,'y') -> suppressed; new key (3,'z')
    write_batch(
        "b", 1_000_100,
        [(12, 3000, 1, "x"), (13, 9000, 2, "y"), (14, 1000, 3, "z")],
    )

    stream = read_event_stream(
        spark, str(stream_dir), max_files_per_trigger=1
    )
    dedup = first_event_dedup(stream)
    try:
        out = run_stream_to_memory(
            spark,
            dedup,
            name=f"t_first_dedup_{state_provider}",
            output_mode="update",
        )
    finally:
        configure_state_store(spark, "memory")
    emitted = [tuple(r) for r in out.orderBy("user_id", "first_ts_us").collect()]
    # final per-key min == batch dedup answer
    final = {
        (r[0], r[1]): (r[2], r[3])
        for r in out.groupBy("user_id", "event_type")
        .agg(F.min(F.struct("first_ts_us", "first_event_id")).alias("m"))
        .select("user_id", "event_type", "m.first_ts_us", "m.first_event_id")
        .collect()
    }
    assert final == {
        (1, "x"): (3000, 12),  # improved by batch b
        (2, "y"): (7000, 11),  # batch b duplicate suppressed
        (3, "z"): (1000, 14),
    }
    # the improvement for (1,'x') must have produced TWO emissions
    # (one per micro-batch) — proof the state crossed batch boundaries
    key1 = [e for e in emitted if e[0] == 1 and e[1] == "x"]
    assert len(key1) == 2


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


def test_streaming_dedup_event_time_expiry(spark, tmp_path):
    """Bounded-state dedup: with expire_after, once the watermark
    passes last-seen + TTL the key's state is dropped, so a duplicate
    arriving after expiry re-emits as a fresh first occurrence (and a
    duplicate arriving while the state is live stays suppressed)."""
    from pyspark.sql import Row

    from nbody6_data_pipeline_spark.streaming.events import (
        first_event_dedup,
    )

    stream_dir = tmp_path / "expiry_stream"
    stream_dir.mkdir()

    def write_batch(name, mtime, rows):
        import glob as g
        import os
        import shutil

        spark.createDataFrame(
            [
                Row(
                    event_id=i, ts=t * 1000, user_id=u,
                    event_type=e, value=1.0, props="{}",
                )
                for i, t, u, e in rows
            ]
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage_{name}")
        )
        src = g.glob(str(tmp_path / f"stage_{name}" / "part-*.parquet"))[0]
        dst = stream_dir / f"{name}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (mtime, mtime))

    H = 3_600_000_000  # 1 hour in us
    # batch a: key (1,'x') first at t=1h (off epoch 0: the initial
    # watermark is 0 and ts=0 would sit exactly on the late cutoff)
    write_batch("a", 1_000_000, [(10, H, 1, "x")])
    # batch b: far-future event for another key drives the watermark
    # (delay 1s) way past (1,'x')'s TTL of 1 hour
    write_batch("b", 1_000_100, [(20, 10 * H, 2, "y")])
    # batch c: watermark update lands; (1,'x') state times out here.
    # Include a LIVE duplicate for (2,'y') -> still suppressed.
    write_batch("c", 1_000_200, [(21, 10 * H + 1000, 2, "y")])
    # batch d: duplicate of (1,'x') AFTER expiry -> re-emitted
    write_batch("d", 1_000_300, [(11, 10 * H + 2000, 1, "x")])

    stream = read_event_stream(
        spark, str(stream_dir), max_files_per_trigger=1
    ).withWatermark("event_time", "1 second")
    dedup = first_event_dedup(stream, expire_after="1 hour")
    out = run_stream_to_memory(
        spark, dedup, name="t_dedup_expiry", output_mode="update"
    )
    rows = [tuple(r) for r in out.orderBy("first_ts_us").collect()]
    key1 = [r for r in rows if r[0] == 1]
    key2 = [r for r in rows if r[0] == 2]
    # (1,'x'): emitted at t=1h AND re-emitted after expiry
    assert [r[3] for r in key1] == [10, 11]
    # (2,'y'): first emission only; the live duplicate was suppressed
    assert [r[3] for r in key2] == [20]


def test_resize_media_plumbing(spark):
    from nbody6_data_pipeline_spark.operators.multimodal import (
        fake_resize,
        resize_media,
    )

    img = bytes(range(64))  # 8x8 grid
    data = [
        (1, "image", img, 8, 8, None),
        (2, "audio", b"\xff" * 32, None, None, 2000),  # must pass through
        (3, "image", b"\x10" * 100, None, None, None),  # unknown geometry
        (4, "image", None, 8, 8, None),  # NULL payload: metadata kept
    ]
    media = spark.createDataFrame(data, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_media(media, 4, 4).collect()}

    assert set(out) == {1, 2, 3, 4}  # nothing dropped
    # images with payloads get the new geometry
    for i in (1, 3):
        assert (out[i]["width"], out[i]["height"]) == (4, 4)
    # non-image rows pass through untouched — payload AND metadata
    assert bytes(out[2]["content"]) == b"\xff" * 32
    assert (out[2]["width"], out[2]["height"]) == (None, None)
    assert out[2]["duration_ms"] == 2000
    # NULL-payload image keeps its original claimed geometry
    assert out[4]["content"] is None
    assert (out[4]["width"], out[4]["height"]) == (8, 8)
    # deterministic stub matches the local computation, byte for byte
    assert bytes(out[1]["content"]) == fake_resize(img, 8, 8, 4, 4)
    assert len(out[1]["content"]) == 16
    # unknown-geometry branch still produces the proportional subsample
    assert bytes(out[3]["content"]) == fake_resize(b"\x10" * 100, None, None, 4, 4)


def test_pnm_codec_roundtrip_and_resize(spark):
    """The REAL codec path: binary PPM/PGM payloads decode, resample
    by nearest-neighbor, and re-encode — verified against an
    independent numpy computation, through the Spark plumbing."""
    import numpy as np

    from nbody6_data_pipeline_spark.operators.multimodal import (
        pnm_decode,
        pnm_encode,
        pnm_resize,
        resize_media,
    )

    rgb = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    ppm = pnm_encode(rgb, 255)
    assert ppm.startswith(b"P6")
    back, maxval = pnm_decode(ppm)
    assert maxval == 255 and np.array_equal(back, rgb)

    # header parser handles comments and arbitrary whitespace
    commented = b"P6 # comment\n# another\n 8\t8\n255\n" + rgb.tobytes()
    back2, _ = pnm_decode(commented)
    assert np.array_equal(back2, rgb)

    # 16-bit PGM roundtrip (big-endian samples per spec)
    gray16 = (np.arange(16, dtype=np.uint16) * 4000).reshape(4, 4)
    pgm16 = pnm_encode(gray16, 65535)
    back3, mv3 = pnm_decode(pgm16)
    assert mv3 == 65535 and np.array_equal(back3, gray16)

    # nearest-neighbor resize == independent numpy index remap
    want = rgb[(np.arange(4) * 8) // 4][:, (np.arange(4) * 8) // 4]
    got, _ = pnm_decode(pnm_resize(ppm, 8, 8, 4, 4))
    assert np.array_equal(got, want)

    # ...and the same bytes come out of the Spark mapInPandas stage
    media = spark.createDataFrame(
        [(1, "image", ppm, 8, 8, None)], MEDIA_SCHEMA
    )
    row = resize_media(media, 4, 4).collect()[0]
    assert bytes(row["content"]) == pnm_resize(ppm, 8, 8, 4, 4)
    arr, _ = pnm_decode(bytes(row["content"]))
    assert arr.shape == (4, 4, 3)


def test_pnm_feature_extraction(spark):
    """decode_auto routes PNM payloads through the real feature
    kernel; non-PNM payloads keep the deterministic stand-in."""
    import numpy as np

    from nbody6_data_pipeline_spark.operators.multimodal import (
        decode_auto,
        extract_features,
        pnm_encode,
        pnm_features,
    )

    rgb = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    ppm = pnm_encode(rgb, 255)
    media = spark.createDataFrame(
        [(1, "image", ppm, 8, 8, None), (2, "audio", b"\x00\x01" * 16, None, None, 100)],
        MEDIA_SCHEMA,
    )
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(media, decode_fn=decode_auto).collect()
    }
    assert feats[1] == pytest.approx(pnm_features(ppm, "image").tolist(), rel=1e-12)
    assert feats[2] == pytest.approx(
        fake_decode(b"\x00\x01" * 16, "audio").tolist(), rel=1e-12
    )
    assert all(len(v) == FEATURE_DIM for v in feats.values())


def test_resize_media_mixed_batch_and_empty_payload(spark):
    """Regression: Arrow->pandas turns a nullable int column into
    float64 when ANY row in the batch is null, so width arrives as 8.0
    — and an empty (non-null) payload must pass through, not crash."""
    from nbody6_data_pipeline_spark.operators.multimodal import resize_media

    img = bytes(range(64))
    data = [
        (1, "image", img, 8, 8, None),
        (2, "image", b"\x10" * 100, None, None, None),  # null dims
        (3, "image", b"", 4, 4, None),  # empty payload
    ]
    # coalesce(1): all rows share a partition -> one mixed Arrow batch
    media = spark.createDataFrame(data, MEDIA_SCHEMA).coalesce(1)
    out = {r["media_id"]: r for r in resize_media(media, 4, 4).collect()}
    assert set(out) == {1, 2, 3}
    assert len(out[1]["content"]) == 16
    assert bytes(out[3]["content"]) == b""


def test_wav_codec_roundtrip_resample_and_features(spark):
    """The REAL audio codec path: RIFF/WAVE PCM payloads decode,
    resample by nearest-neighbor frame remap, re-encode — verified
    against independent numpy computation, through the Spark
    plumbing (resample_audio mapInPandas stage)."""
    import numpy as np

    from nbody6_data_pipeline_spark.operators.multimodal import (
        is_wav,
        resample_audio,
        wav_decode,
        wav_duration_ms,
        wav_encode,
        wav_features,
        wav_resample,
    )

    # 16-bit stereo triangle wave, 100 frames at 1000 Hz
    t = np.arange(100)
    left = ((t % 20) - 10) * 1000
    right = ((t % 10) - 5) * 2000
    samples = np.stack([left, right], axis=1).astype(np.int32)
    wav = wav_encode(samples, 1000)
    assert is_wav(wav)
    back, rate = wav_decode(wav)
    assert rate == 1000 and np.array_equal(back, samples)
    assert wav_duration_ms(wav) == 100

    # 8-bit mono decode: unsigned re-centered, x256 scale
    pcm8 = bytes([128, 129, 127, 255, 0])
    wav8 = (
        b"RIFF" + (36 + 5 + 1).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (500).to_bytes(4, "little") + (500).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + b"data" + (5).to_bytes(4, "little") + pcm8 + b"\x00"
    )
    b8, r8 = wav_decode(wav8)
    assert r8 == 500
    assert b8[:, 0].tolist() == [0, 256, -256, 32512, -32768]

    # nearest-neighbor resample == independent index remap
    res = wav_resample(wav, 400)
    rs, rr = wav_decode(res)
    assert rr == 400 and rs.shape == (40, 2)
    idx = np.minimum((np.arange(40) * 1000) // 400, 99)
    assert np.array_equal(rs, samples[idx])
    # duration preserved to sample rounding
    assert wav_duration_ms(res) == 100

    # feature vector: deterministic, channel stats in [-1, 1]
    f = wav_features(wav)
    assert len(f) == 16
    assert f[2] == samples[:, 0].min() / 32768.0
    assert f[3] == samples[:, 0].max() / 32768.0
    assert f[10] == 2.0 and f[11] == 0.1  # channels, seconds

    # ...and the Spark mapInPandas stage produces the same bytes,
    # recomputing duration_ms from the re-encoded payload
    media = spark.createDataFrame(
        [
            (1, "audio", wav, None, None, 12345),  # stale metadata
            (2, "audio", None, None, None, 77),  # null payload: untouched
            (3, "image", b"\x01\x02", 1, 2, None),  # non-audio: untouched
            (4, "audio", b"\xde\xad\xbe\xef", None, None, 9),  # not RIFF
        ],
        MEDIA_SCHEMA,
    ).coalesce(1)
    out = {r["media_id"]: r for r in resample_audio(media, 400).collect()}
    assert bytes(out[1]["content"]) == res
    assert out[1]["duration_ms"] == 100
    assert out[2]["content"] is None and out[2]["duration_ms"] == 77
    assert bytes(out[3]["content"]) == b"\x01\x02"
    assert bytes(out[4]["content"]) == b"\xde\xad\xbe\xef"
    assert out[4]["duration_ms"] == 9


def test_wav_feature_dispatch(spark):
    """decode_auto routes RIFF/WAVE payloads through the real audio
    kernel while PNM and unknown payloads keep their paths."""
    import numpy as np

    from nbody6_data_pipeline_spark.operators.multimodal import (
        decode_auto,
        extract_features,
        wav_encode,
        wav_features,
    )

    wav = wav_encode((np.arange(50)[:, None] % 7) * 3000 - 9000, 250)
    media = spark.createDataFrame(
        [(1, "audio", wav, None, None, 200),
         (2, "audio", b"\x00\x01" * 16, None, None, 100)],
        MEDIA_SCHEMA,
    )
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(media, decode_fn=decode_auto).collect()
    }
    assert feats[1] == pytest.approx(wav_features(wav).tolist(), rel=1e-12)
    assert feats[2] == pytest.approx(
        fake_decode(b"\x00\x01" * 16, "audio").tolist(), rel=1e-12
    )


def test_corrupt_payloads_degrade_not_crash(spark):
    """Payloads wearing a valid magic but truncated/corrupt must not
    kill the task: feature extraction falls back to the byte-level
    stand-in; resample passes the row through untouched."""
    from nbody6_data_pipeline_spark.operators.multimodal import (
        decode_auto,
        extract_features,
        resample_audio,
        resize_auto,
    )

    bad_wav = b"RIFF\x10\x00\x00\x00WAVEfmt "  # no chunks parseable
    bad_ppm = b"P6\n8 8\n255\n\x00\x01"  # payload far too short
    media = spark.createDataFrame(
        [
            (1, "audio", bad_wav, None, None, 55),
            (2, "image", bad_ppm, 8, 8, None),
        ],
        MEDIA_SCHEMA,
    ).coalesce(1)

    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(media, decode_fn=decode_auto).collect()
    }
    assert feats[1] == pytest.approx(fake_decode(bad_wav, "audio").tolist())
    assert feats[2] == pytest.approx(fake_decode(bad_ppm, "image").tolist())

    out = {r["media_id"]: r for r in resample_audio(media, 400).collect()}
    assert bytes(out[1]["content"]) == bad_wav
    assert out[1]["duration_ms"] == 55

    # resize_auto: corrupt PNM degrades to the stand-in resampler
    got = resize_auto(bad_ppm, 8, 8, 4, 4)
    from nbody6_data_pipeline_spark.operators.multimodal import fake_resize
    assert got == fake_resize(bad_ppm, 8, 8, 4, 4)
