"""Multimodal column plumbing (BASELINE.json north-star op).

Images/audio/video ride through the engine as opaque BINARY columns
with typed metadata; decode / feature-extraction / resize / frame
sampling run as Arrow-batched Pandas UDFs over ``mapInPandas``. The
Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested; the actual codec calls are STUBBED
(image/audio libraries are not in this container): ``decode_fn``
defaults to a deterministic fake that derives pseudo-features from
the bytes, and a real deployment injects e.g. a PIL/ffmpeg-backed
callable with the same signature.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16


def fake_decode(content: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for a codec: derives FEATURE_DIM floats
    from the raw bytes. Replace with a real decoder in deployment."""
    if content is None:
        raise NotImplementedError(
            "real decode not available in this environment; inject decode_fn"
        )
    arr = np.frombuffer(content, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM)
    chunks = np.array_split(arr.astype(np.float64), FEATURE_DIM)
    return np.array([c.mean() if c.size else 0.0 for c in chunks]) / 255.0


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] = fake_decode,
    batch_size_hint: int = 64,
) -> DataFrame:
    """Per-media feature vectors via mapInPandas: Arrow batches in,
    (media_id, features array<double>) out. The binary payload never
    leaves the executor; only the small feature vector shuffles."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_fn(c, t).tolist() if c is not None else None
                for c, t in zip(pdf["content"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return media.mapInPandas(run, schema=out_schema)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    (media_id, frame_idx, offset_ms) — pure column expressions; the
    actual frame grab happens in extract_features on the sampled rows."""
    n_frames = F.greatest(
        (F.col("duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: i * F.lit(every_ms),
            )
        ).alias("frame_idx", "offset_ms"),
    )


def fake_resize(
    content: bytes, width: int, height: int, new_width: int, new_height: int
) -> bytes:
    """Deterministic stand-in for an image resampler: nearest-neighbor
    subsampling of the flat byte grid. Replace with a PIL/opencv-backed
    callable of the same signature in deployment."""
    if content is None:
        raise NotImplementedError(
            "real resize not available in this environment; inject resize_fn"
        )
    # Arrow->pandas turns a nullable int column into float64 (NaN for
    # null), so width/height arrive as floats whenever ANY row in the
    # batch has a null dimension — normalize before arithmetic
    width = int(width) if width is not None and not pd.isna(width) else None
    height = int(height) if height is not None and not pd.isna(height) else None
    arr = np.frombuffer(content, dtype=np.uint8)
    if arr.size == 0:
        return b""
    if width and height and arr.size >= width * height:
        grid = arr[: width * height].reshape(height, width)
        ys = (np.arange(new_height) * height) // max(new_height, 1)
        xs = (np.arange(new_width) * width) // max(new_width, 1)
        return grid[np.ix_(ys, xs)].tobytes()
    # unknown geometry: proportional byte subsample keeps determinism
    n_out = max(1, min(arr.size, new_width * new_height))
    idx = (np.arange(n_out) * arr.size) // n_out
    return arr[idx].tobytes()


def resize_media(
    media: DataFrame,
    new_width: int,
    new_height: int,
    resize_fn: Callable[[bytes, int, int, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Binary-in / binary-out transform via mapInPandas: re-encode each
    image payload at a new geometry and update the typed metadata in
    the same pass. The payload enters and leaves as Arrow binary
    batches on the executor — it is transformed in place in the plan,
    never shuffled, never collected; only the schema changes. This is
    the signature every decode/transcode stage in a multimodal
    training pipeline has, so the stub proves the plumbing the real
    codec drops into."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_fn(c, w, h, new_width, new_height)
                if c is not None
                else None
                for c, w, h in zip(pdf["content"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": out,
                    "width": new_width,
                    "height": new_height,
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        run, schema=out_schema
    )
