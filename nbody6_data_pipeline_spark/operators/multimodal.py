"""Multimodal column plumbing (BASELINE.json north-star op).

Images/audio/video ride through the engine as opaque BINARY columns
with typed metadata; decode / feature-extraction / resize / frame
sampling run as Arrow-batched Pandas UDFs over ``mapInPandas``.

Codecs: binary PNM images (PPM ``P6`` / PGM ``P5``) and RIFF/WAVE PCM
audio (8/16-bit) — the formats that need no external libraries — get
REAL decode → nearest-neighbor resample → re-encode paths implemented
here in pure numpy (``pnm_decode``/``pnm_resize``,
``wav_decode``/``wav_resample``). Other formats
(JPEG/PNG/MP3/video) would need PIL/opencv/ffmpeg, which are not in
this container: for those ``decode_fn``/``resize_fn`` fall back to a
deterministic byte-level stand-in (``fake_decode``/``fake_resize``),
and a real deployment injects a library-backed callable with the same
signature. The Spark-side plumbing — schema, partitioning, UDF
signatures, batch shapes, payload never shuffling — is identical on
both paths and is what the tests pin down.
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
    # media_id stays NULLABLE: declaring it non-null makes Arrow throw
    # "Value at index is null" and kill the whole stage the moment one
    # malformed row arrives — a single bad record must degrade (NULL
    # id, NULL features), never fail the job (round-5 NULL sweep).
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), True),
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


# ---- Real PNM (PPM/PGM binary) codec — pure numpy, no external deps ----


def _pnm_header(data: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a binary-PNM header: returns (magic, width, height,
    maxval, payload_offset). Handles arbitrary whitespace and
    ``#`` comments, per the netpbm spec."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PNM payload (magic {data[:2]!r})")
    magic = data[:2]
    fields: list[int] = []
    i = 2
    n = len(data)
    while len(fields) < 3:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i < n and data[i : i + 1] == b"#":
            while i < n and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        fields.append(int(data[i:j]))
        i = j
    i += 1  # exactly ONE whitespace byte separates maxval from raster
    width, height, maxval = fields
    return magic, width, height, maxval, i


def pnm_decode(content: bytes) -> tuple[np.ndarray, int]:
    """Binary PPM/PGM -> (array, maxval); array shape (H, W) for PGM,
    (H, W, 3) for PPM, dtype uint8 (maxval < 256) or uint16
    (big-endian 2-byte samples, per spec)."""
    magic, width, height, maxval, off = _pnm_header(content)
    channels = 3 if magic == b"P6" else 1
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    count = width * height * channels
    arr = np.frombuffer(content, dtype=dtype, count=count, offset=off)
    shape = (height, width, 3) if channels == 3 else (height, width)
    return arr.reshape(shape).astype(dtype.newbyteorder("=")), maxval


def pnm_encode(arr: np.ndarray, maxval: int = 255) -> bytes:
    """(H, W[, 3]) array -> binary PPM (3 channels) or PGM bytes."""
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    header = b"%s\n%d %d\n%d\n" % (magic, arr.shape[1], arr.shape[0], maxval)
    return header + arr.astype(dtype).tobytes()


def pnm_resize(
    content: bytes, width: int, height: int, new_width: int, new_height: int
) -> bytes:
    """Real image resample for binary PNM payloads: decode, nearest-
    neighbor index remap (pure integer arithmetic — deterministic on
    every platform), re-encode. Geometry comes from the PAYLOAD
    header; the metadata width/height arguments are accepted for
    signature compatibility but not trusted."""
    arr, maxval = pnm_decode(content)
    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(new_height) * h) // max(new_height, 1)
    xs = (np.arange(new_width) * w) // max(new_width, 1)
    return pnm_encode(arr[ys][:, xs], maxval)


def pnm_features(content: bytes, media_type: str) -> np.ndarray:
    """Real feature extraction for binary PNM payloads: per-channel
    mean/std/min/max plus a coarse 2x2 luminance grid, normalized to
    [0, 1] — FEATURE_DIM floats, zero-padded."""
    arr, maxval = pnm_decode(content)
    px = arr.reshape(arr.shape[0], arr.shape[1], -1).astype(np.float64)
    scale = float(maxval)
    feats: list[float] = []
    for c in range(px.shape[2]):
        ch = px[:, :, c]
        feats += [ch.mean(), ch.std(), ch.min(), ch.max()]
    lum = px.mean(axis=2)
    h2, w2 = max(1, lum.shape[0] // 2), max(1, lum.shape[1] // 2)
    for qy in range(2):
        for qx in range(2):
            feats.append(
                lum[qy * h2 : (qy + 1) * h2 or None, qx * w2 : (qx + 1) * w2 or None].mean()
            )
    out = np.zeros(FEATURE_DIM)
    vals = np.array(feats[:FEATURE_DIM]) / scale
    out[: vals.size] = vals
    return out


def is_pnm(content: bytes | None) -> bool:
    return content is not None and bytes(content[:2]) in (b"P5", b"P6")


# ---- Real WAV (RIFF PCM) codec — pure numpy, no external deps ----


def is_wav(content: bytes | None) -> bool:
    return (
        content is not None
        and len(content) >= 12
        and bytes(content[:4]) == b"RIFF"
        and bytes(content[8:12]) == b"WAVE"
    )


def _wav_chunks(data: bytes) -> dict[bytes, tuple[int, int]]:
    """Walk the RIFF chunk list: {chunk_id: (offset, size)} for the
    payload of each top-level chunk (first occurrence wins). Chunks
    are word-aligned per spec — odd sizes get a pad byte."""
    out: dict[bytes, tuple[int, int]] = {}
    pos = 12
    while pos + 8 <= len(data):
        cid = bytes(data[pos : pos + 4])
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        out.setdefault(cid, (pos + 8, size))
        pos += 8 + size + (size & 1)
    return out


def wav_decode(content: bytes) -> tuple[np.ndarray, int]:
    """Binary RIFF/WAVE PCM -> (samples, sample_rate). samples is
    (n_frames, n_channels) int16-ranged int32 (8-bit input is
    re-centered from unsigned to signed, scaled x256 so both depths
    share one numeric range)."""
    chunks = _wav_chunks(content)
    if b"fmt " not in chunks or b"data" not in chunks:
        raise ValueError("not a complete RIFF/WAVE file")
    off, size = chunks[b"fmt "]
    fmt = content[off : off + size]
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16) or n_channels < 1:
        raise ValueError(
            f"unsupported WAV: format={audio_format} bits={bits}"
        )
    doff, dsize = chunks[b"data"]
    raw = content[doff : doff + dsize]
    if bits == 8:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
        arr = (arr - 128) * 256
    else:
        n = len(raw) // 2
        arr = np.frombuffer(raw, dtype="<i2", count=n).astype(np.int32)
    n_frames = arr.size // n_channels
    return arr[: n_frames * n_channels].reshape(n_frames, n_channels), sample_rate


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames, n_channels) int array (int16 range) -> 16-bit PCM
    RIFF/WAVE bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, n_channels = samples.shape
    pcm = np.clip(samples, -32768, 32767).astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = (
        (1).to_bytes(2, "little")
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (n_channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(pcm).to_bytes(4, "little")
        + pcm
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def wav_resample(content: bytes, new_rate: int) -> bytes:
    """Real audio resample: decode, nearest-neighbor frame index remap
    (pure integer arithmetic — deterministic on every platform, the
    audio twin of pnm_resize), re-encode as 16-bit PCM at new_rate.
    Duration is preserved to sample-rounding."""
    samples, rate = wav_decode(content)
    n_frames = samples.shape[0]
    n_out = max(1, (n_frames * new_rate) // max(rate, 1))
    idx = np.minimum((np.arange(n_out) * rate) // max(new_rate, 1), n_frames - 1)
    return wav_encode(samples[idx], new_rate)


def wav_duration_ms(content: bytes) -> int:
    samples, rate = wav_decode(content)
    return int(samples.shape[0] * 1000) // max(rate, 1)


def wav_features(content: bytes) -> np.ndarray:
    """Real audio feature extraction: per-channel mean/RMS/min/max in
    [-1, 1] units for up to two channels, zero-crossing rate and peak
    of channel 0, channel count and seconds-of-audio — FEATURE_DIM
    floats, zero-padded. Integer sums accumulate in float64 (exact
    within 2^53), so the vector is deterministic."""
    samples, rate = wav_decode(content)
    x = samples.astype(np.float64) / 32768.0
    feats: list[float] = []
    for c in range(min(2, x.shape[1])):
        ch = x[:, c]
        feats += [
            float(ch.mean()),
            float(np.sqrt((ch * ch).mean())),
            float(ch.min()),
            float(ch.max()),
        ]
    ch0 = x[:, 0]
    sign = np.signbit(ch0)
    zcr = float(np.count_nonzero(sign[1:] != sign[:-1])) / max(len(ch0) - 1, 1)
    feats += [
        zcr,
        float(np.abs(ch0).max()),
        float(x.shape[1]),
        x.shape[0] / max(rate, 1),
    ]
    out = np.zeros(FEATURE_DIM)
    vals = np.array(feats[:FEATURE_DIM])
    out[: vals.size] = vals
    return out


def resample_audio(
    media: DataFrame,
    new_rate: int,
    resample_fn: Callable[[bytes, int], bytes] = wav_resample,
) -> DataFrame:
    """Binary-in / binary-out audio resample via mapInPandas — the
    audio twin of resize_media. WAV PCM payloads go through the real
    codec; rows that are not audio, have NULL payloads, or are not
    RIFF/WAVE pass through UNTOUCHED (payload and duration_ms kept).
    duration_ms is recomputed from the re-encoded PAYLOAD, never
    assumed from the old metadata."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, durations = [], []
            for c, d, mt in zip(
                pdf["content"], pdf["duration_ms"], pdf["media_type"]
            ):
                if mt != "audio" or c is None or not is_wav(bytes(c)):
                    contents.append(c)
                    durations.append(None if pd.isna(d) else int(d))
                else:
                    try:
                        nb = resample_fn(bytes(c), new_rate)
                    except ValueError:
                        # corrupt RIFF payload: pass through untouched
                        contents.append(c)
                        durations.append(None if pd.isna(d) else int(d))
                        continue
                    contents.append(nb)
                    durations.append(wav_duration_ms(nb))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": contents,
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "duration_ms": pd.array(durations, dtype="Int32"),
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_auto(content: bytes, media_type: str) -> np.ndarray:
    """Feature decode dispatch: REAL codecs for binary PNM image and
    RIFF/WAVE PCM audio payloads, deterministic byte-level stand-in
    otherwise (JPEG/PNG/video need libraries this container doesn't
    ship — inject a decode_fn)."""
    try:
        if is_pnm(content):
            return pnm_features(content, media_type)
        if is_wav(content):
            return wav_features(content)
    except ValueError:
        # Corrupt payload wearing a valid magic (truncated header,
        # bad geometry, unsupported PCM variant): routine at corpus
        # scale — degrade to the byte-level stand-in instead of
        # killing the whole task/stage.
        pass
    return fake_decode(content, media_type)


def resize_auto(
    content: bytes, width: int, height: int, new_width: int, new_height: int
) -> bytes:
    """Resize dispatch: REAL decode/resample/re-encode for binary PNM
    payloads, deterministic byte-level stand-in otherwise (including
    corrupt payloads wearing the PNM magic — see decode_auto)."""
    if is_pnm(content):
        try:
            return pnm_resize(content, width, height, new_width, new_height)
        except ValueError:
            pass
    return fake_resize(content, width, height, new_width, new_height)


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
    resize_fn: Callable[[bytes, int, int, int, int], bytes] = resize_auto,
) -> DataFrame:
    """Binary-in / binary-out transform via mapInPandas: re-encode each
    image payload at a new geometry and update the typed metadata in
    the same pass. The payload enters and leaves as Arrow binary
    batches on the executor — it is transformed in place in the plan,
    never shuffled, never collected; only the schema changes. This is
    the signature every decode/transcode stage in a multimodal
    training pipeline has; binary-PNM payloads go through the real
    codec (``pnm_resize``), other formats through the injected or
    stand-in ``resize_fn``.

    Composition-safe in a mixed-modality pipeline: non-image rows and
    image rows with a NULL payload pass through UNTOUCHED (original
    content and width/height kept) — the metadata never claims a
    geometry the payload doesn't have, and downstream stages see the
    full row set."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, widths, heights = [], [], []
            for c, w, h, mt in zip(
                pdf["content"], pdf["width"], pdf["height"], pdf["media_type"]
            ):
                if mt != "image" or c is None:
                    # pass-through: keep payload AND metadata as-is
                    contents.append(c)
                    widths.append(None if pd.isna(w) else int(w))
                    heights.append(None if pd.isna(h) else int(h))
                else:
                    contents.append(resize_fn(c, w, h, new_width, new_height))
                    widths.append(new_width)
                    heights.append(new_height)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": contents,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return media.mapInPandas(run, schema=out_schema)
