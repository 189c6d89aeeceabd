"""Property-based spot checks (SURVEY §5 item 5, hypothesis).

Each example builds one tiny DataFrame and runs one local Spark job,
so example counts are kept small; the point is randomized coverage of
kernel invariants, not bulk fuzzing:

- photocentric merge: luminosity additivity in linear space, merged
  value between the components, mass additivity (calc/binary.py:10-54)
- equivalent radius bounds (calc/binary.py:20-35)
- W4 interpolation: full parity with the pandas
  interpolate('index', limit_area='inside') recipe on random series
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

import nbody6_data_pipeline_spark.functions.binary as fb
from nbody6_data_pipeline_spark.operators.interpolate import interpolate_on_grid

finite = st.floats(
    min_value=-10.0, max_value=10.0, allow_nan=False, allow_infinity=False
)
pos = st.floats(
    min_value=1e-3, max_value=1e3, allow_nan=False, allow_infinity=False
)


@settings(max_examples=6, deadline=None)
@given(
    log_l1=finite,
    log_l2=finite,
    v1=finite,
    v2=finite,
    m1=pos,
    m2=pos,
    r1=pos,
    r2=pos,
)
def test_merge_kernel_invariants(spark, log_l1, log_l2, v1, v2, m1, m2, r1, r2):
    row = spark.createDataFrame(
        [(log_l1, log_l2, v1, v2, m1, m2, r1, r2)],
        ["la", "lb", "va", "vb", "ma", "mb", "ra", "rb"],
    )
    lum1 = F.pow(F.lit(10.0), F.col("la"))
    lum2 = F.pow(F.lit(10.0), F.col("lb"))
    got = row.select(
        fb.calc_total_log_luminosity(F.col("la"), F.col("lb")).alias("ltot"),
        fb.calc_photocentric_scalar(lum1, lum2, F.col("va"), F.col("vb")).alias(
            "pc"
        ),
        fb.calc_total_mass(F.col("ma"), F.col("mb")).alias("mtot"),
        fb.calc_equivalent_radius(F.col("ra"), F.col("rb")).alias("req"),
    ).first()
    # luminosity additivity in linear space
    assert got["ltot"] == pytest.approx(
        math.log10(10.0**log_l1 + 10.0**log_l2), rel=1e-12
    )
    # and therefore strictly above either component
    assert got["ltot"] >= max(log_l1, log_l2)
    # photocentric value lies between the components (weights positive)
    assert min(v1, v2) - 1e-9 <= got["pc"] <= max(v1, v2) + 1e-9
    # mass additivity
    assert got["mtot"] == pytest.approx(m1 + m2, rel=1e-12)
    # equivalent radius bounded by max(r) and r1+r2
    assert max(r1, r2) - 1e-12 <= got["req"] <= r1 + r2 + 1e-12


@settings(max_examples=6, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=20.0, allow_nan=False),
            st.floats(min_value=-100.0, max_value=100.0, allow_nan=False),
        ),
        min_size=2,
        max_size=8,
        unique_by=lambda tv: round(tv[0], 2),
    )
)
def test_interpolation_matches_pandas_on_random_series(spark, data):
    # distinct times rounded to 2dp (the engine's timestamp normal form)
    data = sorted((round(t, 2), v) for t, v in data)
    times = [t for t, _ in data]
    values = [v for _, v in data]
    df = spark.createDataFrame(
        [("g", t, v) for t, v in data], ["g", "t", "v"]
    )
    out = {
        r["t"]: r["v"]
        for r in interpolate_on_grid(df, ["g"], "t", ["v"]).collect()
    }
    grid = np.arange(0, max(times) + 1.0, 1.0)
    union = np.union1d(times, grid)
    ref = (
        pd.Series(values, index=times)
        .reindex(union)
        .interpolate(method="index", limit_area="inside")
        .reindex(grid)
    )
    assert sorted(out) == list(ref.index)
    for t in ref.index:
        if np.isnan(ref[t]):
            assert out[t] is None, t
        else:
            assert out[t] == pytest.approx(ref[t], rel=1e-9, abs=1e-9), t


@given(
    lts=st.lists(st.integers(0, 200), min_size=1, max_size=12),
    rts=st.lists(st.integers(0, 200), min_size=1, max_size=12),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol=st.sampled_from([None, 25]),
)
@settings(max_examples=6, deadline=None)
def test_merge_asof_matches_pandas(spark, lts, rts, direction, tol):
    """Randomized parity against pandas.merge_asof — the independent
    reference implementation of the as-of semantics (backward /
    forward / nearest, inclusive, with tolerance)."""
    import pandas as pd

    from nbody6_data_pipeline_spark.operators.asof import merge_asof

    # unique right timestamps per key keep pandas' tie behavior out of
    # scope (our operator tie-reduces; pandas forbids duplicate keys
    # only in some modes) — dedupe right times, keep max rid like ours
    rts = sorted(set(rts))
    left = spark.createDataFrame(
        [(i, "k", int(t)) for i, t in enumerate(lts)], "lid int, g string, t long"
    )
    right = spark.createDataFrame(
        [("k", int(t), i) for i, t in enumerate(rts)], "g string, t long, rid int"
    )
    got = {
        r["lid"]: r["rid_match"]
        for r in merge_asof(
            left, right, on="t", by=["g"], right_cols=["rid"],
            tolerance=tol, direction=direction,
        ).collect()
    }
    pl = pd.DataFrame({"lid": range(len(lts)), "g": "k", "t": lts}).sort_values(
        "t", kind="stable"
    )
    pr = pd.DataFrame({"g": "k", "t": rts, "rid": range(len(rts))}).sort_values(
        "t", kind="stable"
    )
    want_df = pd.merge_asof(
        pl, pr, on="t", by="g", direction=direction,
        tolerance=None if tol is None else tol,
    )
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in want_df.itertuples()
    }
    assert got == want


# ---- WAV codec invariants (no Spark job: pure-numpy kernel) ----

wav_frames = st.lists(
    st.tuples(
        st.integers(min_value=-32768, max_value=32767),
        st.integers(min_value=-32768, max_value=32767),
    ),
    min_size=1,
    max_size=300,
)


@settings(max_examples=50, deadline=None)
@given(frames=wav_frames, rate=st.integers(min_value=1, max_value=96000))
def test_wav_roundtrip_exact(frames, rate):
    """encode -> decode is the identity for any int16 stereo signal
    at any sample rate."""
    from nbody6_data_pipeline_spark.operators.multimodal import (
        wav_decode,
        wav_encode,
    )

    arr = np.array(frames, dtype=np.int32)
    back, r = wav_decode(wav_encode(arr, rate))
    assert r == rate
    assert np.array_equal(back, arr)


@settings(max_examples=50, deadline=None)
@given(frames=wav_frames, rate=st.integers(min_value=1, max_value=48000))
def test_wav_resample_identity_and_bounds(frames, rate):
    """Resampling at the SAME rate is the identity; at any rate the
    output contains only input sample values (nearest-neighbor never
    invents samples) and frame count is floor(n*new/old)."""
    from nbody6_data_pipeline_spark.operators.multimodal import (
        wav_decode,
        wav_encode,
        wav_resample,
    )

    arr = np.array(frames, dtype=np.int32)
    wav = wav_encode(arr, rate)
    same, r = wav_decode(wav_resample(wav, rate))
    assert r == rate and np.array_equal(same, arr)

    new_rate = max(1, rate // 3)
    res, rr = wav_decode(wav_resample(wav, new_rate))
    assert rr == new_rate
    assert res.shape[0] == max(1, (arr.shape[0] * new_rate) // rate)
    in_vals = {tuple(f) for f in arr.tolist()}
    assert all(tuple(f) in in_vals for f in res.tolist())


any_double = st.floats(allow_nan=False, allow_infinity=True, width=64)


@settings(max_examples=8, deadline=None)
@given(xs=st.lists(any_double, min_size=2, max_size=64))
def test_fixed_numeric_key_monotone_on_random_doubles(spark, xs):
    """fixed_numeric_key (operators/ranking.py) must be non-decreasing
    over ANY doubles — hypothesis sweeps the full float64 range
    including subnormals and infinities; the curated boundary cases
    live in test_ranking.py. One batched Spark job per example."""
    from nbody6_data_pipeline_spark.operators.ranking import fixed_numeric_key

    xs = sorted(xs)
    rows = (
        spark.createDataFrame(
            [(i, v) for i, v in enumerate(xs)], "i int, x double"
        )
        .select("i", fixed_numeric_key(F.col("x")).alias("k"))
        .collect()
    )
    keys = [k for _, k in sorted((r["i"], r["k"]) for r in rows)]
    assert keys == sorted(keys), list(zip(xs, keys))
    # equal inputs always share a key (ties must share a bucket)
    by_val: dict[float, set] = {}
    for v, k in zip(xs, keys):
        by_val.setdefault(v, set()).add(k)
    assert all(len(s) == 1 for s in by_val.values())
