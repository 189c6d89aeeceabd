"""W4 grid interpolation — pandas interpolate('index',
limit_area='inside') parity, checked against pandas directly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from nbody6_data_pipeline_spark.operators.interpolate import interpolate_on_grid


def _pandas_reference(times, values, step=1.0):
    """The notebooks' exact recipe (overall_stat.ipynb cell 3)."""
    grid = np.arange(0, max(times) + step, step)
    union = np.union1d(times, grid)
    s = pd.Series(values, index=times).reindex(union)
    s = s.interpolate(method="index", limit_area="inside")
    return s.reindex(grid)


def test_matches_pandas_semantics(spark):
    times = [2.0, 3.5, 6.0, 9.25]
    values = [10.0, 20.0, 5.0, 14.0]
    df = spark.createDataFrame(
        [("g", t, v) for t, v in zip(times, values)], ["g", "t", "v"]
    )
    out = {
        r["t"]: r["v"]
        for r in interpolate_on_grid(df, ["g"], "t", ["v"]).collect()
    }
    want = _pandas_reference(times, values)
    assert sorted(out) == list(want.index)
    for t in want.index:
        if np.isnan(want[t]):
            assert out[t] is None, t
        else:
            assert out[t] == pytest.approx(want[t], rel=1e-12), t


def test_exact_at_observed_grid_points(spark):
    df = spark.createDataFrame(
        [("g", 0.0, 1.0), ("g", 2.0, 5.0), ("g", 4.0, 9.0)], ["g", "t", "v"]
    )
    out = {
        r["t"]: r["v"]
        for r in interpolate_on_grid(df, ["g"], "t", ["v"]).collect()
    }
    assert out[0.0] == 1.0 and out[2.0] == 5.0 and out[4.0] == 9.0
    assert out[1.0] == pytest.approx(3.0) and out[3.0] == pytest.approx(7.0)


def test_multiple_groups_and_columns(spark):
    df = spark.createDataFrame(
        [
            ("a", 0.0, 0.0, 100.0),
            ("a", 2.0, 4.0, 50.0),
            ("b", 1.0, 10.0, None),
            ("b", 3.0, 30.0, 7.0),
        ],
        ["g", "t", "v1", "v2"],
    )
    rows = {
        (r["g"], r["t"]): r
        for r in interpolate_on_grid(df, ["g"], "t", ["v1", "v2"]).collect()
    }
    assert rows[("a", 1.0)]["v1"] == pytest.approx(2.0)
    assert rows[("a", 1.0)]["v2"] == pytest.approx(75.0)
    # outside b's observed range -> null
    assert rows[("b", 0.0)]["v1"] is None
    assert rows[("b", 2.0)]["v1"] == pytest.approx(20.0)
    # v2 for b observed only at t=3 -> no interior to fill
    assert rows[("b", 2.0)]["v2"] is None
    assert rows[("b", 3.0)]["v2"] == pytest.approx(7.0)
