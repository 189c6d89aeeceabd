"""Property tests for the sketch kernels that run WITHOUT Spark —
hypothesis drives the pure-python/pandas parts directly, so hundreds
of examples cost milliseconds."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from nbody6_data_pipeline_spark.operators.sketch import (
    HLL_M,
    _mg_partition,
    hll_estimate_from_registers,
)


@settings(max_examples=200, deadline=None)
@given(
    tokens=st.lists(
        st.sampled_from([f"t{i}" for i in range(30)]), min_size=1, max_size=400
    ),
    capacity=st.integers(min_value=2, max_value=12),
    batch_size=st.integers(min_value=1, max_value=64),
)
def test_mg_superset_guarantee(tokens, capacity, batch_size):
    """Every token with frequency > N/(capacity+1) survives the MG
    sketch, for ANY stream order and ANY batch fragmentation — the
    guarantee the distributed two-pass heavy-hitter operator builds
    on."""
    batches = [
        pd.DataFrame({"token": tokens[i : i + batch_size]})
        for i in range(0, len(tokens), batch_size)
    ]
    (out,) = list(_mg_partition(capacity)(iter(batches)))
    survivors = set(out["token"])
    n = len(tokens)
    counts = Counter(tokens)
    required = {t for t, c in counts.items() if c > n / (capacity + 1)}
    assert required <= survivors
    # memory bound: the table never exceeds its capacity
    assert len(survivors) <= capacity


@settings(max_examples=100, deadline=None)
@given(
    zeros=st.integers(min_value=1, max_value=HLL_M - 1),
)
def test_hll_linear_counting_regime(zeros):
    """With small cardinalities (many empty registers, all ranks 1)
    the estimator returns the linear-counting value m*ln(m/zeros)."""
    regs = [1] * (HLL_M - zeros)
    est = hll_estimate_from_registers(regs)
    lc = HLL_M * math.log(HLL_M / zeros)
    if est <= 2.5 * HLL_M:
        assert abs(est - lc) < 1e-9
    else:
        # outside the small regime the harmonic estimate applies;
        # it must still be positive and finite
        assert est > 0 and math.isfinite(est)
