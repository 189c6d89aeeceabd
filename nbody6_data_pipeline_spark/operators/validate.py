"""P12 + runtime validation utilities (SURVEY §5).

The reference's de-facto correctness strategy is defensive runtime
validation; these are the engine-side equivalents, each ONE
aggregation job, raising on violation like the reference:

- NaN/NULL ban in assembled tables (snapshot.py:33-44)
- duplicate-key detection (assembler.py:130-134)
- series timestamp consistency within tolerance (series.py:28-33)
- collection series-timestamp equality (collection.py:42-46)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assert_no_nulls(df: DataFrame, cols: list[str] | None = None) -> None:
    """Hard-fail if any NULL/NaN in the given columns (default: all).
    The reference bans NaN in stars/binary_systems (snapshot.py:33-44).
    """
    cols = cols or df.columns
    checks = []
    for c in cols:
        cond = F.col(c).isNull()
        if dict(df.dtypes)[c] in ("double", "float"):
            cond = cond | F.isnan(F.col(c))
        checks.append(F.sum(cond.cast("long")).alias(c))
    row = df.agg(*checks).first()
    bad = {c: row[c] for c in cols if row[c]}
    if bad:
        raise ValueError(f"NULL/NaN values found: {bad}")


def assert_unique_key(df: DataFrame, key_cols: list[str]) -> None:
    """Raise if any key combination occurs more than once
    (assembler.py:130-134 duplicate-name check)."""
    cnt = "__dup_count__"
    dup = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias(cnt))
        .filter(F.col(cnt) > 1)
        .first()
    )
    if dup is not None:
        raise ValueError(
            f"Duplicate key {tuple(dup[c] for c in key_cols)} (x{dup[cnt]})"
        )


def assert_timestamps_consistent(
    df: DataFrame,
    group_cols: list[str],
    time_col_a: str,
    time_col_b: str,
    tolerance: float = 2e-2,
) -> None:
    """Raise if |a - b| exceeds tolerance anywhere (series.py:28-33)."""
    bad = df.filter(
        F.abs(F.col(time_col_a) - F.col(time_col_b)) > tolerance
    ).first()
    if bad is not None:
        raise ValueError(
            f"Timestamp mismatch beyond {tolerance}: "
            f"{bad[time_col_a]} vs {bad[time_col_b]}"
        )


def assert_same_timestamps(
    df: DataFrame, series_col: str, time_col: str
) -> None:
    """Raise unless every series has the identical timestamp set
    (collection.py:42-46)."""
    sets = (
        df.groupBy(series_col)
        .agg(F.array_sort(F.collect_set(time_col)).alias("ts"))
        .select("ts")
        .distinct()
        .count()
    )
    if sets > 1:
        raise ValueError("Series timestamp sets differ across the collection")
