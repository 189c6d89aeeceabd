"""Distributed global ranking — exact row_number / NTILE without a
single-partition sort (SURVEY §2.5 W5/W6; reference
dataset_split.ipynb `_bin_data` pd.qcut / pd.factorize).

A global ``ROW_NUMBER() OVER (ORDER BY ...)`` (and NTILE built on it)
forces Spark to move the whole table through one task — the one plan
shape that cannot survive a 100x scale-up (WindowExec warns "Moving
all data to a single partition"). The classic distributed recipe used
here instead:

1. bucket rows by value range — bucket bounds come from one
   ``percentile_approx`` aggregate (sample-sketch, map-side
   combinable), and the bucket id is a pure function of the row value
   against the collected bounds, so it is DETERMINISTIC across jobs
   (no reliance on exchange reuse, unlike
   ``repartitionByRange`` + ``spark_partition_id``);
2. count rows per bucket (one map-side-combinable hash-agg; at most
   ``n_buckets`` rows reach the driver) and prefix-sum the counts
   into per-bucket rank offsets;
3. window WITHIN each bucket for the local row_number, add the
   broadcast offset: ``global_rn = local_rn + offset[bucket]``.

Every stage is distributed; driver traffic is O(n_buckets). Ties on
the first sort column all land in the same bucket (the bucket id
depends only on that column), so later tie-break columns order them
correctly inside one window partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["with_global_row_number", "with_exact_ntile"]


def _bucket_expr(col: Column, bounds: Sequence) -> Column:
    """Deterministic bucket id: the number of bounds strictly below
    the value. Evaluates as a fixed chain of comparisons — stays
    inside whole-stage codegen."""
    out = F.lit(0)
    for b in bounds:
        out = out + F.when(col > F.lit(b), 1).otherwise(0)
    return out


def with_global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    rn_col: str = "rn",
    n_buckets: int = 64,
) -> tuple[DataFrame, int]:
    """Append an exact global ``ROW_NUMBER() OVER (ORDER BY
    order_cols)`` column without a global sort.

    Returns ``(df_with_rn, total_rows)``. Triggers two small driver
    actions (percentile bounds, per-bucket counts) whose result sizes
    are O(n_buckets), independent of the table size.

    ``order_cols`` must be a total order (include a unique tie-break
    key last) for the row numbering to be deterministic.
    """
    first = order_cols[0]
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.select(
        F.percentile_approx(first, probs, 10_000).alias("b")
    ).first()
    bounds = sorted(set(row["b"] or [])) if row is not None else []
    bucket = _bucket_expr(F.col(first), bounds).alias("_bkt")

    tagged = df.withColumn("_bkt", bucket)
    counts = {
        r["_bkt"]: r["cnt"]
        for r in tagged.groupBy("_bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    running = 0
    for b in sorted(counts):
        offsets[b] = running
        running += counts[b]
    if offsets:
        pairs = [x for b in offsets for x in (F.lit(b), F.lit(offsets[b]))]
        off = F.element_at(F.create_map(*pairs), F.col("_bkt"))
    else:
        off = F.lit(0)
    w = W.partitionBy("_bkt").orderBy(*[F.col(c) for c in order_cols])
    out = tagged.withColumn(
        rn_col, (F.row_number().over(w) + off).cast("int")
    ).drop("_bkt")
    return out, total


def ntile_from_rn(rn: Column, total: int, n_tiles: int) -> Column:
    """SQL NTILE(n) bin from a 1-based global row number: the first
    ``total % n`` tiles get ``total // n + 1`` rows, the rest get
    ``total // n`` (ISO/ANSI semantics, matching Spark and DuckDB)."""
    base, rem = divmod(total, n_tiles)
    big = rem * (base + 1)
    safe_base = max(base, 1)  # base==0 ⇒ every row takes the first branch
    return (
        F.when(rn <= big, ((rn - 1) / (base + 1)).cast("int") + 1)
        .otherwise(F.lit(rem) + ((rn - big - 1) / safe_base).cast("int") + 1)
        .cast("int")
    )


def with_exact_ntile(
    df: DataFrame,
    order_cols: Sequence[str],
    n_tiles: int,
    bin_col: str = "bin",
    n_buckets: int = 64,
) -> DataFrame:
    """Exact ``NTILE(n_tiles) OVER (ORDER BY order_cols)`` computed
    distributed: global row number via range buckets + offsets, then
    the closed-form NTILE group assignment."""
    ranked, total = with_global_row_number(
        df, order_cols, rn_col="_grn", n_buckets=n_buckets
    )
    return ranked.withColumn(
        bin_col, ntile_from_rn(F.col("_grn"), total, n_tiles)
    ).drop("_grn")
