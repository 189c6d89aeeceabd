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
   combinable) attached to every row as a broadcast array column, and
   the bucket id is a pure function of the row value against that
   array, so it is DETERMINISTIC across jobs (no reliance on exchange
   reuse, unlike ``repartitionByRange`` + ``spark_partition_id``);
2. count rows per bucket (one map-side-combinable hash-agg reducing
   to at most ``n_buckets`` rows), prefix-sum the counts into
   per-bucket rank offsets with a window over that TINY aggregated
   table, and broadcast-join the offsets back;
3. window WITHIN each bucket for the local row_number, add the
   offset: ``global_rn = local_rn + offset[bucket]``.

The whole computation is ONE lazy plan — no ``collect`` between
stages, so materializing the result is a single job (the bounds and
offset subqueries run as broadcast-exchange subjobs inside it). The
only single-partition shapes are over aggregated inputs bounded by
``n_buckets`` rows regardless of table size (the shape
``tools/explain_audit.py`` explicitly permits). Ties on the first
sort column all land in the same bucket (the bucket id depends only
on that column), so later tie-break columns order them correctly
inside one window partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["with_global_row_number", "with_exact_ntile", "ntile_from_rn"]


def with_global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    rn_col: str = "rn",
    n_buckets: int = 64,
    total_col: str | None = None,
) -> DataFrame:
    """Append an exact global ``ROW_NUMBER() OVER (ORDER BY
    order_cols)`` column without a global sort and without any driver
    action — the result is a single lazy plan.

    If ``total_col`` is given, the (constant) total row count is also
    appended as a column, available to downstream closed-form
    computations (NTILE) without a separate ``count()`` job.

    ``order_cols`` must be a total order (include a unique tie-break
    key last) for the row numbering to be deterministic.
    """
    first = order_cols[0]
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(F.percentile_approx(first, probs, 10_000).alias("_bnds"))
    # Bucket id = number of bounds strictly below the value: a HOF fold
    # over the broadcast bounds array, fully inside codegen. NULL
    # values (and an all-NULL/empty input, where the sketch is NULL)
    # coalesce to bucket 0, matching NULLS FIRST ordering.
    tagged = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "_bkt",
            F.coalesce(
                F.aggregate(
                    "_bnds",
                    F.lit(0),
                    lambda acc, b: acc
                    + F.when(F.col(first) > b, 1).otherwise(0),
                ),
                F.lit(0),
            ),
        )
        .drop("_bnds")
    )
    counts = tagged.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    w_tot = W.orderBy("_bkt").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    offsets = counts.select(
        "_bkt",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(w_tot).alias("_total"),
    )
    w = W.partitionBy("_bkt").orderBy(*[F.col(c) for c in order_cols])
    out = tagged.join(F.broadcast(offsets), "_bkt").withColumn(
        rn_col, (F.row_number().over(w) + F.col("_off")).cast("int")
    )
    if total_col is not None:
        return out.withColumnRenamed("_total", total_col).drop("_bkt", "_off")
    return out.drop("_bkt", "_off", "_total")


def ntile_from_rn(rn: Column, total: Column, n_tiles: int) -> Column:
    """SQL NTILE(n) bin from a 1-based global row number: the first
    ``total % n`` tiles get ``total // n + 1`` rows, the rest get
    ``total // n`` (ISO/ANSI semantics, matching Spark and DuckDB).
    ``total`` is a column so the whole assignment stays lazy."""
    base = F.floor(total / n_tiles)
    rem = total % n_tiles
    big = rem * (base + 1)
    safe_base = F.greatest(base, F.lit(1))  # base==0 ⇒ first branch always
    return (
        F.when(rn <= big, F.floor((rn - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((rn - big - 1) / safe_base) + 1)
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
    distributed and fully lazy: global row number via range buckets +
    broadcast offsets, then the closed-form NTILE group assignment —
    one job on materialization, no driver-side staging actions."""
    ranked = with_global_row_number(
        df, order_cols, rn_col="_grn", n_buckets=n_buckets, total_col="_tot"
    )
    return ranked.withColumn(
        bin_col, ntile_from_rn(F.col("_grn"), F.col("_tot"), n_tiles)
    ).drop("_grn", "_tot")
