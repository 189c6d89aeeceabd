"""Z-order (Morton) clustering for multi-dimensional data skipping.

The file-layout primitive behind `OPTIMIZE ZORDER BY` in lakehouse
table formats: interleave the bits of two (or more) scaled column
values so that rows close in BOTH dimensions land in the same bucket
("file"). Per-bucket min/max column stats then prune 2-D range
predicates the way parquet footer stats prune 1-D ones — a linear
(single-column-sorted) layout can only ever prune on its sort column,
while the Z-order curve bounds every bucket to a small rectangle of
the key space, so a selective 2-D predicate skips all but the few
buckets whose rectangles intersect it.

Everything here is integer arithmetic (scale to a 2^bits grid by
integer multiply-divide against the column max, interleave via
div/mod-by-powers-of-two sums), so bucket assignment and the derived
stats are bit-exact pure functions of the data, replayable in any SQL
engine — the same determinism contract as the sketch family.

No reference analogue (single-node pandas has no file layout); this is
a north-star scale extension: at 100 TB the bucket id is the column to
``repartitionByRange`` / write-partition on, and the emitted per-bucket
stats ARE the skipping index a scan planner consults.

Relationship to ``plans/layout.write_zordered``: that module is the
WRITER (float min-max normalization is fine when the key only orders a
range shuffle, and tests verify pruning via input_file_name); this
module is the cross-engine AUDIT — all-integer bucket math so the
layout decision itself is hash-checkable against an independent SQL
engine, which a float normalize cannot guarantee bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZBITS = 4  # bits per dimension -> 16 x 16 grid = 256 Morton buckets


def grid_coord_sql(col: str, max_col: str, bits: int = ZBITS, idiv: str = "div") -> str:
    """SQL for the integer grid coordinate of ``col`` in [0, 2^bits):
    (col * 2^bits) intdiv (max + 1). Pure integer multiply-divide —
    identical in Spark (`div`) and DuckDB (`//`, pass idiv='//')
    for the non-negative keys this targets."""
    return f"(({col}) * {1 << bits}) {idiv} (({max_col}) + 1)"


def morton_sql(px: str, py: str, bits: int = ZBITS, idiv: str = "div") -> str:
    """SQL for the Morton interleave of two grid coordinates: bit b of
    px lands at position 2b, bit b of py at 2b+1. Rendered as a sum of
    div/mod-by-constant terms so the same string parses in Spark SQL
    and (with idiv='//') DuckDB — no engine-specific bit operators."""
    terms = []
    for b in range(bits):
        terms.append(f"((({px}) {idiv} {1 << b}) % 2) * {1 << (2 * b)}")
        terms.append(f"((({py}) {idiv} {1 << b}) % 2) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


def max_bounds(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """One-row (_mx, _my) frame with the exact max of both keys —
    the grid scale. Broadcast wherever the coordinates are needed so
    the scale is computed once per plan."""
    return df.agg(
        F.max(x_col).cast("long").alias("_mx"),
        F.max(y_col).cast("long").alias("_my"),
    )


def zorder_bucket_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = ZBITS,
    mx: DataFrame | None = None,
) -> DataFrame:
    """Per-Z-bucket skipping stats for a two-key table.

    One broadcast-sized max() aggregate fixes the grid scale, then a
    single hash aggregation keyed by the Morton bucket emits
    (bucket, n_rows, min/max of both keys) — the skipping index. The
    fact table never shuffles more than one (bucket-keyed, map-side
    combined) aggregation; at write time the same bucket expression
    feeds repartitionByRange to actually lay files out along the
    curve. Rows with a NULL key get bucket NULL (kept: a real layout
    needs somewhere to put them, and both engines group NULLs
    together).
    """
    if mx is None:
        mx = max_bounds(df, x_col, y_col)
    px = grid_coord_sql(x_col, "_mx", bits)
    py = grid_coord_sql(y_col, "_my", bits)
    bucket = morton_sql(px, py, bits)
    return (
        df.crossJoin(F.broadcast(mx))
        .selectExpr(
            f"CAST({bucket} AS BIGINT) AS bucket",
            f"CAST({x_col} AS BIGINT) AS _x",
            f"CAST({y_col} AS BIGINT) AS _y",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("_x").alias("min_x"),
            F.max("_x").alias("max_x"),
            F.min("_y").alias("min_y"),
            F.max("_y").alias("max_y"),
        )
    )
