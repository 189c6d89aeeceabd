"""W4 — time-grid linear interpolation (the flagship custom transform).

Reference: overall_stat.ipynb / annular_stats.ipynb cell 3: per group,
reindex each metric onto union(observed timestamps, uniform grid
0..max step 1), pandas ``interpolate('index', limit_area='inside')``,
then restrict to the grid. Semantics preserved exactly:

- exact values at observed timestamps that coincide with grid points
- linear interpolation between the nearest observed neighbors
- NULL outside each group's [first, last] observed range

Native plan: grid rows via sequence+explode unioned with observed
rows, forward/backward ignore-null window scans to find the
bracketing observed points, one arithmetic blend — a single shuffle
on the group key. The reference's per-group joblib fan-out becomes
shuffle partitioning (SURVEY §2.5 W4, §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def interpolate_on_grid(
    df: DataFrame,
    group_cols: list[str],
    time_col: str,
    value_cols: list[str],
    step: float = 1.0,
    grid_start: float = 0.0,
) -> DataFrame:
    """Interpolate ``value_cols`` of ``df`` onto the uniform grid
    ``grid_start, +step, ..`` up to each group's max observed time.

    Returns one row per (group, grid time) with interpolated values.
    """
    obs = df.select(*group_cols, F.col(time_col).alias("_t"), *value_cols)

    grid = (
        obs.groupBy(*group_cols)
        .agg(F.max("_t").alias("_tmax"))
        .select(
            *group_cols,
            F.explode(
                F.sequence(
                    F.lit(0),
                    # np.arange(start, max+step, step) endpoint parity:
                    # last k with k*step < max-start+step, i.e. ceil(m)
                    # for fractional m, m itself for integral m
                    F.ceil((F.col("_tmax") - F.lit(grid_start)) / F.lit(step)).cast(
                        "int"
                    ),
                )
            ).alias("_i"),
        )
        .select(
            *group_cols,
            (F.lit(grid_start) + F.col("_i").cast("double") * F.lit(step)).alias("_t"),
            F.lit(1).alias("_on_grid"),
        )
    )

    union = (
        obs.withColumn("_on_grid", F.lit(None).cast("int"))
        .unionByName(
            grid.select(
                *group_cols,
                "_t",
                *[F.lit(None).cast("double").alias(c) for c in value_cols],
                "_on_grid",
            )
        )
        # a grid point that coincides with an observed time must not
        # duplicate: aggregate them together (observed value wins;
        # _on_grid flag survives)
        .groupBy(*group_cols, "_t")
        .agg(
            F.max("_on_grid").alias("_on_grid"),
            *[F.max(c).alias(c) for c in value_cols],
        )
    )

    w_back = (
        W.partitionBy(*group_cols)
        .orderBy("_t")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy(*group_cols)
        .orderBy("_t")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )

    out_cols: dict[str, F.Column] = {}
    proj = union
    for c in value_cols:
        t_if_obs = F.when(F.col(c).isNotNull(), F.col("_t"))
        proj = proj.withColumns(
            {
                f"_pv_{c}": F.last(c, ignorenulls=True).over(w_back),
                f"_pt_{c}": F.last(t_if_obs, ignorenulls=True).over(w_back),
                f"_nv_{c}": F.first(c, ignorenulls=True).over(w_fwd),
                f"_nt_{c}": F.first(t_if_obs, ignorenulls=True).over(w_fwd),
            }
        )
        frac = (F.col("_t") - F.col(f"_pt_{c}")) / (
            F.col(f"_nt_{c}") - F.col(f"_pt_{c}")
        )
        out_cols[c] = (
            F.when(F.col(c).isNotNull(), F.col(c))
            .when(
                F.col(f"_pv_{c}").isNull() | F.col(f"_nv_{c}").isNull(),
                F.lit(None),
            )
            .otherwise(
                F.col(f"_pv_{c}")
                + (F.col(f"_nv_{c}") - F.col(f"_pv_{c}")) * frac
            )
        )

    return (
        proj.filter(F.col("_on_grid") == 1)
        .select(
            *group_cols,
            F.col("_t").alias(time_col),
            *[expr.alias(c) for c, expr in out_cols.items()],
        )
    )
