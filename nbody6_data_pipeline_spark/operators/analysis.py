"""M6 — cross-run analysis layer (notebook pipelines, SURVEY §3.3).

F20 derived ratio metrics, W4 grid alignment (interpolate.py), and A6
multi-key cross-run aggregation — the overall_stat / annular_stats /
filtered_annular_stats notebook dataflows as one declarative pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.functions.misc import null_safe_ratio
from nbody6_data_pipeline_spark.operators.interpolate import interpolate_on_grid

INIT_KEYS = ["init_gc_radius", "init_metallicity", "init_mass_lv", "init_pos"]


def derive_overall_metrics(stats: DataFrame) -> DataFrame:
    """F20 — fraction/ratio metrics over the overall-stats table
    (overall_stat.ipynb cell 3): binary fraction, hard/unresolved
    fractions, r_hm/r_tidal, n_single; 0 denominators -> NULL."""
    out = {}
    for prefix in ("", "within_r_tidal_", "within_2x_r_tidal_"):
        n_sys = F.col(f"{prefix}n_binary_system")
        n_star = F.col(f"{prefix}n_star")
        n_bstar = F.col(f"{prefix}n_binary_star")
        n_single = n_star - n_bstar
        out[f"{prefix}n_single"] = n_single
        out[f"{prefix}binary_fraction"] = null_safe_ratio(
            n_sys.cast("double"), (n_sys + n_single).cast("double")
        )
        for t in ("hard", "wide", "unresolved"):
            c = f"{prefix}n_{t}_binary_system"
            if c in stats.columns:
                out[f"{prefix}{t}_binary_fraction"] = null_safe_ratio(
                    F.col(c).cast("double"), n_sys.cast("double")
                )
    out["f_r"] = null_safe_ratio(F.col("r_half_mass"), F.col("r_tidal"))
    return stats.withColumns(out)


def derive_annular_metrics(annular: DataFrame) -> DataFrame:
    """F20 over the annular table (annular_stats.ipynb cell 3)."""
    n_sys = F.col("n_binary_system")
    n_single = F.col("n_single")
    out = {
        "binary_fraction": null_safe_ratio(
            n_sys.cast("double"), (n_sys + n_single).cast("double")
        )
    }
    for t in ("hard", "wide", "unresolved"):
        c = f"n_{t}_binary_system"
        if c in annular.columns:
            out[f"{t}_binary_fraction"] = null_safe_ratio(
                F.col(c).cast("double"), n_sys.cast("double")
            )
    return annular.withColumns(out)


def align_stats_to_grid(
    stats: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
    time_col: str = "time",
    step: float = 1.0,
) -> DataFrame:
    """W4 applied to a stats table; drops rows where every metric is
    NULL (the notebooks' dropna(how='all'))."""
    aligned = interpolate_on_grid(
        stats, group_cols, time_col, value_cols, step=step
    )
    keep = None
    for c in value_cols:
        cond = F.col(c).isNotNull()
        keep = cond if keep is None else (keep | cond)
    return aligned.filter(keep)


def cross_run_aggregate(
    aligned: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
    include_median: bool = True,
) -> DataFrame:
    """A6 — multi-key aggregation across init_pos realizations
    (overall_stat.ipynb / annular_stats.ipynb cell 5): mean/std +
    median or count per metric, with flattened column names."""
    aggs = []
    for c in value_cols:
        aggs.append(F.avg(c).alias(f"{c}_mean"))
        aggs.append(F.stddev_samp(c).alias(f"{c}_std"))
        if include_median:
            aggs.append(F.percentile(c, F.lit(0.5)).alias(f"{c}_median"))
        else:
            aggs.append(F.count(c).alias(f"{c}_count"))
    return aligned.groupBy(*group_cols).agg(*aggs)
