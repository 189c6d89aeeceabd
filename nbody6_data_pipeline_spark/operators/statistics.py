"""Per-snapshot statistics (SURVEY §2.4 A2-A5).

Reference: snapshot.py:164-305 (overall, 3-scope descriptive stats)
and snapshot.py:314-440 (annular histograms); stacking across
snapshots/series/collections (series.py:158-194, collection.py:202-242)
is free here — the tables already carry the full composite key, so one
``groupBy(*group_cols)`` replaces the reference's container-tree walk.

Exact percentiles (``percentile``, linear interpolation — pandas
``quantile`` parity) rather than percentile_approx (SURVEY §7.4.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCOPES = [
    ("", None),
    ("within_r_tidal_", "is_within_r_tidal"),
    ("within_2x_r_tidal_", "is_within_2x_r_tidal"),
]

BIN_STAT_COLS = ["ecc", "semi", "log_period_days"]
BIN_TYPES = ["wide", "hard", "unresolved"]


def _descriptive(col: F.Column, key: str, prefix: str) -> list[F.Column]:
    """mean/std/min/q1/median/q3/max (reference calc/summary.py:20-36;
    std is the pandas default sample std, ddof=1)."""
    return [
        F.avg(col).alias(f"{prefix}{key}_mean"),
        F.stddev_samp(col).alias(f"{prefix}{key}_std"),
        F.min(col).alias(f"{prefix}{key}_min"),
        F.percentile(col, F.lit(0.25)).alias(f"{prefix}{key}_q1"),
        F.percentile(col, F.lit(0.5)).alias(f"{prefix}{key}_median"),
        F.percentile(col, F.lit(0.75)).alias(f"{prefix}{key}_q3"),
        F.max(col).alias(f"{prefix}{key}_max"),
    ]


def overall_statistics(
    stars: DataFrame,
    binary_systems: DataFrame,
    snapshot_headers: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """A3 — scoped descriptive statistics per snapshot group.

    One aggregation pass per table: the reference's three mask_specs
    loops (snapshot.py:181-211) become ``when(scope_flag, col)``
    conditional aggregates — the hand-rolled grouping-sets pattern,
    kept exact rather than CUBE for parity.
    """
    star_aggs: list[F.Column] = []
    for prefix, flag in SCOPES:
        mass = (
            F.col("mass") if flag is None else F.when(F.col(flag), F.col("mass"))
        )
        is_bin = (
            F.col("is_binary")
            if flag is None
            else F.when(F.col(flag), F.col("is_binary"))
        )
        star_aggs += [
            F.count(mass).alias(f"{prefix}n_star"),
            F.sum(is_bin.cast("int")).alias(f"{prefix}n_binary_star"),
            F.coalesce(F.sum(mass), F.lit(0.0)).alias(f"{prefix}total_mass"),
            *_descriptive(mass, "mass", prefix),
        ]
    star_stats = stars.groupBy(*group_cols).agg(*star_aggs)

    has_unresolved = "is_unresolved_binary_system" in binary_systems.columns
    bin_types = [t for t in BIN_TYPES if t != "unresolved" or has_unresolved]

    bin_aggs: list[F.Column] = []
    for prefix, flag in SCOPES:
        def scoped(c: F.Column) -> F.Column:
            return c if flag is None else F.when(F.col(flag), c)

        bin_aggs.append(
            F.count(scoped(F.lit(1))).alias(f"{prefix}n_binary_system")
        )
        for col in BIN_STAT_COLS:
            bin_aggs += _descriptive(scoped(F.col(col)), col, prefix)
        for t in bin_types:
            bin_aggs.append(
                F.sum(scoped(F.col(f"is_{t}_binary_system")).cast("int")).alias(
                    f"{prefix}n_{t}_binary_system"
                )
            )
    bin_stats = binary_systems.groupBy(*group_cols).agg(*bin_aggs)

    hdr = snapshot_headers.select(*group_cols, "r_tidal", "r_half_mass")
    out = star_stats.join(bin_stats, group_cols, "left").join(
        hdr, group_cols, "left"
    )
    # count columns are 0 (not NULL) when a scope or the whole binary
    # table is empty (snapshot.py:249-296 sets explicit zeros)
    zero_cols = {}
    for prefix, _ in SCOPES:
        zero_cols[f"{prefix}n_binary_star"] = F.coalesce(
            F.col(f"{prefix}n_binary_star"), F.lit(0)
        )
        zero_cols[f"{prefix}n_binary_system"] = F.coalesce(
            F.col(f"{prefix}n_binary_system"), F.lit(0)
        )
        for t in bin_types:
            c = f"{prefix}n_{t}_binary_system"
            zero_cols[c] = F.coalesce(F.col(c), F.lit(0))
    return out.withColumns(zero_cols)


def annular_statistics(
    stars: DataFrame,
    binary_systems: DataFrame,
    group_cols: list[str],
    dist_keys: tuple[str, ...] = ("dist_dc_r_tidal", "dist_dc_r_half_mass"),
) -> DataFrame:
    """A4 — annular histogram per (group, dist_key, radius).

    radius = ceil(max(dist, 0)); np.bincount == groupBy-count. A star
    counts as a binary star here iff its hierarchy intersects the
    CURRENT snapshot's pair labels (snapshot.py:325-345) — not the
    static is_binary flag. Bins with n_star == 0 are dropped
    (snapshot.py:417).
    """
    has_unresolved = "is_unresolved_binary_system" in binary_systems.columns
    bin_types = [t for t in BIN_TYPES if t != "unresolved" or has_unresolved]

    pairs = binary_systems.select(*group_cols, "pair").distinct()
    star_flag = (
        stars.select(*group_cols, "name", F.explode("hierarchy").alias("pair"))
        .join(pairs, [*group_cols, "pair"], "left_semi")
        .select(*group_cols, "name")
        .distinct()
        .withColumn("_is_binary_star", F.lit(1))
    )
    flagged = stars.join(star_flag, [*group_cols, "name"], "left").withColumn(
        "_is_binary_star", F.coalesce("_is_binary_star", F.lit(0))
    )

    stacked_star = flagged.selectExpr(
        *group_cols,
        "_is_binary_star",
        "stack({n}, {args}) AS (dist_key, dist)".format(
            n=len(dist_keys),
            args=", ".join(f"'{k}', {k}" for k in dist_keys),
        ),
    ).withColumn("radius", F.ceil(F.greatest(F.col("dist"), F.lit(0.0))))
    star_counts = stacked_star.groupBy(*group_cols, "dist_key", "radius").agg(
        F.count(F.lit(1)).alias("n_star"),
        F.sum("_is_binary_star").alias("n_binary_star"),
    )

    stacked_bin = binary_systems.selectExpr(
        *group_cols,
        *[f"is_{t}_binary_system" for t in bin_types],
        "stack({n}, {args}) AS (dist_key, dist)".format(
            n=len(dist_keys),
            args=", ".join(f"'{k}', {k}" for k in dist_keys),
        ),
    ).withColumn("radius", F.ceil(F.greatest(F.col("dist"), F.lit(0.0))))
    bin_counts = stacked_bin.groupBy(*group_cols, "dist_key", "radius").agg(
        F.count(F.lit(1)).alias("n_binary_system"),
        *[
            F.sum(F.col(f"is_{t}_binary_system").cast("int")).alias(
                f"n_{t}_binary_system"
            )
            for t in bin_types
        ],
    )

    joined = star_counts.join(
        bin_counts, [*group_cols, "dist_key", "radius"], "full_outer"
    )
    zero_cols = ["n_star", "n_binary_star", "n_binary_system"] + [
        f"n_{t}_binary_system" for t in bin_types
    ]
    joined = joined.withColumns(
        {c: F.coalesce(F.col(c), F.lit(0)) for c in zero_cols}
    ).withColumn("n_single", F.col("n_star") - F.col("n_binary_star"))

    return joined.filter(F.col("n_star") > 0).select(
        *group_cols,
        "dist_key",
        "radius",
        "n_star",
        "n_single",
        "n_binary_star",
        "n_binary_system",
        *sorted(f"n_{t}_binary_system" for t in bin_types),
    )


def timestamp_summary(headers: DataFrame, group_cols: list[str]) -> DataFrame:
    """A9 — count/min/max/mean-step of timestamps per run
    (reference calc/summary.py:7-17). mean(diff) == (max-min)/(n-1).
    """
    n = F.count(F.lit(1))
    return headers.groupBy(*group_cols).agg(
        n.alias("count"),
        F.min("time").alias("min"),
        F.max("time").alias("max"),
        F.round(
            F.when(n > 1, (F.max("time") - F.min("time")) / (n - 1)), 2
        ).alias("step"),
    )
