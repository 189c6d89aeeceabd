"""Domain-function queries: SURVEY §2.8/§2.9 scalar kernels and the
remaining join/set/aggregate patterns, exercised over the driver's
oracle tables so every one is hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.functions.binary import (
    calc_orbital_plane_inclination_rad,
    calc_semi_major_axis_au,
    calc_total_log_luminosity,
)
from nbody6_data_pipeline_spark.functions.constants import AU_M, DAY_S, KEPLER_K
from nbody6_data_pipeline_spark.functions.hierarchy import hierarchy_pair_label
from nbody6_data_pipeline_spark.functions.misc import null_safe_ratio, run_id_label
from nbody6_data_pipeline_spark.queries import _t, ordered, q6, register


@register(
    "kepler_semi_major_axis",
    f"""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(cbrt({KEPLER_K!r} * (l_quantity + l_tax) *
                (POWER(10.0, l_discount * 2) * {DAY_S!r}) *
                (POWER(10.0, l_discount * 2) * {DAY_S!r})) / {AU_M!r}
                * 1000000 + 0.5) AS BIGINT) AS semi_au_e6
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber, semi_au_e6
    """,
)
def q_kepler_semi_major_axis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — Kepler-III semi-major axis (reference calc/binary.py:57-66)
    with constant-folded G*M_sun/4pi^2; masses/log-period played by
    lineitem columns. Bitwise-identical double arithmetic both engines.
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        q6(
            calc_semi_major_axis_au(
                F.col("l_quantity"), F.col("l_tax"), F.col("l_discount") * 2
            )
        ).alias("semi_au_e6"),
    ).transform(ordered, "l_orderkey", "l_linenumber", "semi_au_e6")


@register(
    "log_sum_exp_luminosity",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR((GREATEST(l_discount * 10, l_tax * 10)
             + log10(1.0 + POWER(10.0, -ABS(l_discount * 10 - l_tax * 10))))
             * 1000000 + 0.5) AS BIGINT) AS total_log_lum_e6
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber, total_log_lum_e6
    """,
)
def q_log_sum_exp_luminosity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — numerically-stable log-sum-exp total luminosity
    (reference calc/binary.py:10-17)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        q6(
            calc_total_log_luminosity(
                F.col("l_discount") * 10, F.col("l_tax") * 10
            )
        ).alias("total_log_lum_e6"),
    ).transform(ordered, "l_orderkey", "l_linenumber", "total_log_lum_e6")


@register(
    "orbital_inclination",
    """
    WITH v AS (
      SELECT l_orderkey, l_linenumber,
             l_quantity AS rx, l_extendedprice / 1000.0 AS ry, l_discount * 10 AS rz,
             l_tax * 10 AS vx, l_linenumber * 1.0 AS vy, 1.0 AS vz
      FROM lineitem WHERE l_orderkey <= 200
    ),
    h AS (
      SELECT l_orderkey, l_linenumber,
             ry * vz - rz * vy AS hx,
             rz * vx - rx * vz AS hy,
             rx * vy - ry * vx AS hz
      FROM v
    )
    SELECT l_orderkey, l_linenumber,
      CAST(FLOOR((CASE WHEN sqrt(hx*hx + hy*hy + hz*hz) < 1e-12 THEN 0.0
           ELSE acos(LEAST(GREATEST(hz / sqrt(hx*hx + hy*hy + hz*hz), -1.0), 1.0))
      END) * 1000000 + 0.5) AS BIGINT) AS incl_rad_e6
    FROM h
    ORDER BY l_orderkey, l_linenumber, incl_rad_e6
    """,
)
def q_orbital_inclination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/U5 — orbital-plane inclination via the 3-component cross
    product + clipped arccos (reference calc/binary.py:69-92), on
    synthetic vectors built from lineitem columns."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    rel_pos = (
        F.col("l_quantity"),
        F.col("l_extendedprice") / 1000.0,
        F.col("l_discount") * 10,
    )
    rel_vel = (F.col("l_tax") * 10, F.col("l_linenumber") * 1.0, F.lit(1.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        q6(calc_orbital_plane_inclination_rad(rel_pos, rel_vel)).alias(
            "incl_rad_e6"
        ),
    ).transform(ordered, "l_orderkey", "l_linenumber", "incl_rad_e6")


@register(
    "hierarchy_pair_labels",
    """
    SELECT l_orderkey, l_linenumber,
      CASE WHEN (CASE WHEN 2 > 1 THEN 1 ELSE 0 END, LEAST(l_partkey, l_suppkey))
                <= (0, l_orderkey)
           THEN '(' || array_to_string(list_sort([l_partkey, l_suppkey]), '+') || ')'
                || '+' || CAST(l_orderkey AS VARCHAR)
           ELSE CAST(l_orderkey AS VARCHAR) || '+'
                || '(' || array_to_string(list_sort([l_partkey, l_suppkey]), '+') || ')'
      END AS pair
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber, pair
    """,
)
def q_hierarchy_pair_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 — canonical hierarchy pair label (reference
    assembler.py:260-287): groups parenthesized with sorted members,
    singletons sort before groups, then by smallest member id."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        hierarchy_pair_label(
            F.array("l_partkey", "l_suppkey"), F.array("l_orderkey")
        ).alias("pair"),
    ).transform(ordered, "l_orderkey", "l_linenumber", "pair")


@register(
    "group_collect_sorted",
    """
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_partkey)), ',') AS parts_csv,
           len(list(l_partkey)) AS n_parts
    FROM lineitem
    WHERE l_orderkey <= 100
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
)
def q_group_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — group-collect to a deterministic sorted array (reference
    assembler.py:88-96 groupby().apply(list)).

    The sorted collection is emitted as a joined string (not a raw
    array column): the driver's oracle harness canonicalizes outputs
    with pandas sort_values, which cannot hash list cells.
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("l_partkey")), ","
            ).alias("parts_csv"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .transform(ordered, "l_orderkey")
    )


@register(
    "subset_containment",
    """
    WITH sets AS (
      SELECT o_custkey, list_sort(list(DISTINCT o_orderpriority)) AS prios
      FROM orders GROUP BY o_custkey
    ),
    dsets AS (SELECT DISTINCT prios FROM sets),
    contained AS (
      SELECT a.prios
      FROM dsets a
      SEMI JOIN dsets b
        ON len(list_filter(a.prios, x -> NOT list_contains(b.prios, x))) = 0
           AND len(a.prios) < len(b.prios)
    ),
    top AS (
      SELECT s.o_custkey FROM sets s
      ANTI JOIN contained c ON s.prios = c.prios
    )
    SELECT COUNT(*) AS n_maximal FROM top
    """,
)
def q_subset_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 — subset-containment anti-join (reference observer.py:98-109:
    keep member sets not strictly contained in another's): customers
    whose priority set is maximal.

    Scale shape: the quadratic (non-equi) subset check runs only over
    DISTINCT sets — bounded by the value-combination space, not row
    count — then an equi-anti-join maps the verdict back to rows. The
    naive row-level self-join measured O(n^2) nested-loop (98s at
    sf0.1); this form is ~0.5s and survives 100x scale-up.
    """
    o = _t(spark, sf_dir, "orders")
    sets = o.groupBy("o_custkey").agg(
        F.array_sort(F.collect_set("o_orderpriority")).alias("prios")
    )
    dsets = sets.select("prios").distinct()
    a, b = dsets.alias("a"), dsets.alias("b")
    contained = a.join(
        b,
        (F.size(F.array_except(F.col("a.prios"), F.col("b.prios"))) == 0)
        & (F.size(F.col("a.prios")) < F.size(F.col("b.prios"))),
        "left_semi",
    )
    top = sets.join(contained, ["prios"], "left_anti")
    return top.agg(F.count(F.lit(1)).alias("n_maximal"))


@register(
    "histogram_pivot",
    """
    SELECT o_orderpriority,
      COUNT(*) FILTER (WHERE o_totalprice < 50000) AS bin_low,
      COUNT(*) FILTER (WHERE o_totalprice >= 50000 AND o_totalprice < 150000) AS bin_mid,
      COUNT(*) FILTER (WHERE o_totalprice >= 150000) AS bin_high
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_histogram_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — per-(group, bin) histogram pivoted wide (reference
    dataset_split.ipynb `_compile_histograms`)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_totalprice") < 50000, 1)).alias("bin_low"),
            F.count(
                F.when(
                    (F.col("o_totalprice") >= 50000)
                    & (F.col("o_totalprice") < 150000),
                    1,
                )
            ).alias("bin_mid"),
            F.count(F.when(F.col("o_totalprice") >= 150000, 1)).alias("bin_high"),
        )
        .transform(ordered, "o_orderpriority")
    )


@register(
    "nearest_timestamp",
    """
    WITH ranked AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY ABS(epoch_us(ts) - 1710000000000000), event_id
             ) AS rn
      FROM events
    )
    SELECT user_id, event_id, us FROM ranked WHERE rn = 1
    ORDER BY user_id
    """,
)
def q_nearest_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — nearest-key lookup (reference parser/base.py:96-106: the
    closest-timestamp suggestion): per user, the event closest to a
    target instant. TakeOrdered per group, no full sort."""
    from nbody6_data_pipeline_spark.queries import ensure_confs, event_us

    ensure_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.withColumn("us", event_us(ev))
    w = W.partitionBy("user_id").orderBy(
        F.abs(F.col("us") - F.lit(1_710_000_000_000_000)), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_id", "us")
        .transform(ordered, "user_id")
    )


@register(
    "format_run_labels",
    """
    SELECT n_nationkey,
           printf('Rad%02d-zmet%04d-M%d-%04d',
                  n_regionkey, n_nationkey * 7, n_nationkey % 9, n_nationkey * 41)
             AS run_id
    FROM nation
    ORDER BY n_nationkey
    """,
)
def q_format_run_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F24 — run_id label formatting (reference utils.py:72)."""
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        run_id_label(
            F.col("n_regionkey"),
            F.col("n_nationkey") * 7,
            F.col("n_nationkey") % 9,
            F.col("n_nationkey") * 41,
        ).alias("run_id"),
    ).transform(ordered, "n_nationkey")


@register(
    "null_safe_ratios",
    """
    SELECT p_partkey,
           p_retailprice / NULLIF(p_size, 0) AS price_per_size,
           CAST(FLOOR(log10(GREATEST(p_retailprice, 1e-300)) * 1000000 + 0.5)
                AS BIGINT) AS log_price_e6,
           sqrt(p_retailprice) AS sqrt_price
    FROM part
    ORDER BY p_partkey
    """,
)
def q_null_safe_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20/F22 — null-safe derived ratios + configurable transforms
    (notebook derived metrics; `_apply_ops`)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        null_safe_ratio(F.col("p_retailprice"), F.col("p_size")).alias(
            "price_per_size"
        ),
        q6(
            F.log10(F.greatest(F.col("p_retailprice"), F.lit(1e-300)))
        ).alias("log_price_e6"),
        F.sqrt("p_retailprice").alias("sqrt_price"),
    ).transform(ordered, "p_partkey")
