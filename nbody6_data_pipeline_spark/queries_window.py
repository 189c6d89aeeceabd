"""Window / time-series queries (SURVEY §2.5 W1-W6, §2.4 A8-A10, §2.3 J10).

Event timestamps in the synthetic tables have varied physical parquet
type across data generations (TIMESTAMP(NANOS) read as LONG nanos
under ``nanosAsLong``; TIMESTAMP(MICROS) read as TIMESTAMP_NTZ) — so
all event-time arithmetic is done in integer epoch MICROseconds on
both sides (Spark: ``event_us`` in queries.py, DuckDB:
``epoch_us(ts)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.ranking import with_exact_ntile
from nbody6_data_pipeline_spark.queries import ensure_confs, event_us, ordered, register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("us", event_us(df))


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_confs(spark)
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@register(
    "half_mass_cutoff",
    """
    WITH cum AS (
      SELECT l_orderkey, l_linenumber,
             SUM(CAST(l_quantity AS DECIMAL(30,4)))
               OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_qty,
             SUM(CAST(l_quantity AS DECIMAL(30,4)))
               OVER (PARTITION BY l_orderkey) AS total_qty
      FROM lineitem
    )
    SELECT l_orderkey,
           MIN(l_linenumber) AS half_line,
           CAST(MAX(total_qty) AS DOUBLE) AS total_qty
    FROM cum
    WHERE cum_qty * 2 >= total_qty
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
)
def q_half_mass_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/W2 — cumulative-sum quantile cutoff, the half-mass-radius
    pattern (reference calc/cluster.py:14-31: sort by distance,
    cumsum(mass), first index where cum >= total/2). Exact decimal
    cumsum; the `cum*2 >= total` form avoids FP division.
    """
    li = _lineitem(spark, sf_dir)
    w_cum = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("l_orderkey")
    dec_qty = F.col("l_quantity").cast("decimal(30,4)")
    cum = li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(dec_qty).over(w_cum).alias("cum_qty"),
        F.sum(dec_qty).over(w_all).alias("total_qty"),
    )
    return (
        cum.filter(F.col("cum_qty") * 2 >= F.col("total_qty"))
        .groupBy("l_orderkey")
        .agg(
            F.min("l_linenumber").alias("half_line"),
            F.max("total_qty").cast("double").alias("total_qty"),
        )
        # ordered(): the sort-sampling pass would re-run the fused
        # window+filter+agg stage (same-key agg piggybacks the window
        # shuffle); the per-order result is driver-bound
        .transform(ordered, "l_orderkey")
    )


@register(
    "timestamp_summary",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           MIN(epoch_us(ts)) AS first_us,
           MAX(epoch_us(ts)) AS max_us,
           CASE WHEN COUNT(*) > 1
                THEN CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS DOUBLE)
                     / (COUNT(*) - 1)
                ELSE NULL END AS mean_step_us
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_timestamp_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/W3 — timestamp summary: count/min/max/mean-step (reference
    calc/summary.py:7-17). mean(diff(sorted ts)) telescopes to
    (max-min)/(n-1), computed exactly on integer microseconds.
    """
    ev = _events(spark, sf_dir)
    n = F.count(F.lit(1))
    return (
        ev.groupBy("user_id")
        .agg(
            n.alias("n_events"),
            F.min("us").alias("first_us"),
            F.max("us").alias("max_us"),
            F.when(
                n > 1,
                (F.max("us") - F.min("us")).cast("double") / (n - 1),
            ).alias("mean_step_us"),
        )
        .transform(ordered, "user_id")
    )


@register(
    "ntile_binning",
    """
    SELECT bin, COUNT(*) AS n, MIN(c_acctbal) AS bal_min, MAX(c_acctbal) AS bal_max
    FROM (
      SELECT c_acctbal,
             NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS bin
      FROM customer
    )
    GROUP BY bin
    ORDER BY bin
    """,
)
def q_ntile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — quantile binning for stratification (reference
    dataset_split.ipynb `_bin_data` pd.qcut). Ties broken by key for
    determinism.

    NTILE stays only in the oracle SQL: a global NTILE window is a
    single-partition sort in Spark (the one WindowExec shape that dies
    at scale). The Spark plan uses the distributed exact-ntile
    operator: percentile-sketch range buckets -> per-bucket local
    row_number + broadcast offsets -> closed-form NTILE assignment
    (operators/ranking.py). Identical bins, no global sort.
    """
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    binned = with_exact_ntile(
        c.select("c_acctbal", "c_custkey"), ["c_acctbal", "c_custkey"], 4
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("bal_min"),
            F.max("c_acctbal").alias("bal_max"),
        )
        # coalesce, not repartition: the agg's exchange is already a
        # stage boundary, so AQE folds the 4-row final sort into the
        # reduce side instead of paying one more exchange round
        .coalesce(1)
        .sortWithinPartitions(F.col("bin").asc_nulls_last())
    )


@register(
    "dense_rank_factorize",
    """
    SELECT DISTINCT o_orderpriority,
           DENSE_RANK() OVER (ORDER BY o_orderpriority) AS group_id
    FROM orders
    ORDER BY group_id
    """,
)
def q_dense_rank_factorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — factorize: dense integer ids for a categorical key
    (reference dataset_split.ipynb `split()` pd.factorize).

    No window at all: partial map-side ``collect_set`` reduces the
    full table to the tiny category set (bounded by |categories| per
    task), ``array_sort`` + ``posexplode`` assigns the dense ids —
    equivalent to DENSE_RANK over the distinct values, with zero
    single-partition WindowExec (DENSE_RANK stays as the oracle SQL).
    """
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.agg(F.array_sort(F.collect_set("o_orderpriority")).alias("vals"))
        .select(
            F.posexplode("vals").alias("pos", "o_orderpriority"),
        )
        .select(
            "o_orderpriority",
            (F.col("pos") + 1).cast("int").alias("group_id"),
        )
        .transform(ordered, "group_id")
    )


@register(
    "sessionization",
    """
    WITH flagged AS (
      SELECT user_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                  > 1800000000 OR LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, us,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W3 — gap-based sessionization: lag + running sum of
    session-start flags — the same running-block-id window pattern the
    block-text reader uses (reference parser/base.py:241-307, SURVEY
    §2.5 W1). 30-minute gap threshold.
    """
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    flagged = ev.select(
        "user_id",
        "us",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0).alias(
            "new_session"
        ),
    )
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_cum))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .transform(ordered, "user_id")
    )


@register(
    "asof_join_prior_view",
    """
    WITH ordered AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
             MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_us
      FROM events
    )
    SELECT event_id, user_id, us, prior_view_us,
           us - prior_view_us AS us_since_view
    FROM ordered
    WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
)
def q_asof_join_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 — as-of (tolerance) alignment join: each purchase aligned to
    the most recent earlier 'view' by the same user (reference
    loader.py:138-200 aligns per-file timestamps the same way). Native
    windowed formulation — no applyInPandas needed; scales as one
    shuffle on user_id.
    """
    ev = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prior_view = F.max(
        F.when(F.col("event_type") == "view", F.col("us"))
    ).over(w)
    return (
        ev.select(
            "event_id",
            "user_id",
            "us",
            "event_type",
            prior_view.alias("prior_view_us"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "us",
            "prior_view_us",
            (F.col("us") - F.col("prior_view_us")).alias("us_since_view"),
        )
        .transform(ordered, "event_id")
    )


@register(
    "grid_interpolation",
    """
    WITH obs AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS value
      FROM events
      GROUP BY user_id, day
    ),
    grid AS (
      SELECT user_id, UNNEST(range(MIN(day), MAX(day) + 1)) AS day
      FROM obs GROUP BY user_id
    ),
    joined AS (
      SELECT g.user_id, g.day, o.value
      FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day
    ),
    bounded AS (
      SELECT user_id, day, value,
        LAST_VALUE(value IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
        LAST_VALUE(CASE WHEN value IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
        FIRST_VALUE(value IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
        FIRST_VALUE(CASE WHEN value IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
      FROM joined
    )
    SELECT user_id, day,
      CAST(FLOOR((CASE
        WHEN value IS NOT NULL THEN value
        WHEN prev_val IS NULL OR next_val IS NULL THEN NULL
        ELSE prev_val + (next_val - prev_val) * (CAST(day - prev_day AS DOUBLE)
             / CAST(next_day - prev_day AS DOUBLE))
      END) * 1000000 + 0.5) AS BIGINT) AS value_interp_e6
    FROM bounded
    ORDER BY user_id, day
    """,
)
def q_grid_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — the flagship custom transform: time-grid linear
    interpolation with pandas `interpolate('index',
    limit_area='inside')` semantics (reference overall_stat.ipynb /
    annular_stats.ipynb cell 3): exact at observed points, linear
    between them, NULL outside each group's observed range.

    Native plan: per-group daily grid via sequence+explode, left join
    observations, forward/backward ignore-null window scans, one
    arithmetic interpolation — a single shuffle on the group key; the
    reference's per-group joblib fan-out disappears into shuffle
    partitioning.
    """
    ev = _events(spark, sf_dir)
    obs = (
        ev.withColumn("day", F.expr("us div 86400000000"))
        .groupBy("user_id", "day")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("value")
        )
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    joined = grid.join(obs, ["user_id", "day"], "left")
    w_back = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    day_if_obs = F.when(F.col("value").isNotNull(), F.col("day"))
    bounded = joined.select(
        "user_id",
        "day",
        "value",
        F.last("value", ignorenulls=True).over(w_back).alias("prev_val"),
        F.last(day_if_obs, ignorenulls=True).over(w_back).alias("prev_day"),
        F.first("value", ignorenulls=True).over(w_fwd).alias("next_val"),
        F.first(day_if_obs, ignorenulls=True).over(w_fwd).alias("next_day"),
    )
    frac = (F.col("day") - F.col("prev_day")).cast("double") / (
        F.col("next_day") - F.col("prev_day")
    ).cast("double")
    interp = F.when(F.col("value").isNotNull(), F.col("value")).when(
        F.col("prev_val").isNull() | F.col("next_val").isNull(), F.lit(None)
    ).otherwise(
        F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * frac
    )
    # Quantize with explicit arithmetic (not ROUND): both engines run
    # the identical float ops on identical inputs -> identical bits;
    # engine ROUND() implementations tie-break differently.
    return bounded.select(
        "user_id",
        "day",
        F.floor(interp * 1_000_000 + 0.5).cast("long").alias("value_interp_e6"),
    ).transform(ordered, "user_id", "day")


@register(
    "bulk_velocity_subtraction",
    """
    WITH grp AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) FILTER (WHERE event_type = 'purchase')
               AS DOUBLE)
             / CAST(NULLIF(COUNT(*) FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE) AS bulk
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           e.value - g.bulk AS value_centered
    FROM events e JOIN grp g ON e.user_id = g.user_id
    WHERE g.bulk IS NOT NULL
    ORDER BY e.event_id
    """,
)
def q_bulk_velocity_subtraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — filtered group mean subtracted from every row (reference
    collect_inclination_stats.py:40-45: bulk velocity over stars
    within r_tidal subtracted from all stars). Windowed aggregate +
    rebroadcast, one shuffle on the group key.
    """
    ev = _events(spark, sf_dir)
    scoped = F.when(F.col("event_type") == "purchase", F.col("value"))
    grp = ev.groupBy("user_id").agg(
        (
            F.sum(scoped.cast("decimal(30,6)")).cast("double")
            / F.nullif(F.count(scoped), F.lit(0)).cast("double")
        ).alias("bulk")
    )
    return (
        ev.join(grp, "user_id")
        .filter(F.col("bulk").isNotNull())
        .select(
            "event_id",
            "user_id",
            (F.col("value") - F.col("bulk")).alias("value_centered"),
        )
        .transform(ordered, "event_id")
    )


@register(
    "dissolution_cut",
    """
    WITH cut AS (
      SELECT o_custkey,
             MIN(CASE WHEN o_orderstatus = 'F' AND o_totalprice < 1000
                      THEN epoch_us(o_orderdate) END) AS cut_us
      FROM orders GROUP BY o_custkey
    )
    SELECT o.o_custkey, COUNT(*) AS n_kept
    FROM orders o JOIN cut c ON o.o_custkey = c.o_custkey
    WHERE c.cut_us IS NULL OR epoch_us(o.o_orderdate) < c.cut_us
    GROUP BY o.o_custkey
    ORDER BY o.o_custkey
    """,
)
def q_dissolution_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 + ordering-sensitive truncation — the dissolved-cluster cut
    (reference assembler.py:522-527, 698-704): drop all rows at or
    after the first 'dissolved' timestamp per group, expressed as a
    min-over-group + comparison instead of an ordered scan (SURVEY §4
    'early abort' row).
    """
    ensure_confs(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "us", F.unix_timestamp("o_orderdate") * 1_000_000
    )
    dissolved = F.when(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 1000),
        F.col("us"),
    )
    cut = o.groupBy("o_custkey").agg(F.min(dissolved).alias("cut_us"))
    return (
        o.join(cut, "o_custkey")
        .filter(F.col("cut_us").isNull() | (F.col("us") < F.col("cut_us")))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .transform(ordered, "o_custkey")
    )


@register(
    "asof_join_tables",
    """
    WITH ev AS (
      SELECT event_id, user_id, epoch_us(ts) AS us, value, event_type
      FROM events
    ),
    p AS (SELECT event_id, user_id, us FROM ev WHERE event_type = 'purchase'),
    err AS (
      SELECT user_id, us, event_id, value
      FROM ev WHERE event_type = 'error'
      QUALIFY row_number() OVER (PARTITION BY user_id, us
                                 ORDER BY event_id DESC, value DESC) = 1
    ),
    j AS (
      SELECT p.event_id, p.user_id, p.us,
             e.us AS m_us, e.event_id AS m_eid, e.value AS m_val
      FROM p ASOF LEFT JOIN err e
        ON p.user_id = e.user_id AND p.us >= e.us
    )
    SELECT event_id, user_id, us,
           CASE WHEN us - m_us <= 7200000000 THEN m_us END AS us_match,
           CASE WHEN us - m_us <= 7200000000 THEN m_eid END AS event_id_match,
           CASE WHEN us - m_us <= 7200000000 THEN m_val END AS value_match
    FROM j ORDER BY event_id
    """,
)
def q_asof_join_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General two-table as-of join (operators/asof.py merge_asof):
    each purchase takes the latest prior-or-equal 'error' by the same
    user within a 2 h tolerance. One shuffle on user_id via the
    union-tag + last-non-null-window formulation — no range join. The
    oracle is DuckDB's NATIVE ASOF JOIN over the same tie-reduced
    right side, so the operator's semantics are pinned to the
    industry-standard definition, not a bespoke one."""
    from nbody6_data_pipeline_spark.operators.asof import merge_asof

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "us"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "us", "event_id", "value"
    )
    return merge_asof(
        purchases,
        errors,
        on="us",
        by=["user_id"],
        right_cols=["event_id", "value"],
        tolerance=7_200_000_000,
    ).transform(ordered, "event_id")


@register(
    "range_join_incidents",
    """
    WITH ev AS (SELECT event_id, epoch_us(ts) AS us, event_type FROM events),
    iv AS (
      SELECT us - 60000000 AS lo, us + 60000000 AS hi
      FROM ev WHERE event_type = 'error'
    ),
    hits AS (
      SELECT p.event_id, count(*) AS n
      FROM ev p JOIN iv ON p.us BETWEEN iv.lo AND iv.hi
      GROUP BY p.event_id
    )
    SELECT ev.event_id, COALESCE(hits.n, 0) AS n_incidents
    FROM ev LEFT JOIN hits ON ev.event_id = hits.event_id
    ORDER BY ev.event_id
    """,
)
def q_range_join_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-equi-key range join (operators/rangejoin.py): count, for
    every event, the +/-60 s incident windows (around error events)
    containing it. DuckDB executes the BETWEEN join natively; a naive
    Spark translation would be a BroadcastNestedLoopJoin (all-pairs,
    explain_audit's hard flag), so the operator buckets the time axis
    at the interval width and equi-joins on the bucket — shuffle-
    parallel, linear in points + matched pairs."""
    from nbody6_data_pipeline_spark.operators.rangejoin import range_join

    ev = _events(spark, sf_dir).select("event_id", "us", "event_type")
    points = ev.select("event_id", "us")
    iv = ev.filter(F.col("event_type") == "error").select(
        (F.col("us") - 60_000_000).alias("lo"),
        (F.col("us") + 60_000_000).alias("hi"),
    )
    pairs = range_join(points, "us", iv, "lo", "hi", bucket_width=120_000_000)
    hits = pairs.groupBy("event_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        points.join(hits, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n", F.lit(0)).alias("n_incidents"),
        )
        .transform(ordered, "event_id")
    )


@register(
    "events_json_extract",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: extract a field from the JSON
    ``props`` payload (get_json_object — JVM-side JSON path, no UDF)
    and aggregate it. The parse happens inside the scan stage's
    codegen; only (event_type, k) reaches the aggregate. Integer sums,
    so cross-engine exactness is free."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .transform(ordered, "event_type")
    )


# ---------------------------------------------------------------------------
# Product-analytics shapes: sequenced funnel and retention cohorts
# ---------------------------------------------------------------------------

_FUNNEL_WINDOW_US = 7 * 86_400_000_000  # each step within 7 days of the prior
_DAY_US = 86_400_000_000


@register(
    "events_funnel",
    f"""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    s1 AS (
      SELECT user_id, MIN(us) AS t1 FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(us) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
      WHERE event_type = 'click' AND us > t1 AND us <= t1 + {_FUNNEL_WINDOW_US}
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(us) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
      WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + {_FUNNEL_WINDOW_US}
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS n_view,
           (SELECT COUNT(*) FROM s2) AS n_click,
           (SELECT COUNT(*) FROM s3) AS n_purchase
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequenced conversion funnel: users who viewed, then clicked
    within 7 days of the first view, then purchased within 7 days of
    the first qualifying click — strict event-time ordering, the
    product-analytics query shape (and, for a training pipeline, the
    "document passed filter A, then B, then C" audit shape).

    Plan: three chained min-aggregations, every one keyed on user_id —
    after the first shuffle all joins and aggs are co-partitioned on
    the same key, so Catalyst reuses the partitioning instead of
    re-shuffling (one Exchange per step input, none between steps).
    Integer epoch-us arithmetic keeps it bit-deterministic.
    """
    e = _events(spark, sf_dir).select("user_id", "event_type", "us")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("us") > F.col("t1"))
            & (F.col("us") <= F.col("t1") + _FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("us") > F.col("t2"))
            & (F.col("us") <= F.col("t2") + _FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase")))
    )


@register(
    "events_retention_cohorts",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
    ),
    cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
    active AS (SELECT DISTINCT user_id, day FROM e)
    SELECT cohort_day,
           day - cohort_day AS day_offset,
           COUNT(*) AS n_active
    FROM active a JOIN cohort c ON a.user_id = c.user_id
    WHERE day - cohort_day <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen day, counted
    on each subsequent active day (offset 0-7). The same
    first-touch-attribution shape a training pipeline uses to track
    "documents first ingested in snapshot S still present in S+k".

    Plan: per-user min (hash agg), per-(user, day) distinct (hash agg),
    then an equi-join on user_id — all three keyed on user_id, so the
    shuffle is paid once and reused; the final rollup groups a tiny
    (cohort, offset) set. No windows, no sorts.
    """
    e = _events(spark, sf_dir).select(
        "user_id", (F.col("us") / F.lit(_DAY_US)).cast("long").alias("day")
    )
    cohort = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = e.distinct()
    return (
        active.join(cohort, "user_id")
        .withColumn("day_offset", F.col("day") - F.col("cohort_day"))
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .transform(ordered, "cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# Interval coverage (gaps-and-islands union length) and robust statistics
# ---------------------------------------------------------------------------

_SESSION_LEN_US = 30 * 60_000_000  # each event covers [us, us + 30min)


@register(
    "events_interval_coverage",
    f"""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {_SESSION_LEN_US} AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    )
    SELECT user_id,
           COUNT(DISTINCT island) AS n_islands,
           CAST(SUM(island_len) AS BIGINT) AS covered_us
    FROM (
      SELECT user_id, island, MAX(e) - MIN(s) AS island_len
      FROM islands GROUP BY user_id, island
    )
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage per user (gaps-and-islands): each event
    opens a 30-minute presence interval; overlapping intervals merge
    into islands and the covered time is the summed island lengths —
    the uptime/presence metric, and the shape behind "total wall-clock
    a document spent in any processing stage".

    Plan: one shuffle on user_id, then two streamed window passes over
    the same sort order (running max-end to flag island starts, running
    sum to number islands) and a two-level hash aggregate. Nothing
    global, nothing quadratic; integer microsecond arithmetic end to
    end.
    """
    e = _events(spark, sf_dir)
    iv = e.select(
        "user_id",
        F.col("us").alias("s"),
        (F.col("us") + F.lit(_SESSION_LEN_US)).alias("e"),
    )
    order = W.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        order.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(order.rowsBetween(W.unboundedPreceding, 0)),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("island_len")
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.countDistinct("island").alias("n_islands"),
            F.sum("island_len").alias("covered_us"),
        )
        .transform(ordered, "user_id")
    )


@register(
    "lineitem_mad",
    """
    WITH med AS (
      SELECT l_returnflag,
             ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS med_qty
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           ROUND(QUANTILE_CONT(ABS(l.l_quantity - m.med_qty), 0.5), 6) AS mad_qty
    FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q_lineitem_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    measure (stddev is outlier-dominated at corpus scale). Two-pass
    plan: per-group exact median (one hash-partitioned percentile
    aggregate), broadcast the tiny per-group medians back, then a
    second percentile over |x - med|. Both aggregations are keyed on
    the same column so the scan shuffles once per pass and the join is
    a broadcast. Medians rounded to 6 dp on both engines before the
    residual so interpolation ulps can't propagate.
    """
    li = _lineitem(spark, sf_dir)
    med = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("med_qty")
    )
    resid = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        F.abs(F.col("l_quantity") - F.col("med_qty")).alias("r"),
    )
    return (
        resid.groupBy("l_returnflag")
        .agg(F.round(F.expr("percentile(r, 0.5)"), 6).alias("mad_qty"))
        .transform(ordered, "l_returnflag")
    )


@register(
    "orders_priority_mode",
    """
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n
    FROM (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY COUNT(*) DESC, o_orderpriority) AS rk
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    )
    WHERE rk = 1
    ORDER BY o_orderstatus
    """,
)
def q_orders_priority_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with deterministic tie-break (argmax over counts)
    — the categorical summary the engine's native mode() can't provide
    cross-engine (tie behavior is engine-defined). Count first (hash
    aggregate collapses to |groups x categories| rows), THEN the
    window ranks that tiny set — the ranking never sees table-sized
    input, the same reduce-before-window discipline as
    dense_rank_factorize.
    """
    from nbody6_data_pipeline_spark.queries import _t

    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
        .transform(ordered, "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Calendar bucketing and sequence-transition analysis
# ---------------------------------------------------------------------------


@register(
    "events_weekly_summary",
    """
    SELECT CAST(epoch_us(date_trunc('week', ts)) AS BIGINT) AS week_us,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY week_us
    ORDER BY week_us
    """,
)
def q_events_weekly_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-aware weekly rollup: ISO weeks (both engines truncate
    to Monday 00:00) rather than fixed 7-day buckets from an epoch —
    the semantics reporting pipelines actually need, and a parity trap
    worth pinning cross-engine (week-start conventions differ across
    systems). Event time is reconstructed from integer epoch-us, so
    the truncation is timezone-free on both sides.
    """
    e = _events(spark, sf_dir)
    week = F.unix_micros(
        F.date_trunc("week", F.timestamp_micros(F.col("us")))
    )
    return (
        e.select(week.alias("week_us"), "user_id", "value")
        .groupBy("week_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .transform(ordered, "week_us")
    )


@register(
    "events_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
    """,
)
def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts (the first-order Markov matrix of
    user behavior; for a training pipeline, the stage-to-stage document
    flow matrix). One shuffle on user_id, a streamed lag over the
    per-user event-time order, then a hash rollup of the tiny
    |types x types| matrix. Ties within a timestamp are broken by
    event_id so the sequence — and therefore the matrix — is
    deterministic cross-engine.
    """
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(ordered, "prev_type", "next_type")
    )
