"""CDC / table-maintenance queries: the mutation-shaped operations a
production lakehouse pipeline runs continuously — latest-record-wins
compaction, upsert (MERGE) of a delta batch into a base snapshot, and
skew-safe joins.

The reference pipeline is append-only (each NBODY6 run directory is
immutable), but its snapshot-overwrite layer (reference io/writer.py
partitioned re-export) is exactly an upsert at the partition grain;
these queries express the row-grain equivalents Spark-first so the
engine covers the ingestion side of a 100 TB corpus, not just the
analytics side.

Determinism: base/delta membership is content-addressed (md5 buckets,
same idiom as doc_deterministic_sample) so both engines carve
identical delta sets without any notion of "arrival time".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from nbody6_data_pipeline_spark.plans.skew import salted_join
from nbody6_data_pipeline_spark.queries import (
    _t,
    dsum,
    event_us,
    md5_bucket,
    ordered,
    register,
)

# ---------------------------------------------------------------------------
# Latest-record-wins compaction (CDC "deduplicate to current state")
# ---------------------------------------------------------------------------


@register(
    "events_latest_per_key",
    """
    SELECT user_id, event_type, ts_us, event_id, value
    FROM (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def q_events_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction: collapse an append-only event log to the latest
    record per (user_id, event_type), ties broken by event_id — the
    materialization step every upsert-log consumer (Debezium/Hudi-style)
    runs before serving "current state".

    Plan: ONE hash shuffle on the (high-cardinality) key pair, then a
    per-partition sort + row_number — fully parallel, no global sort.
    At 100 TB the same plan holds; if one user is pathologically hot,
    AQE skew-split handles the window's input exchange.
    """
    e = _t(spark, sf_dir, "events")
    keyed = e.select(
        "user_id",
        "event_type",
        event_us(e).alias("ts_us"),
        "event_id",
        "value",
    )
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .transform(ordered, "user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Upsert / MERGE of a delta batch into a base snapshot
# ---------------------------------------------------------------------------

_BUCKET = (
    "CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
)


@register(
    "orders_upsert_merge",
    f"""
    WITH o AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, {_BUCKET} AS bucket
      FROM orders
    ),
    base AS (
      SELECT o_orderkey AS key, o_orderstatus AS b_status, o_totalprice AS b_price
      FROM o WHERE bucket < 70
    ),
    delta AS (
      SELECT o_orderkey AS key, o_orderstatus AS d_status,
             o_totalprice * 1.05 AS d_price
      FROM o WHERE bucket >= 40
    ),
    m AS (
      SELECT COALESCE(d_status, b_status) AS status,
             COALESCE(d_price, b_price) AS price,
             (b_status IS NOT NULL AND d_status IS NOT NULL) AS updated,
             (b_status IS NULL) AS inserted,
             (d_status IS NULL) AS carried
      FROM base FULL OUTER JOIN delta USING (key)
    )
    SELECT status AS o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE updated) AS n_updated,
           COUNT(*) FILTER (WHERE inserted) AS n_inserted,
           COUNT(*) FILTER (WHERE carried) AS n_carried,
           CAST(SUM(CAST(price AS DECIMAL(30,4))) AS DOUBLE) AS total_price
    FROM m
    GROUP BY status
    ORDER BY status
    """,
)
def q_orders_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-grain MERGE: a delta batch (keys in md5-buckets >= 40, with a
    5% price revision) is upserted into a base snapshot (buckets < 70).
    Matched keys take the delta row (update), delta-only keys insert,
    base-only keys carry through — the SCD-1 semantics of
    ``MERGE INTO base USING delta ON key WHEN MATCHED THEN UPDATE WHEN
    NOT MATCHED THEN INSERT``, expressed as one full-outer join +
    coalesce, which is exactly the physical plan Delta/Iceberg MERGE
    compiles to.

    Scale: one shuffle per side on the merge key, then a sort-merge
    join; AQE converts to broadcast when a real delta batch is small
    (here both sides are table-sized so SMJ is the honest plan).
    Summary aggregation keeps the driver-facing result tiny.
    """
    o = _t(spark, sf_dir, "orders")
    bucket = md5_bucket(F.col("o_orderkey"))
    src = o.select("o_orderkey", "o_orderstatus", "o_totalprice", bucket.alias("bucket"))
    base = src.filter(F.col("bucket") < 70).select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("b_status"),
        F.col("o_totalprice").alias("b_price"),
    )
    delta = src.filter(F.col("bucket") >= 40).select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("d_status"),
        (F.col("o_totalprice") * F.lit(1.05)).alias("d_price"),
    )
    merged = base.join(delta, "key", "full_outer").select(
        F.coalesce("d_status", "b_status").alias("status"),
        F.coalesce("d_price", "b_price").alias("price"),
        (F.col("b_status").isNotNull() & F.col("d_status").isNotNull()).alias("updated"),
        F.col("b_status").isNull().alias("inserted"),
        F.col("d_status").isNull().alias("carried"),
    )
    return (
        merged.groupBy(F.col("status").alias("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("updated"), 1)).alias("n_updated"),
            F.count(F.when(F.col("inserted"), 1)).alias("n_inserted"),
            F.count(F.when(F.col("carried"), 1)).alias("n_carried"),
            dsum(F.col("price"), "total_price"),
        )
        .transform(ordered, "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Skew-safe salted join, value-checked against the plain join
# ---------------------------------------------------------------------------


@register(
    "salted_join_revenue",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4)))
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe fact-to-dim join via plans/skew.salted_join: the big
    side's rows are spread across n_salts sub-keys and the small side
    replicated, so one pathological join key cannot pin a single
    reducer. The oracle is the PLAIN join — the salting must be
    invisible in the result (row multiplicity included), which is what
    this row value-checks every round.

    At local scale the plain plan is fine; the registry entry exists so
    the skew path is under the same cross-engine gate as everything
    else, not just unit tests (tests/test_skew.py covers multiplicity
    and spread).
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, on="l_orderkey", n_salts=8)
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum(rev, "revenue"))
        .transform(ordered, "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance (algebraic partial-agg merge)
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


@register(
    "events_incremental_rollup",
    f"""
    SELECT epoch_us(ts) // {_DAY_US} AS day,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY day, event_type
    ORDER BY day, event_type
    """,
)
def q_events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a daily per-type
    rollup is kept as ALGEBRAIC PARTIALS (count + exact decimal sum);
    when a delta batch arrives, only the delta is aggregated and the
    two partial sets are merged by summing — the base events are never
    re-read. At 100 TB this is the difference between touching one
    day's arrivals and rescanning the corpus on every refresh.

    The oracle is the FULL recompute over all events: the value check
    proves the merge is lossless (count and decimal-sum are algebraic,
    so partial-then-merge ≡ recompute, bit-for-bit — which is exactly
    why the engine's determinism rules demand decimal sums: a double
    partial sum would NOT merge losslessly).

    Batch membership is content-addressed (md5 of event_id) so both
    engines see the same base/delta split without an arrival-time
    column.
    """
    e = _t(spark, sf_dir, "events")
    bucket = md5_bucket(F.col("event_id"))
    rows = e.select(
        (event_us(e) / F.lit(_DAY_US)).cast("long").alias("day"),
        "event_type",
        "value",
        bucket.alias("bucket"),
    )

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("p_n"),
            F.sum(F.col("value").cast("decimal(30,6)")).alias("p_sum"),
        )

    base = partials(rows.filter(F.col("bucket") < 80))    # materialized view
    delta = partials(rows.filter(F.col("bucket") >= 80))  # new arrivals only
    return (
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("p_n").alias("n_events"),
            F.sum("p_sum").cast("double").alias("total_value"),
        )
        .transform(ordered, "day", "event_type")
    )


# ---------------------------------------------------------------------------
# SCD Type-2: validity intervals from a change stream
# ---------------------------------------------------------------------------


# Shared SCD2 interval chain (the dimension BUILD), rendered into both
# the intervals query and the point-in-time lookup oracle so the two
# can never drift.
_SCD2_CTES = """
    o AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
        LAG(event_type) OVER (PARTITION BY user_id
          ORDER BY epoch_us(ts), event_id) AS prev
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    b AS (
      SELECT *, CASE WHEN prev IS DISTINCT FROM event_type
                     THEN 1 ELSE 0 END AS brk
      FROM o
    ),
    r AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM b
    ),
    runs AS (
      SELECT user_id, run_id, MIN(event_type) AS event_type,
             CAST(MIN(us) AS BIGINT) AS valid_from_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM r GROUP BY user_id, run_id
    ),
    iv AS (
      SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
             valid_from_us,
             CAST(LEAD(valid_from_us) OVER (PARTITION BY user_id
               ORDER BY run_id) AS BIGINT) AS valid_to_us,
             n_events,
             LEAD(valid_from_us) OVER (PARTITION BY user_id
               ORDER BY run_id) IS NULL AS is_current
      FROM runs
    )
"""


@register(
    "events_scd2_intervals",
    f"""
    WITH {_SCD2_CTES}
    SELECT user_id, run_id, event_type, valid_from_us, valid_to_us,
           n_events, is_current
    FROM iv
    ORDER BY user_id, run_id
    """,
)
def q_events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from a change stream: each user's
    event-type sequence collapses into VALIDITY INTERVALS — one row
    per consecutive run of the same type, with valid_from/valid_to
    epoch-us bounds (NULL-open for the current state) and is_current.
    This is the other half of CDC next to events_latest_per_key's
    SCD-1 compaction: history preserved as intervals, the shape every
    warehouse dimension-with-history table takes.

    One user-keyed shuffle carries all three window passes (lag ->
    run-id cumsum -> lead over runs); run breaks use IS DISTINCT FROM
    so NULL-typed events form their own runs identically in both
    engines, and ties on the event timestamp break on event_id. At
    100 TB this partitions perfectly by the dimension key — state
    never crosses users."""
    return scd2_intervals(spark, sf_dir).transform(
        ordered, "user_id", "run_id"
    )


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 dimension BUILD shared by the intervals query and the
    point-in-time lookup (un-ordered; callers sort). Mirrors
    _SCD2_CTES exactly — change them together."""
    ev = _t(spark, sf_dir, "events")
    e = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id", "event_type", event_us(ev).alias("us"), "event_id"
        )
    )
    wseq = W.partitionBy("user_id").orderBy("us", "event_id")
    b = e.select(
        "*", F.lag("event_type").over(wseq).alias("prev")
    ).withColumn(
        "brk",
        F.expr(
            "CASE WHEN prev IS DISTINCT FROM event_type THEN 1 ELSE 0 END"
        ),
    )
    r = b.select(
        "*",
        F.sum("brk")
        .over(wseq.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("run_id"),
    )
    runs = r.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.min("us").cast("long").alias("valid_from_us"),
        F.count("*").cast("long").alias("n_events"),
    )
    wrun = W.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("valid_from_us").over(wrun)
    return runs.select(
        "user_id",
        F.col("run_id").cast("long").alias("run_id"),
        "event_type",
        "valid_from_us",
        nxt.cast("long").alias("valid_to_us"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


@register(
    "events_scd2_lookup",
    f"""
    WITH {_SCD2_CTES},
    probes AS (
      SELECT event_id, user_id, epoch_us(ts) AS probe_us
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 7 = 3
    )
    SELECT p.event_id, p.user_id, p.probe_us,
           i.event_type AS state, i.valid_from_us, i.is_current
    FROM probes p
    JOIN iv i
      ON p.user_id = i.user_id
     AND i.valid_from_us <= p.probe_us
     AND (i.valid_to_us IS NULL OR p.probe_us < i.valid_to_us)
    ORDER BY p.event_id
    """,
)
def q_events_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (effective-dated) lookup against the SCD2
    dimension — the join every fact-to-dimension-with-history
    enrichment runs: for a deterministic probe set (1/7th of events by
    content hash), find the dimension interval in force at the probe's
    own timestamp: valid_from <= t < valid_to, NULL-open current rows
    matching everything from their start. Because intervals are
    half-open and partition the timeline per user, each probe matches
    EXACTLY one row (a zero-length run [t, t) — two state changes at
    the same timestamp — matches nothing and is skipped, the standard
    temporal-table rule).

    Scale shape: ONE user-keyed equi-join (the range condition is a
    post-join filter with per-user interval counts as the bounded
    amplification) sharing the same user_id partitioning the build's
    windows already created — on a cluster the dimension-build shuffle
    output feeds the lookup with no extra exchange. Both engines
    render the SAME interval chain (_SCD2_CTES / scd2_intervals)."""
    from nbody6_data_pipeline_spark.queries import md5_bucket

    ev = _t(spark, sf_dir, "events")
    probes = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .filter(md5_bucket(F.col("event_id"), 7) == 3)
        .select("event_id", "user_id", event_us(ev).alias("probe_us"))
    )
    iv = scd2_intervals(spark, sf_dir)
    return (
        probes.join(iv, "user_id")
        .filter(
            (F.col("valid_from_us") <= F.col("probe_us"))
            & (
                F.col("valid_to_us").isNull()
                | (F.col("probe_us") < F.col("valid_to_us"))
            )
        )
        .select(
            "event_id",
            "user_id",
            "probe_us",
            F.col("event_type").alias("state"),
            "valid_from_us",
            "is_current",
        )
        .transform(ordered, "event_id")
    )
