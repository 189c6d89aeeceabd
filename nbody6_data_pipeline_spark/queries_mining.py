"""Mining / feature-engineering queries: co-occurrence lift,
boilerplate detection, anomaly scoring, time-decayed aggregates, and
per-label vector centroids.

Determinism notes (driver hash-compares bit-sensitively):
- lift ratios are rational numbers computed with ONE IEEE double
  division (correctly rounded, identical cross-engine) then q6-fixed;
- exponential time decay uses DYADIC factors (1 / 2^age_days via an
  integer shift, exponent clamped) — the product value * 2^-k only
  rescales the float exponent, so it is bit-exact on both engines,
  unlike pow()/exp() which are not correctly-rounded libm calls;
- stddev-based z-scores use the ROUND(...,6) idiom shared with the
  other dispersion queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.expectations import (
    anti_join_count,
    expectation_report,
)
from nbody6_data_pipeline_spark.operators.text import ascii_lower, token_array
from nbody6_data_pipeline_spark.queries import (
    _t,
    davg,
    dsum,
    event_us,
    ordered,
    q6,
    register,
)

# ---------------------------------------------------------------------------
# Market-basket affinity (co-occurrence lift)
# ---------------------------------------------------------------------------

MIN_COOC = 2  # minimum co-occurring orders for a pair to be scored


@register(
    "part_affinity_lift",
    f"""
    WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM p),
    pc AS (SELECT l_partkey, COUNT(*) AS n_part FROM p GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
      FROM p a JOIN p b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY part_a, part_b
      HAVING COUNT(*) >= {MIN_COOC}
    )
    SELECT part_a, part_b, n_ab,
      CAST(floor(CAST(n_ab * n.n_orders AS DOUBLE)
                 / (ca.n_part * cb.n_part) * 1000000 + 0.5) AS BIGINT)
        AS lift_q6
    FROM pairs, n
    JOIN pc ca ON ca.l_partkey = part_a
    JOIN pc cb ON cb.l_partkey = part_b
    ORDER BY lift_q6 DESC, part_a, part_b
    LIMIT 100
    """,
)
def q_part_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 part pairs by co-occurrence lift (P(ab)/(P(a)P(b)) over
    orders) — the market-basket/association primitive. Baskets form
    with ONE groupBy (collect_set dedups parts map-side — no separate
    distinct shuffle), and ordered pairs unfold from each sorted
    basket with array HOFs, so fan-out is bounded by (items per
    order)^2 per order regardless of catalog size — the same
    bounded-blocking idea as the dedup family. Per-part counts explode
    off the cached baskets and join back by broadcast. Lift is one
    IEEE division, q6 fixed-point."""
    li = _t(spark, sf_dir, "lineitem", spread=True)
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .persist()
    )
    n_orders = baskets.count()
    pc = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_part"))
    )
    ps = F.col("ps")
    pair_arr = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + 2, F.greatest(F.size(ps) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pairs = (
        baskets.filter(F.size(ps) >= 2)
        .select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= MIN_COOC)
    )
    ca = pc.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("na")
    )
    cb = pc.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("nb")
    )
    lift = (F.col("n_ab") * F.lit(n_orders)).cast("double") / (
        F.col("na") * F.col("nb")
    )
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .select("part_a", "part_b", "n_ab", q6(lift).alias("lift_q6"))
        .orderBy(F.col("lift_q6").desc(), "part_a", "part_b")
        .limit(100)
        .transform(ordered, F.col("lift_q6").desc(), "part_a", "part_b")
    )


# ---------------------------------------------------------------------------
# Boilerplate detection (repeated shingle runs across documents)
# ---------------------------------------------------------------------------

BP_SHINGLE = 8  # words per shingle
BP_MIN_DOCS = 3  # docs sharing a shingle for it to count as boilerplate


@register(
    "doc_boilerplate_shingles",
    f"""
    WITH t AS (
      SELECT doc_id,
        list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+'),
                    x -> x != '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
        unnest(list_distinct(list_transform(
          range(1, greatest(len(toks) - {BP_SHINGLE - 1}, 0) + 1),
          i -> array_to_string(
            list_slice(toks, i, i + {BP_SHINGLE - 1}), ' ')))) AS gram
      FROM t
    )
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM g GROUP BY gram HAVING COUNT(*) >= {BP_MIN_DOCS}
    ORDER BY n_docs DESC, gram
    """,
)
def q_doc_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate phrases: {BP_SHINGLE}-word shingles appearing in >=
    {BP_MIN_DOCS} distinct documents — headers/footers/license blurbs
    that survive near-dup removal and should be stripped before
    training. Per-doc shingle sets dedup MAP-SIDE via array_distinct —
    duplicate (doc, shingle) pairs can only arise within a single
    document's row, so no cross-partition distinct shuffle is needed
    and a doc repeating its own footer still counts once — then one
    map-side-combined groupBy on the shingle. At 100 TB the shingle
    string would be replaced by its md5 (the same trick the trigram
    index uses) and the text recovered by one join of the tiny
    boilerplate set back to a sample — here the strings stay readable.
    """
    d = _t(spark, sf_dir, "documents", spread=True)
    t = token_array(ascii_lower(F.col("text")))
    n_sh = F.greatest(F.size(t) - F.lit(BP_SHINGLE - 1), F.lit(0))
    # sequence(1, 0) would DESCEND ([1, 0]) for docs shorter than the
    # shingle width — the when() guard skips them (same idiom as the
    # trigram index build)
    grams = F.when(n_sh == 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_sh),
                lambda i: F.array_join(F.slice(t, i, BP_SHINGLE), " "),
            )
        )
    )
    g = d.select("doc_id", F.explode(grams).alias("gram"))
    return (
        g.groupBy("gram")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= BP_MIN_DOCS)
        .transform(ordered, F.col("n_docs").desc(), "gram")
    )


# ---------------------------------------------------------------------------
# Hourly anomaly z-scores
# ---------------------------------------------------------------------------

Z_THRESHOLD = 2.0
_HOUR_US = 3600 * 1_000_000


@register(
    "events_hourly_anomaly",
    f"""
    WITH c AS (
      SELECT event_type,
        (epoch_us(ts) // {_HOUR_US}) * {_HOUR_US} AS hour_us,
        COUNT(*) AS n
      FROM events GROUP BY event_type, hour_us
    ),
    s AS (
      SELECT event_type, AVG(n) AS mu, STDDEV_SAMP(n) AS sd
      FROM c GROUP BY event_type
    )
    SELECT c.event_type AS event_type, hour_us, n,
      ROUND((n - mu) / sd, 6) AS z
    FROM c JOIN s ON c.event_type = s.event_type
    WHERE sd > 0 AND abs((n - mu) / sd) > {Z_THRESHOLD}
    ORDER BY event_type, hour_us
    """,
)
def q_events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose event volume deviates > {Z_THRESHOLD} sigma from
    the event_type's hourly mean — the monitoring primitive over the
    same hourly rollup a production pipeline already maintains
    incrementally. Two shuffles: the hourly count (map-side combined)
    and the per-type moment aggregation (|types| rows, broadcast
    back). AVG over integer counts is exact in double up to 2^53;
    stddev uses the cross-engine ROUND(...,6) idiom."""
    e = _t(spark, sf_dir, "events")
    us = event_us(e)
    c = (
        e.select(
            "event_type",
            # integer hour bucket: us - us % H == (us div H) * H for
            # non-negative epochs. floor(us / H) on DOUBLES is wrong
            # within ~0.2 ms below an hour boundary (the quotient
            # rounds up to the next integer before floor), silently
            # bucketing the event one hour late vs the oracle's
            # integer `//`.
            (us - us % _HOUR_US).cast("long").alias("hour_us"),
        )
        .groupBy("event_type", "hour_us")
        .agg(F.count("*").alias("n"))
    )
    s = c.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        c.join(F.broadcast(s), "event_type")
        .filter((F.col("sd") > 0) & (F.abs(z) > Z_THRESHOLD))
        .select("event_type", "hour_us", "n", F.round(z, 6).alias("z"))
        .transform(ordered, "event_type", "hour_us")
    )


# ---------------------------------------------------------------------------
# Exponential time-decayed value per user (dyadic decay -> bit-exact)
# ---------------------------------------------------------------------------

_DAY_US = 86_400 * 1_000_000
DECAY_CLAMP = 50  # 2^-50 underflows decimal(30,6) anyway


@register(
    "events_decayed_value",
    f"""
    WITH m AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
    d AS (
      SELECT user_id,
        CAST(floor(value * 100 + 0.5) AS HUGEINT)
          * (1::BIGINT << CAST({DECAY_CLAMP} - least(
              (m.mx - epoch_us(ts)) // {_DAY_US}, {DECAY_CLAMP})
              AS INTEGER)) AS wv
      FROM events, m
    )
    SELECT user_id,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      -- sign-split 128-bit -> double: DuckDB's negative-HUGEINT cast
      -- is not correctly rounded (README "Oracle environment")
      (CASE WHEN SUM(wv) < 0 THEN -CAST(-SUM(wv) AS DOUBLE)
            ELSE CAST(SUM(wv) AS DOUBLE) END)
        / {float(100 * (1 << DECAY_CLAMP))!r} AS decayed_value
    FROM d GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_events_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed value (half-life = 1 day,
    anchored at the corpus max timestamp) — the recency-weighted
    feature a feature store maintains per entity. The decay factor is
    DYADIC (value / 2^age_days, clamped at {DECAY_CLAMP}), and the
    whole aggregation is EXACT INTEGER arithmetic: each row
    contributes cents * 2^(CLAMP - age) — a 128-bit integer — so the
    sum is order-independent and the single final division by
    100 * 2^CLAMP is one correctly-rounded IEEE op on identical exact
    operands in both engines. (The previous form summed
    CAST(double AS DECIMAL(30,6)) per row; dyadic values produce
    exact decimal-rounding TIES whose half-up-vs-nearest resolution
    differs between Java and DuckDB — the sf1 sweep caught three such
    rows in 1M.) Plan: one single-row max broadcast + one
    map-side-combined groupBy on user_id."""
    e = _t(spark, sf_dir, "events")
    us = event_us(e)
    mx = e.agg(F.max(us).alias("mx"))
    age_d = F.least(
        ((F.col("mx") - us) / _DAY_US).cast("long"), F.lit(DECAY_CLAMP)
    )
    wv = F.expr(
        "cast(floor(value * 100 + 0.5) as decimal(38,0))"
        f" * cast(shiftleft(cast(1 as bigint), {DECAY_CLAMP}"
        " - cast(age_d as int)) as decimal(38,0))"
    )
    scale = float(100 * (1 << DECAY_CLAMP))
    return (
        e.crossJoin(F.broadcast(mx))
        .withColumn("age_d", age_d)
        .select("user_id", wv.alias("wv"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.sum("wv").cast("double") / F.lit(scale)).alias(
                "decayed_value"
            ),
        )
        .transform(ordered, "user_id")
    )


# ---------------------------------------------------------------------------
# Per-label embedding centroids (long form)
# ---------------------------------------------------------------------------


@register(
    "embedding_label_centroids",
    """
    SELECT label, j AS dim,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(CAST(CAST(embedding[j] AS DOUBLE) AS DECIMAL(30,6)))
           AS DOUBLE) / COUNT(*) AS centroid
    FROM embeddings, (SELECT unnest(range(1, 65)) AS j) r
    GROUP BY label, j
    ORDER BY label, dim
    """,
)
def q_embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label, per-dimension centroid of the embedding column —
    the class-prototype table behind nearest-centroid classification
    and drift monitoring. posexplode turns vectors into (label, dim,
    value) rows; one map-side-combined shuffle of |labels| x dims
    groups does the rest — no vector ever crosses the wire whole.
    Means use the exact-decimal-sum idiom (order-independent)."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("p", "v"))
        .select("label", (F.col("p") + 1).alias("dim"), "v")
        .groupBy("label", "dim")
        .agg(
            F.count("*").cast("long").alias("n"),
            davg(F.col("v").cast("double"), "centroid", 6),
        )
        .transform(ordered, "label", "dim")
    )


# ---------------------------------------------------------------------------
# Data-quality expectations report
# ---------------------------------------------------------------------------

@register(
    "table_expectations",
    """
    SELECT 'lineitem' AS table_name, 'qty_out_of_range' AS check_name,
      (SELECT COUNT(*) FROM lineitem) AS n_checked,
      (SELECT COUNT(*) FROM lineitem
        WHERE l_quantity < 1 OR l_quantity > 50) AS n_violations
    UNION ALL
    SELECT 'lineitem', 'nonpositive_price',
      (SELECT COUNT(*) FROM lineitem),
      (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= 0)
    UNION ALL
    SELECT 'lineitem', 'null_orderkey',
      (SELECT COUNT(*) FROM lineitem),
      (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL)
    UNION ALL
    SELECT 'lineitem', 'dup_order_linenumber',
      (SELECT COUNT(*) FROM lineitem),
      (SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
       FROM lineitem)
    UNION ALL
    SELECT 'lineitem', 'fk_orderkey_in_orders',
      (SELECT COUNT(*) FROM lineitem),
      (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders', 'fk_custkey_in_customer',
      (SELECT COUNT(*) FROM orders),
      (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'events', 'null_user', (SELECT COUNT(*) FROM events),
      (SELECT COUNT(*) FROM events WHERE user_id IS NULL)
    UNION ALL
    SELECT 'events', 'negative_value', (SELECT COUNT(*) FROM events),
      (SELECT COUNT(*) FROM events WHERE value < 0)
    ORDER BY table_name, check_name
    """,
)
def q_table_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-promotion data-quality gate: range, null, domain,
    uniqueness, and referential-integrity expectations over three
    tables, reported as one uniform (table, check, n_checked,
    n_violations) relation. Single-table checks compile into ONE
    conditional-count aggregation pass per table
    (operators/expectations.expectation_report); uniqueness is a
    count-minus-distinct aggregate on the same scan; RI checks are
    left-anti joins against the (broadcastable) parent keys. The
    corpus intentionally trips one expectation (duplicate
    (l_orderkey, l_linenumber) pairs) so the report shape carries
    real violations, not just zeros."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    e = _t(spark, sf_dir, "events")
    cu = _t(spark, sf_dir, "customer")

    li_report = expectation_report(
        li,
        {
            "qty_out_of_range": (F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 50),
            "nonpositive_price": F.col("l_extendedprice") <= 0,
            "null_orderkey": F.col("l_orderkey").isNull(),
        },
        "lineitem",
    )
    li_n = F.count(F.lit(1))
    li_uniq = li.agg(
        F.lit("lineitem").alias("table_name"),
        F.lit("dup_order_linenumber").alias("check_name"),
        li_n.cast("long").alias("n_checked"),
        (
            li_n
            - F.count_distinct(F.col("l_orderkey"), F.col("l_linenumber"))
        )
        .cast("long")
        .alias("n_violations"),
    )
    li_fk = (
        anti_join_count(li, o, "l_orderkey", "o_orderkey")
        .crossJoin(F.broadcast(li.agg(li_n.cast("long").alias("n_checked"))))
        .select(
            F.lit("lineitem").alias("table_name"),
            F.lit("fk_orderkey_in_orders").alias("check_name"),
            "n_checked",
            "n_violations",
        )
    )
    o_fk = (
        anti_join_count(o, cu, "o_custkey", "c_custkey")
        .crossJoin(
            F.broadcast(
                o.agg(F.count(F.lit(1)).cast("long").alias("n_checked"))
            )
        )
        .select(
            F.lit("orders").alias("table_name"),
            F.lit("fk_custkey_in_customer").alias("check_name"),
            "n_checked",
            "n_violations",
        )
    )
    e_report = expectation_report(
        e,
        {
            "null_user": F.col("user_id").isNull(),
            "negative_value": F.col("value") < 0,
        },
        "events",
    )
    return (
        li_report.unionByName(li_uniq)
        .unionByName(li_fk)
        .unionByName(o_fk)
        .unionByName(e_report)
        .transform(ordered, "table_name", "check_name")
    )


# ---------------------------------------------------------------------------
# Multi-join star query (TPC-H Q5 shape)
# ---------------------------------------------------------------------------


@register(
    "local_supplier_volume",
    """
    SELECT n.n_name AS nation, r.r_name AS region,
      CAST(COUNT(*) AS BIGINT) AS n_items,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    GROUP BY nation, region
    ORDER BY revenue DESC, nation
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation where the supplier is LOCAL to the customer
    (TPC-H Q5 shape): a six-table star join. Plan shape matters more
    than the arithmetic here — the two fact-sized tables (lineitem,
    orders) meet in a shuffle join on their shared key, customer joins
    on the custkey shuffle (all three scale with the corpus, so none
    is broadcast), while supplier/nation/region are dimension-sized
    and travel by broadcast; the local-supplier predicate
    (s_nationkey = c_nationkey) rides the supplier broadcast join
    instead of forcing an extra shuffle. Revenue uses the exact
    decimal-sum idiom."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == s["s_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            dsum(rev, "revenue", 4),
        )
        .transform(ordered, F.col("revenue").desc(), "nation")
    )


# ---------------------------------------------------------------------------
# Session path mining (top event-type sequences)
# ---------------------------------------------------------------------------

PATH_GAP_US = 30 * 60 * 1_000_000  # same 30-min gap as sessionization
PATH_STEPS = 3
PATH_TOP = 20


@register(
    "session_top_paths",
    f"""
    WITH x AS (
      SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
        LAG(epoch_us(ts)) OVER
          (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      FROM events
    ),
    s AS (
      SELECT *, SUM(CASE WHEN prev IS NULL OR us - prev > {PATH_GAP_US}
                         THEN 1 ELSE 0 END)
        OVER (PARTITION BY user_id ORDER BY us, event_id) AS sid
      FROM x
    ),
    p AS (
      SELECT user_id, sid,
        string_agg(event_type, '->' ORDER BY us, event_id) AS path
      FROM (
        SELECT *, row_number() OVER
          (PARTITION BY user_id, sid ORDER BY us, event_id) AS rn
        FROM s
      ) WHERE rn <= {PATH_STEPS}
      GROUP BY user_id, sid
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {PATH_TOP}
    """,
)
def q_session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PATH_TOP} session-opening event sequences (first
    {PATH_STEPS} steps after a {PATH_GAP_US // 60_000_000}-minute
    inactivity gap) — the path-mining view of user behavior that
    complements the transition matrix (one-step) and funnel
    (prescribed-order) queries with DISCOVERED sequences. One user_id
    shuffle carries all three window passes (lag -> session id ->
    step rank); path assembly is an in-group sort of <= {PATH_STEPS}
    structs. Ties on identical timestamps break on event_id, so the
    paths are deterministic."""
    e = _t(spark, sf_dir, "events")
    us = event_us(e)
    from pyspark.sql import Window as W

    w_user = W.partitionBy("user_id").orderBy("us", "event_id")
    x = e.select(
        "user_id", us.alias("us"), "event_id", "event_type"
    ).withColumn("prev", F.lag("us").over(w_user))
    new_sess = F.when(
        F.col("prev").isNull() | (F.col("us") - F.col("prev") > PATH_GAP_US),
        1,
    ).otherwise(0)
    s = x.withColumn("sid", F.sum(new_sess).over(w_user))
    w_sess = W.partitionBy("user_id", "sid").orderBy("us", "event_id")
    steps = (
        s.withColumn("rn", F.row_number().over(w_sess))
        .filter(F.col("rn") <= PATH_STEPS)
        .groupBy("user_id", "sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda st: st["event_type"],
                ),
                "->",
            ).alias("path")
        )
    )
    return (
        steps.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOP)
        .transform(ordered, F.col("n_sessions").desc(), "path")
    )


# ---------------------------------------------------------------------------
# Shipping priority (TPC-H Q3 shape)
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_CUT_US = 897_868_800_000_000  # 1998-06-15 epoch microseconds


@register(
    "shipping_priority",
    f"""
    SELECT l.l_orderkey AS order_key,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
      epoch_us(o.o_orderdate) AS orderdate_us,
      o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{Q3_SEGMENT}'
      AND epoch_us(o.o_orderdate) < {Q3_CUT_US}
      AND epoch_us(l.l_shipdate) > {Q3_CUT_US}
    GROUP BY order_key, orderdate_us, priority
    ORDER BY revenue DESC, orderdate_us, order_key
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped high-revenue orders for one market segment (TPC-H Q3
    shape): the date-and-dimension-filtered star join with top-k.
    Plan shape: the segment filter pushes into the customer scan
    (PushedFilters) and that side broadcasts; lineitem-orders meet in
    the one fact shuffle; top-10 is TakeOrdered, not a global sort.
    The date predicates evaluate just above their scans rather than
    inside them — they compare the epoch-us NORMALIZED column
    (queries.event_us), trading parquet-stats pushdown for surviving
    the feed's timestamp-precision drift (LONG nanos vs TIMESTAMP_NTZ
    across generator rounds); on a stable production schema, compare
    the raw column to a typed literal and the filter pushes. Revenue
    uses the exact decimal-sum idiom."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders")
    o = o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        event_us(o, "o_orderdate").alias("orderdate_us"),
    ).filter(F.col("orderdate_us") < Q3_CUT_US)
    li = _t(spark, sf_dir, "lineitem")
    li = li.select(
        "l_orderkey",
        "l_extendedprice",
        "l_discount",
        event_us(li, "l_shipdate").alias("ship_us"),
    ).filter(F.col("ship_us") > Q3_CUT_US)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .groupBy(
            F.col("l_orderkey").alias("order_key"),
            "orderdate_us",
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(dsum(rev, "revenue", 4))
        .select("order_key", "revenue", "orderdate_us", "priority")
        .orderBy(F.col("revenue").desc(), "orderdate_us", "order_key")
        .limit(10)
        .transform(ordered, F.col("revenue").desc(), "orderdate_us", "order_key")
    )


# ---------------------------------------------------------------------------
# Group-wise OLS trend (closed-form from exact moments)
# ---------------------------------------------------------------------------

TREND_MIN_EVENTS = 3


_TREND_FINAL = (
    # one short IEEE chain over exact int64/128-bit operands, token-
    # identical in both engines. num/sy/sxy may be negative: sign-split
    # every 128-bit -> double cast (DuckDB's negative-HUGEINT cast is
    # 1 ulp off past 2^53 — sf1 lesson); den/sx are non-negative.
    "CASE WHEN num < 0 THEN -CAST(-num AS DOUBLE)"
    " ELSE CAST(num AS DOUBLE) END AS num_d",
    "CAST(den AS DOUBLE) AS den_d",
    "CASE WHEN sy < 0 THEN -CAST(-sy AS DOUBLE)"
    " ELSE CAST(sy AS DOUBLE) END AS sy_d",
    "CAST(sx AS DOUBLE) AS sx_d",
)


@register(
    "events_user_trend",
    f"""
    WITH m AS (SELECT MIN(epoch_us(ts)) AS mn FROM events),
    d AS (
      SELECT user_id,
        CAST(epoch_us(ts) - m.mn AS HUGEINT) AS x,
        CAST(floor(value * 100 + 0.5) AS HUGEINT) AS y
      FROM events, m
    ),
    s AS (
      SELECT user_id,
        CAST(COUNT(*) AS HUGEINT) AS n,
        SUM(x) AS sx, SUM(y) AS sy,
        SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM d GROUP BY user_id
    ),
    f AS (
      SELECT user_id, n, sx, sy,
        n * sxy - sx * sy AS num,
        n * sxx - sx * sx AS den
      FROM s WHERE n >= {TREND_MIN_EVENTS}
    ),
    g AS (
      SELECT user_id, CAST(n AS BIGINT) AS n, {", ".join(_TREND_FINAL)}
      FROM f WHERE den != 0
    )
    SELECT user_id, n,
      (num_d / den_d) * 864000000.0 AS slope_per_day,
      (sy_d / 100.0
        - (num_d / den_d) * 864000000.0 * (sx_d / 86400000000.0)) / n
        AS intercept
    FROM g
    ORDER BY user_id
    """,
)
def q_events_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of event value over time — closed-form
    slope/intercept from sufficient statistics (n, Sx, Sy, Sxy, Sxx),
    the per-entity regression a feature store maintains without ever
    materializing per-entity series. One map-side-combined shuffle
    carries all five moments, anchored by a single-row broadcast.

    Exactness (rebuilt after the sf1 sweep caught last-ulp drift in
    the old double-moment form): x is exact MICROSECONDS since the
    corpus minimum, y exact CENTS, so every moment and the closed-form
    numerator/denominator are exact 128-bit integers — order-
    independent, overflow-safe to ~1e6 events/user (n*sxx < 1e38) —
    and the day/value rescaling happens in ONE token-identical IEEE
    chain at the end."""
    e = _t(spark, sf_dir, "events")
    us = event_us(e)
    mn = e.agg(F.min(us).alias("mn"))
    d = e.crossJoin(F.broadcast(mn)).select(
        "user_id",
        (us - F.col("mn")).cast("decimal(38,0)").alias("x"),
        F.expr(
            "cast(floor(value * 100 + 0.5) as decimal(38,0))"
        ).alias("y"),
    )
    s = d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    )
    f = s.filter(F.col("n") >= TREND_MIN_EVENTS).selectExpr(
        "user_id", "n", "sx", "sy",
        "CAST(n * sxy - sx * sy AS DECIMAL(38,0)) AS num",
        "CAST(n * sxx - sx * sx AS DECIMAL(38,0)) AS den",
    )
    g = f.filter(F.col("den") != 0).selectExpr(
        "user_id", "CAST(n AS BIGINT) AS n", *_TREND_FINAL
    )
    return g.selectExpr(
        "user_id", "n",
        "(num_d / den_d) * 864000000.0 AS slope_per_day",
        "(sy_d / 100.0"
        " - (num_d / den_d) * 864000000.0 * (sx_d / 86400000000.0)) / n"
        " AS intercept",
    ).transform(ordered, "user_id")


# ---------------------------------------------------------------------------
# Join-key skew profile
# ---------------------------------------------------------------------------


@register(
    "events_key_skew_profile",
    """
    WITH c AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_keys,
      CAST(SUM(cnt) AS BIGINT) AS n_rows,
      CAST(MAX(cnt) AS BIGINT) AS max_count,
      CAST(floor(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) * 1000000 + 0.5)
           AS BIGINT) AS max_share_q6,
      ROUND(QUANTILE_CONT(cnt, 0.5), 6) AS p50_count,
      ROUND(QUANTILE_CONT(cnt, 0.99), 6) AS p99_count,
      ROUND(QUANTILE_CONT(cnt, 0.99) / QUANTILE_CONT(cnt, 0.5), 6)
        AS p99_over_p50
    FROM c
    """,
)
def q_events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis for the events user_id key: key count,
    hottest-key share, and the p99/p50 per-key-count ratio — the
    numbers that decide BEFORE a production join whether to rely on
    AQE skew splitting or reach for plans/skew.salted_join (the
    engine's rule of thumb: salt when max_share crosses ~1/partitions
    or p99/p50 crosses ~10x). Two map-side-combined aggregations: the
    per-key count, then O(keys) moments — nothing here scales with
    row count beyond the first combine. Exact interpolated
    percentiles with the ROUND-6 idiom; the hot-key share is one IEEE
    division, q6."""
    e = _t(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    share = F.col("max_count").cast("double") / F.col("n_rows")
    return (
        c.agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.max("cnt").cast("long").alias("max_count"),
            F.round(F.expr("percentile(cnt, 0.5)"), 6).alias("p50_count"),
            F.round(F.expr("percentile(cnt, 0.99)"), 6).alias("p99_count"),
            F.round(
                F.expr("percentile(cnt, 0.99) / percentile(cnt, 0.5)"), 6
            ).alias("p99_over_p50"),
        )
        .select(
            "n_keys",
            "n_rows",
            "max_count",
            q6(share).alias("max_share_q6"),
            "p50_count",
            "p99_count",
            "p99_over_p50",
        )
    )


# ---------------------------------------------------------------------------
# Customer order-count distribution (TPC-H Q13 shape)
# ---------------------------------------------------------------------------

Q13_EXCLUDED_PRIORITY = "1-URGENT"


@register(
    "customer_order_distribution",
    f"""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
      GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def q_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How many customers placed k qualifying orders, INCLUDING k=0
    (TPC-H Q13 shape): the outer-join double aggregation where the
    filter lives in the JOIN CONDITION, not WHERE — a WHERE would
    silently drop the zero-order customers the query exists to count.

    Plan shape: orders pre-aggregates to one (custkey, count) row
    BEFORE the join (map-side-combinable hash agg), so the join
    shuffles |customers| + |custkeys-with-orders| rows instead of
    |customers| + |orders| — at 100 TB the raw-orders outer join Q13
    is usually written with would dwarf the second aggregation, and a
    hot customer would skew one task; pre-aggregated, every custkey
    is exactly one row on the probe side and the distribution agg is
    tiny. Zero-order customers surface via coalesce(cnt, 0)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    return (
        c.join(per_cust, c["c_custkey"] == per_cust["o_custkey"], "left")
        .select(F.coalesce(F.col("_cnt"), F.lit(0)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .transform(ordered, F.col("n_customers").desc(), F.col("n_orders").desc())
    )


# ---------------------------------------------------------------------------
# Suppliers above a global revenue threshold (TPC-H Q11 shape)
# ---------------------------------------------------------------------------

Q11_MEAN_MULTIPLE = 1.05


@register(
    "supplier_revenue_share",
    f"""
    WITH s AS (
      SELECT l_suppkey AS supp_key,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,4))) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY l_suppkey
    ), tot AS (
      SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(30,4))) AS DOUBLE) AS total,
             COUNT(DISTINCT l_suppkey) AS n_supp
      FROM lineitem
    )
    SELECT s.supp_key, s.revenue, s.revenue / tot.total AS share
    FROM s, tot
    WHERE s.revenue > (tot.total / tot.n_supp) * {Q11_MEAN_MULTIPLE}
    ORDER BY s.revenue DESC, s.supp_key
    """,
)
def q_supplier_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose revenue exceeds 1.05x the mean supplier
    revenue (TPC-H Q11 shape): a grouped aggregate filtered against a
    GLOBAL scalar computed from the same fact table.

    Plan shape: one map-side-combinable hash agg builds the per-
    supplier table; the global total/count is a second tiny agg over
    THAT table's decimal sums (not a rescan of lineitem) and joins
    back as a broadcast single-row cross join — the idiom this repo
    uses for every scalar subquery, which AQE plans as
    BroadcastNestedLoopJoin with a 1-row build side, not a cartesian
    product. The threshold stays scale-free (mean-relative; the synthetic
    feed's supplier revenue is near-uniform, max/mean ~1.1, so the
    multiple sits inside the observed spread), so the selectivity
    survives SF changes.

    Determinism: supplier revenue is the exact decimal-sum idiom; the
    global total re-sums the DECIMAL partials (exact, order-free)
    before the one cast to double, so both engines compare the same
    doubles; share is one IEEE division of identical inputs."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,4)"
    )
    s = (
        li.groupBy(F.col("l_suppkey").alias("supp_key"))
        .agg(F.sum(rev).alias("_rev_dec"))
    )
    tot = s.agg(
        F.sum("_rev_dec").cast("double").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_supp"),
    )
    return (
        s.select("supp_key", F.col("_rev_dec").cast("double").alias("revenue"))
        .crossJoin(F.broadcast(tot))
        .filter(
            F.col("revenue")
            > (F.col("total") / F.col("n_supp")) * Q11_MEAN_MULTIPLE
        )
        .select(
            "supp_key",
            "revenue",
            (F.col("revenue") / F.col("total")).alias("share"),
        )
        .transform(ordered, F.col("revenue").desc(), "supp_key")
    )


# ---------------------------------------------------------------------------
# Classic analytic shapes, continued: Q14 / Q12 / Q19 / Q22
# ---------------------------------------------------------------------------

PROMO_TYPE = "PROMO"
# [1998-01-01, 1999-01-01) as epoch-us bounds: the engine's one proven
# cross-engine date idiom is comparing the epoch_us-normalized column
# to integer literals (see shipping_priority) — YEAR()/year() would
# re-introduce session-timezone sensitivity on the Spark side.
PROMO_T0_US = 883_612_800_000_000
PROMO_T1_US = 915_148_800_000_000
LATE_SHIP_US = 60 * 86_400 * 1_000_000  # shipped >60 days after order
HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


@register(
    "promo_revenue_share",
    f"""
    SELECT
      CAST(SUM(CASE WHEN p.p_type = '{PROMO_TYPE}'
        THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))
        ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE) AS promo_revenue,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(30,4))) AS DOUBLE) AS total_revenue,
      CAST(SUM(CASE WHEN p.p_type = '{PROMO_TYPE}'
        THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))
        ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(30,4))) AS DOUBLE) AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE epoch_us(l.l_shipdate) >= {PROMO_T0_US}
      AND epoch_us(l.l_shipdate) < {PROMO_T1_US}
    """,
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotional revenue share for one ship-year (TPC-H Q14 shape):
    conditional aggregate over a fact-fact join. Plan shape: the year
    filter prunes lineitem before the join; lineitem and part meet in
    ONE shuffle on partkey (part scales with the corpus — SF x 200k in
    TPC-H — so it is NOT broadcast; at small SF AQE may still choose a
    broadcast hash join at runtime, which is exactly the adaptivity
    wanted). Both sums keep DECIMAL partials to the end; the share is
    one IEEE division of two identical-on-both-engines doubles."""
    li = _t(spark, sf_dir, "lineitem")
    li = li.select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(30,4)")
        .alias("_rev"),
        event_us(li, "l_shipdate").alias("_ship_us"),
    ).filter(
        (F.col("_ship_us") >= PROMO_T0_US) & (F.col("_ship_us") < PROMO_T1_US)
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast("decimal(30,4)")
    promo = F.when(F.col("p_type") == PROMO_TYPE, F.col("_rev")).otherwise(zero)
    agg = li.join(p, li["l_partkey"] == p["p_partkey"]).agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum("_rev").cast("double").alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue")).alias("promo_share"),
    )


@register(
    "late_shipment_priority",
    f"""
    SELECT l.l_linestatus AS ship_class,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + {LATE_SHIP_US}
    GROUP BY ship_class
    ORDER BY ship_class
    """,
)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority mix of LATE shipments (TPC-H Q12 shape; linestatus
    stands in for shipmode): the defining feature is the join-derived
    predicate — lateness compares columns from BOTH sides, so it
    cannot push below the join; Catalyst evaluates it directly on the
    join output before the (integer-exact) conditional counts. One
    fact-fact shuffle on orderkey, then a map-side-combinable hash
    aggregate to |linestatus| rows."""
    o = _t(spark, sf_dir, "orders")
    o = o.select(
        "o_orderkey",
        "o_orderpriority",
        event_us(o, "o_orderdate").alias("_order_us"),
    )
    li = _t(spark, sf_dir, "lineitem")
    li = li.select(
        "l_orderkey",
        "l_linestatus",
        event_us(li, "l_shipdate").alias("_ship_us"),
    )
    is_high = F.col("o_orderpriority").isin(*HIGH_PRIORITIES)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("_ship_us") > F.col("_order_us") + LATE_SHIP_US)
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
        .transform(ordered, "ship_class")
    )


Q19_BANDS = (  # (brand, max_size, min_qty, max_qty)
    ("Brand#2", 15, 1, 20),
    ("Brand#11", 25, 10, 30),
    ("Brand#17", 35, 20, 40),
)


@register(
    "discounted_part_revenue",
    f"""
    SELECT p.p_brand AS brand,
      CAST(COUNT(*) AS BIGINT) AS n_items,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE {" OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN 1 AND {s}"
        f" AND l.l_quantity BETWEEN {lo} AND {hi})"
        for b, s, lo, hi in Q19_BANDS)}
    GROUP BY brand
    ORDER BY brand
    """,
)
def q_discounted_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three brand/size/quantity bands (TPC-H Q19 shape):
    a disjunction of conjunctions spanning both join sides. Catalyst
    splits the OR: the single-side residues it can infer
    (p_brand IN (...) on part, l_quantity BETWEEN global-min/max on
    lineitem) push into the scans as PushedFilters, while the full
    cross-side disjunction evaluates above the join — the scans never
    read rows that no band could accept. One shuffle on partkey."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    band = None
    for b, s, lo, hi in Q19_BANDS:
        c = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(1, s)
            & F.col("l_quantity").between(lo, hi)
        )
        band = c if band is None else band | c
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(band)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            dsum(rev, "revenue", 4),
        )
        .transform(ordered, "brand")
    )


@register(
    "idle_rich_customers",
    """
    WITH thr AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment AS segment,
      CAST(COUNT(*) AS BIGINT) AS n_custs,
      CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS total_bal
    FROM customer c, thr
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY segment
    ORDER BY segment
    """,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no urgent orders (TPC-H
    Q22 shape): a global scalar threshold feeding a filter, then an
    anti-join against a filtered fact subset. The threshold is a
    1-row aggregate broadcast onto every customer row (no second
    scan); the NOT EXISTS is a left-anti shuffle join against orders
    pre-filtered to the urgent slice (the filter pushes into the
    orders scan, so the anti-join's build input is already the small
    subset). Threshold determinism: exact decimal sum, one cast, one
    IEEE division — both engines compare the same double."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(30,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("c_custkey") == urgent["o_custkey"], "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            dsum(F.col("c_acctbal"), "total_bal", 4),
        )
        .transform(ordered, "segment")
    )


Q17_BRAND = "Brand#17"
# 1998 H1 as epoch-us bounds (same literal-epoch idiom as above)
Q15_T0_US = 883_612_800_000_000
Q15_T1_US = 899_251_200_000_000


@register(
    "small_quantity_revenue",
    f"""
    WITH j AS (
      SELECT l.l_quantity, l.l_extendedprice, l.l_partkey
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = '{Q17_BRAND}'
    ),
    t AS (
      SELECT *,
        CAST(SUM(CAST(l_quantity AS DECIMAL(30,4)))
               OVER (PARTITION BY l_partkey) AS DOUBLE)
          / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
      FROM j
    )
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) / 7.0
        AS avg_yearly,
      CAST(COUNT(*) AS BIGINT) AS n_small
    FROM t WHERE l_quantity < 0.2 * avg_qty
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to small-quantity orders of one brand (TPC-H Q17
    shape): the correlated-scalar-subquery pattern — each row compares
    against ITS part's average quantity — decorrelated into a window
    over the join output. Plan shape: the brand filter pushes into the
    part scan; whichever join strategy Catalyst picks, the data is
    keyed by partkey exactly once — small SF: broadcast join (zero
    join shuffle) + the window's single hashpartitioning exchange;
    at scale (part too big to broadcast): the join shuffles on partkey
    and the window REUSES that partitioning (ENSURE_REQUIREMENTS is
    already met), so the decorrelation never costs a second exchange.
    Threshold determinism: exact decimal avg -> one double multiply
    by 0.2 (same bits both engines)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    w = W.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(30,4)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(30,4)")).cast(
                    "double"
                )
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).cast("long").alias("n_small"),
        )
    )


@register(
    "top_supplier_revenue",
    f"""
    WITH r AS (
      SELECT l_suppkey AS supp_key,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,4))) AS DOUBLE) AS total_rev
      FROM lineitem
      WHERE epoch_us(l_shipdate) >= {Q15_T0_US}
        AND epoch_us(l_shipdate) < {Q15_T1_US}
      GROUP BY supp_key
    )
    SELECT r.supp_key, s.s_name AS supp_name, r.total_rev
    FROM r JOIN supplier s ON s.s_suppkey = r.supp_key
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM r)
    ORDER BY r.supp_key
    """,
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier(s) by half-year revenue (TPC-H Q15 shape): a
    grouped aggregate compared against the global max OVER ITSELF —
    ties all surface (no LIMIT 1 arbitrariness). Plan shape: one
    map-side-combinable aggregate to |suppliers| rows; the 1-row max
    re-aggregates THAT result (supplier-count-sized, not fact-sized)
    and broadcasts back; the name lookup broadcasts the matched
    suppliers. MAX over doubles is exact (comparison, not
    accumulation), so equality against it is engine-stable; revenue
    itself is the exact decimal-sum idiom."""
    li = _t(spark, sf_dir, "lineitem")
    rev_by_supp = (
        li.select(
            "l_suppkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(30,4)")
            .alias("_rev"),
            event_us(li, "l_shipdate").alias("_ship_us"),
        )
        .filter(
            (F.col("_ship_us") >= Q15_T0_US) & (F.col("_ship_us") < Q15_T1_US)
        )
        .groupBy(F.col("l_suppkey").alias("supp_key"))
        .agg(F.sum("_rev").cast("double").alias("total_rev"))
        .persist()  # read twice: the max subquery and the filter
    )
    mx = rev_by_supp.agg(F.max("total_rev").alias("_mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev_by_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_mx"))
        .join(s, F.col("supp_key") == s["s_suppkey"])
        .select("supp_key", F.col("s_name").alias("supp_name"), "total_rev")
        .transform(ordered, "supp_key")
    )


Q8_REGION = "ASIA"
Q8_NATION = "NATION_2"  # an ASIA nation (region 2 holds NATION_{2,7,12,17,22})


@register(
    "nation_market_share",
    f"""
    WITH j AS (
      SELECT CAST(epoch_us(date_trunc('year', o.o_orderdate)) AS BIGINT)
               AS order_year_us,
        n2.n_name AS supp_nation,
        CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4)) AS rev
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
                     AND r.r_name = '{Q8_REGION}'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    )
    SELECT order_year_us,
      CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev
               ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE)
        AS nation_revenue,
      CAST(SUM(rev) AS DOUBLE) AS total_revenue,
      CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev
               ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE)
        / CAST(SUM(rev) AS DOUBLE) AS market_share
    FROM j GROUP BY order_year_us ORDER BY order_year_us
    """,
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's supplier market share inside its region per order
    year (TPC-H Q8 shape): the deepest star join in the registry —
    two independent dimension arms (customer->nation->region gating
    WHICH sales count; supplier->nation labeling WHOSE sales they are)
    hang off the fact shuffle. The true dimensions (nation, region,
    nation-gated keys) travel by broadcast hint; customer and supplier
    scale with the corpus, so their joins carry no hint — AQE
    broadcasts them at small SF and degrades to shuffle at scale
    (same rule as part in promo_revenue_share). Calendar years
    via the proven date_trunc/epoch-us round-trip idiom
    (events_weekly_summary); share per year = conditional decimal sum
    over total decimal sum, one IEEE division."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders")
    o = o.select(
        "o_orderkey",
        "o_custkey",
        F.unix_micros(
            F.date_trunc(
                "year", F.timestamp_micros(event_us(o, "o_orderdate"))
            )
        ).alias("order_year_us"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    cust_nations = (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(F.col("n_nationkey").alias("_cnat"))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    supp_nation = n.select(
        F.col("n_nationkey").alias("_snat"), F.col("n_name").alias("supp_nation")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,4)"
    )
    zero = F.lit(0).cast("decimal(30,4)")
    nat_rev = F.when(F.col("supp_nation") == Q8_NATION, rev).otherwise(zero)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(cust_nations), c["c_nationkey"] == F.col("_cnat"))
        # no broadcast hint on supplier: it scales with the corpus
        # (same rule as part in promo_revenue_share) — AQE picks
        # broadcast at small SF and degrades to shuffle at scale
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(supp_nation), s["s_nationkey"] == F.col("_snat"))
        .groupBy("order_year_us")
        .agg(
            F.sum(nat_rev).cast("double").alias("nation_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .withColumn(
            "market_share", F.col("nation_revenue") / F.col("total_revenue")
        )
        .transform(ordered, "order_year_us")
    )
