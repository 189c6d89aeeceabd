"""Classic decorrelation shapes (TPC-H Q4/Q7/Q10/Q16/Q18/Q21
adapted to the synthetic star schema — no partsupp table and no
commit/receipt dates, so "late" means shipped >60 days after the
order date, and the part-supplier relation is derived from lineitem).

Each query is the canonical correlated-subquery formulation on the
oracle side (EXISTS / NOT EXISTS / NOT IN / HAVING-then-join-back —
DuckDB decorrelates them itself) and the explicitly decorrelated
DataFrame plan on the Spark side (semi/anti joins, per-group
aggregate + join-back). That pairing is the point: it demonstrates
the rewrite a distributed engine needs IS value-identical to the
subquery semantics, hash-checked cross-engine.

Determinism: the shared idioms from queries.py — epoch-us integer
date literals (never year()/DATE arithmetic), decimal sums cast to
double, one IEEE division max, `ordered()` total sorts with explicit
tiebreakers before every LIMIT.

Scale notes (100 TB): dimension gates (nation, region, the
negative-balance supplier set) travel by broadcast; corpus-scaling
sides (customer, supplier, part, orders aggregates) carry NO hint —
AQE broadcasts them at small SF and degrades to shuffle joins at
scale. Group-by-key join-backs reuse the aggregation key so the
exchange is shared under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.queries import (
    _t,
    event_us,
    ordered,
    register,
)

LATE_US = 60 * 86_400 * 1_000_000  # shipped >60 days after order
# epoch-us window literals (UTC midnights; computed once, by hand)
H1_1996_LO = 820_454_400_000_000  # 1996-01-01
H1_1996_HI = 836_179_200_000_000  # 1996-07-01
Q1_1996_HI = 828_316_800_000_000  # 1996-04-01
Q18_MIN_QTY = 300  # ~99.9th pctl of per-order quantity sums
Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)
Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"

_REV_DEC = "decimal(30,4)"


def _rev() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        _REV_DEC
    )


# ---------------------------------------------------------------------------
# Q4 shape — EXISTS with a correlated inequality (late-line check)
# ---------------------------------------------------------------------------


@register(
    "order_priority_late_check",
    f"""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE epoch_us(o.o_orderdate) >= {H1_1996_LO}
      AND epoch_us(o.o_orderdate) < {H1_1996_HI}
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + {LATE_US}
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q_order_priority_late_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Orders per priority in a half-year window having at least one
    late-shipped line (TPC-H Q4 shape). The correlated EXISTS
    decorrelates to a LEFT SEMI join on the order key with the
    inequality as an extra join predicate — Spark evaluates it inside
    the sort-merge semi join, so each order is emitted at most once
    and the lineitem side is never aggregated. The date window is a
    pushed-down parquet filter on the orders scan."""
    o = _t(spark, sf_dir, "orders")
    o = o.select(
        "o_orderkey",
        "o_orderpriority",
        event_us(o, "o_orderdate").alias("_order_us"),
    ).filter(
        (F.col("_order_us") >= H1_1996_LO) & (F.col("_order_us") < H1_1996_HI)
    )
    li = _t(spark, sf_dir, "lineitem")
    li = li.select(
        "l_orderkey", event_us(li, "l_shipdate").alias("_ship_us")
    )
    late_exists = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (F.col("_ship_us") > F.col("_order_us") + F.lit(LATE_US)),
        "left_semi",
    )
    return (
        late_exists.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .transform(ordered, "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q18 shape — HAVING over a child aggregate, then join back up the star
# ---------------------------------------------------------------------------


@register(
    "large_volume_orders",
    f"""
    WITH big AS (
      SELECT l_orderkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(30,4))) > {Q18_MIN_QTY}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
      CAST(epoch_us(o.o_orderdate) AS BIGINT) AS orderdate_us,
      o.o_totalprice, big.sum_qty
    FROM big
    JOIN orders o   ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers behind the very largest orders by total quantity
    (TPC-H Q18 shape): aggregate the fact table per order, keep the
    ~0.1% of orders over the threshold, then walk the survivors back
    up through orders and customer. The HAVING runs map-side-partial
    first, so the join-back input is already tiny — AQE turns both
    upward joins into broadcasts of the SURVIVOR side, never the
    dimension side. Quantity sums use the exact-decimal idiom (the
    values are whole numbers, but the idiom is uniform engine-wide)."""
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast(_REV_DEC)).alias("_dq")
        )
        .filter(F.col("_dq") > Q18_MIN_QTY)
        .select("l_orderkey", F.col("_dq").cast("double").alias("sum_qty"))
    )
    o = _t(spark, sf_dir, "orders")
    o = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        event_us(o, "o_orderdate").alias("orderdate_us"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "orderdate_us",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .transform(ordered, F.col("o_totalprice").desc(), "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Q21 shape — EXISTS + NOT EXISTS against the same child (sole blame)
# ---------------------------------------------------------------------------


@register(
    "sole_late_supplier",
    f"""
    WITH l AS (
      SELECT l_orderkey, l_suppkey, epoch_us(l_shipdate) AS ship_us
      FROM lineitem
    ),
    o AS (
      SELECT o_orderkey, epoch_us(o_orderdate) AS order_us
      FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM l l1
    JOIN o ON l1.l_orderkey = o.o_orderkey
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE l1.ship_us > o.order_us + {LATE_US}
      AND EXISTS (
        SELECT 1 FROM l l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM l l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.ship_us > o.order_us + {LATE_US}
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely to blame for a finished order shipping late
    (TPC-H Q21 shape — the hardest classic decorrelation: EXISTS and
    NOT EXISTS over the same correlated child). Rather than two more
    joins against lineitem, both subqueries collapse into ONE
    per-order aggregate — ``EXISTS another supplier`` ≡
    ``count(distinct suppkey) >= 2`` and ``NOT EXISTS another LATE
    supplier`` ≡ ``count(distinct late suppkey) = 1`` given the
    current line is late — so the fact table is scanned once, the
    aggregate and the join-back share the order-key exchange, and
    the count stays per-LINE (a supplier twice late on one order
    counts twice), exactly as the subquery form counts l1 rows."""
    li = _t(spark, sf_dir, "lineitem")
    li = li.select(
        "l_orderkey",
        "l_suppkey",
        event_us(li, "l_shipdate").alias("_ship_us"),
    )
    o = _t(spark, sf_dir, "orders")
    o = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", event_us(o, "o_orderdate").alias("_order_us")
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("_ship_us") > F.col("_order_us") + F.lit(LATE_US)).alias(
            "_late"
        ),
    )
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("_late"), F.col("l_suppkey"))
        ).alias("_n_late"),
    )
    blamed = (
        j.filter(F.col("_late"))
        .join(
            per_order.filter(
                (F.col("_n_supp") >= 2) & (F.col("_n_late") == 1)
            ),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(s, blamed["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.sum("numwait").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
        .transform(ordered, F.col("numwait").desc(), "s_name")
    )


# ---------------------------------------------------------------------------
# Q16 shape — NOT IN exclusion + COUNT DISTINCT rollup
# ---------------------------------------------------------------------------


@register(
    "part_supplier_counts",
    f"""
    SELECT p.p_brand, p.p_type, p.p_size,
      COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN {Q16_SIZES}
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 100
    """,
)
def q_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier counts per (brand, type, size) over the
    lineitem-derived part-supplier relation, excluding suppliers with
    a negative balance (TPC-H Q16 shape: NOT IN → anti-join +
    COUNT DISTINCT). The exclusion set is a filtered dimension —
    broadcast LEFT ANTI, safe because s_suppkey is non-null (the
    NOT-IN NULL trap doesn't arise and the oracle agrees). The
    count-distinct runs as Spark's two-phase distinct aggregate:
    partial de-dup on (group, suppkey) before the final exchange."""
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(*Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(bad),
            li["l_suppkey"] == bad["s_suppkey"],
            "left_anti",
        )
        .join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(100)
        .transform(
            ordered, F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


# ---------------------------------------------------------------------------
# Q10 shape — returned-revenue rollup to the customer grain
# ---------------------------------------------------------------------------


@register(
    "returned_item_customers",
    f"""
    SELECT c.c_custkey, c.c_name,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
      c.c_acctbal, n.n_name
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND epoch_us(o.o_orderdate) >= {H1_1996_LO}
      AND epoch_us(o.o_orderdate) < {Q1_1996_HI}
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_returned_item_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top customers by revenue lost to returns in one quarter
    (TPC-H Q10 shape). The returnflag filter prunes the fact scan
    (pushed to parquet), the quarter window prunes orders before its
    join, nation rides along by broadcast, and the rollup lands on
    the customer grain — revenue is the exact decimal sum cast to
    double, so the ORDER BY on it is bit-stable cross-engine."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    o = _t(spark, sf_dir, "orders")
    o = (
        o.select(
            "o_orderkey",
            "o_custkey",
            event_us(o, "o_orderdate").alias("_order_us"),
        )
        .filter(
            (F.col("_order_us") >= H1_1996_LO)
            & (F.col("_order_us") < Q1_1996_HI)
        )
        .drop("_order_us")
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .transform(ordered, F.col("revenue").desc(), "c_custkey")
    )


# ---------------------------------------------------------------------------
# Q7 shape — bilateral nation-pair volume per year
# ---------------------------------------------------------------------------


@register(
    "bilateral_trade_volume",
    f"""
    WITH j AS (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(epoch_us(date_trunc('year', o.o_orderdate)) AS BIGINT)
          AS order_year_us,
        CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))
          AS rev
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
         OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}')
    )
    SELECT supp_nation, cust_nation, order_year_us,
      CAST(SUM(rev) AS DOUBLE) AS revenue
    FROM j
    GROUP BY supp_nation, cust_nation, order_year_us
    ORDER BY supp_nation, cust_nation, order_year_us
    """,
)
def q_bilateral_trade_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trade volume between two nations per order year, both
    directions (TPC-H Q7 shape). Both dimension arms are gated to the
    two nations BEFORE touching the fact table — supplier and
    customer are each semi-reduced by an inner join against the
    two-row nation slice (broadcast), so the only large joins carry
    ~2/25 of each dimension; the asymmetric pair predicate then keeps
    the two cross directions. Years via the date_trunc/epoch-us
    round-trip; revenue the exact decimal sum."""
    pair = (Q7_NATION_A, Q7_NATION_B)
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s2 = s.join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("_sn"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        s["s_nationkey"] == F.col("_sn"),
    ).select("s_suppkey", "supp_nation")
    c2 = c.join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("_cn"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        c["c_nationkey"] == F.col("_cn"),
    ).select("c_custkey", "cust_nation")
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
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s2, li["l_suppkey"] == s2["s_suppkey"])
        .join(c2, o["o_custkey"] == c2["c_custkey"])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "order_year_us")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .transform(ordered, "supp_nation", "cust_nation", "order_year_us")
    )
