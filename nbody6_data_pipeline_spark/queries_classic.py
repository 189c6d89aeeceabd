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

from decimal import Decimal

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
    # Join order matters at scale (guide §2.3/§3.2): the selective
    # nation-gated dimension joins run FIRST, so the one unavoidable
    # big shuffle (lineitem x orders on orderkey) carries only the
    # ~2/25 of rows that survive the gates on EACH side, instead of
    # shuffling both fact tables in full and filtering afterwards.
    # Inner joins commute, so the result is unchanged; AQE broadcasts
    # s2/c2 when they fit and falls back to a shuffle join otherwise.
    li2 = li.join(s2, li["l_suppkey"] == s2["s_suppkey"])
    o2 = o.join(c2, o["o_custkey"] == c2["c_custkey"])
    return (
        li2.join(o2, li2["l_orderkey"] == o2["o_orderkey"])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "order_year_us")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .transform(ordered, "supp_nation", "cust_nation", "order_year_us")
    )


# ---------------------------------------------------------------------------
# Q6 shape — tight filter + single exact aggregate (forecast revenue)
# ---------------------------------------------------------------------------

Y1996_LO = 820_454_400_000_000  # 1996-01-01
Y1996_HI = 852_076_800_000_000  # 1997-01-01 (1996 is a leap year)


@register(
    "forecast_revenue_change",
    f"""
    SELECT
      CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,4)))
        AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem
    WHERE epoch_us(l_shipdate) >= {Y1996_LO}
      AND epoch_us(l_shipdate) < {Y1996_HI}
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue_change(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue delta if mid-band discounts were dropped (TPC-H Q6
    shape): one scan, every predicate pushdown-eligible, one exact
    decimal aggregate. The whole query is a single map-side-combined
    partial agg — the canonical 'scan efficiency' probe: at 100 TB the
    only cost is the parquet scan itself, and the discount/quantity/
    date predicates all reach the reader (min-max row-group pruning).
    Discount bounds compare the ORIGINAL double column against the
    same double literals on both engines — no derived arithmetic, so
    the comparison is bit-identical."""
    li = _t(spark, sf_dir, "lineitem", spread=True)
    return (
        li.filter(
            (event_us(li, "l_shipdate") >= Y1996_LO)
            & (event_us(li, "l_shipdate") < Y1996_HI)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    _REV_DEC
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 shape — correlated MIN subquery (cheapest regional supplier)
# ---------------------------------------------------------------------------

Q2_REGION = "EUROPE"
Q2_TYPE = "STANDARD"
Q2_SIZE_LO, Q2_SIZE_HI = 10, 20


@register(
    "min_cost_regional_supplier",
    f"""
    WITH cost AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ), eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = '{Q2_REGION}'
    )
    SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_name,
      c.unit_cost
    FROM part p
    JOIN cost c ON c.partkey = p.p_partkey
    JOIN eu s ON s.s_suppkey = c.suppkey
    WHERE p.p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
      AND p.p_type = '{Q2_TYPE}'
      AND c.unit_cost = (
        SELECT MIN(c2.unit_cost)
        FROM cost c2 JOIN eu s2 ON s2.s_suppkey = c2.suppkey
        WHERE c2.partkey = p.p_partkey
      )
    ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q_min_cost_regional_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cheapest in-region supplier per part slice (TPC-H Q2 shape,
    partsupp derived from lineitem: supply cost := the minimum unit
    price ever shipped). The oracle keeps the correlated scalar-MIN
    subquery; the Spark plan decorrelates it as a window MIN over the
    part key on the already part-filtered, region-gated cost table —
    the standard rewrite, value-identical because the window scope
    equals the subquery's correlation scope. unit_cost is one IEEE
    division per row then MIN — bit-exact cross-engine. Scale: region
    gate broadcasts; the cost aggregation reuses the (partkey,
    suppkey) exchange; the window shuffles only the ~p_size-slice
    rows."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem", spread=True)
    cost = (
        li.groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                n.join(
                    F.broadcast(r),
                    n["n_regionkey"] == r["r_regionkey"],
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(Q2_SIZE_LO, Q2_SIZE_HI)
        & (F.col("p_type") == Q2_TYPE)
    )
    joined = (
        cost.join(p, cost["partkey"] == p["p_partkey"])
        .join(eu, cost["suppkey"] == eu["s_suppkey"])
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "unit_cost",
        )
    )
    best = F.min("unit_cost").over(W.partitionBy("p_partkey"))
    return (
        joined.withColumn("_best", best)
        .filter(F.col("unit_cost") == F.col("_best"))
        .drop("_best")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
        .transform(
            ordered, F.col("s_acctbal").desc(), "n_name", "s_name",
            "p_partkey",
        )
    )


# ---------------------------------------------------------------------------
# Q9 shape — multi-dimension star profit with a derived cost leg
# ---------------------------------------------------------------------------

Q9_TOKEN = "red"
COST_FRACTION = "0.1"  # decimal literal, exact on both engines


@register(
    "product_line_profit",
    f"""
    SELECT n.n_name AS nation,
      CAST(epoch_us(date_trunc('year', o.o_orderdate)) AS BIGINT)
        AS order_year_us,
      CAST(SUM(
        CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))
        - CAST(p.p_retailprice * l.l_quantity AS DECIMAL(30,4))
          * {COST_FRACTION}
      ) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%{Q9_TOKEN}%'
    GROUP BY 1, 2
    ORDER BY nation, order_year_us DESC
    """,
)
def q_product_line_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and order year for a product line
    (TPC-H Q9 shape; supply cost proxied as a fixed fraction of
    retail price — no partsupp table). Both cost legs are a single
    double multiply cast to DECIMAL(30,4) before any summation, then
    the decimal subtraction/scaling stays exact — the proven
    rev-idiom extended to a two-term expression. Scale: the part
    filter gates the fact table FIRST (broadcast under AQE at small
    SF, shuffle join at 100 TB); supplier→nation travels broadcast;
    the groupBy is map-side combinable."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"%{Q9_TOKEN}%"))
        .select("p_partkey", "p_retailprice")
    )
    li = _t(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount", "l_quantity",
    )
    o = _t(spark, sf_dir, "orders")
    o = o.select(
        "o_orderkey",
        F.unix_micros(
            F.date_trunc(
                "year", F.timestamp_micros(event_us(o, "o_orderdate"))
            )
        ).alias("order_year_us"),
    )
    sn = (
        _t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    amount = _rev() - (
        F.col("p_retailprice") * F.col("l_quantity")
    ).cast(_REV_DEC) * F.lit(Decimal(COST_FRACTION))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(sn), li["l_suppkey"] == sn["s_suppkey"])
        .groupBy("nation", "order_year_us")
        .agg(F.sum(amount).cast("double").alias("profit"))
        .transform(ordered, "nation", F.col("order_year_us").desc())
    )


# ---------------------------------------------------------------------------
# Q20 shape — nested IN with a correlated volume threshold
# ---------------------------------------------------------------------------

Q20_PREFIX = "red "


@register(
    "dominant_part_suppliers",
    f"""
    WITH sp AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
        SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
      FROM lineitem
      WHERE epoch_us(l_shipdate) >= {Y1996_LO}
        AND epoch_us(l_shipdate) < {Y1996_HI}
      GROUP BY 1, 2
    ), dom AS (
      SELECT sp.sk, sp.pk FROM sp
      WHERE sp.pk IN (
          SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_PREFIX}%'
        )
        AND 2 * sp.qty > (
          SELECT SUM(CAST(l.l_quantity AS DECIMAL(18,4)))
          FROM lineitem l
          WHERE l.l_partkey = sp.pk
            AND epoch_us(l.l_shipdate) >= {Y1996_LO}
            AND epoch_us(l.l_shipdate) < {Y1996_HI}
        )
    )
    SELECT s.s_name, n.n_name, COUNT(*) AS n_dominated
    FROM dom
    JOIN supplier s ON s.s_suppkey = dom.sk
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    ORDER BY n_dominated DESC, s.s_name
    """,
)
def q_dominant_part_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Suppliers that shipped the majority of a part's 1996 volume,
    for a name-prefixed part family (TPC-H Q20 shape; availqty
    replaced by shipped volume — no partsupp). The oracle is the
    canonical nested-IN-plus-correlated-threshold form; the Spark
    plan decorrelates the threshold as a window SUM over the part key
    on the semi-filtered per-(part, supplier) aggregate. The majority
    test is `2*qty > total` in exact decimals — no 0.5 multiply, no
    double comparison. Scale: the part-prefix gate broadcasts into
    the aggregate's output; the window reuses the groupBy's partkey
    exchange under AQE."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem", spread=True)
    li96 = li.filter(
        (event_us(li, "l_shipdate") >= Y1996_LO)
        & (event_us(li, "l_shipdate") < Y1996_HI)
    )
    sp = li96.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty"))
    red = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"{Q20_PREFIX}%"))
        .select("p_partkey")
    )
    gated = sp.join(
        F.broadcast(red), sp["pk"] == red["p_partkey"], "left_semi"
    )
    total = F.sum("qty").over(W.partitionBy("pk"))
    dom = (
        gated.withColumn("_total", total)
        .filter(F.col("qty") * 2 > F.col("_total"))
        .select("sk", "pk")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        dom.join(F.broadcast(s), dom["sk"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_dominated"))
        .transform(ordered, F.col("n_dominated").desc(), "s_name")
    )
