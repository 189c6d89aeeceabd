"""Sketch / graph / normalization queries: mergeable-summary and
iterative-graph primitives a 100 TB pipeline leans on, each with a
bit-exact DuckDB oracle.

- events_hll_distinct: HyperLogLog register statistics (the exact
  integer sufficient stats of the sketch) per event_type. The oracle
  replays the identical register construction; the float cardinality
  estimate is validated separately in tests (it is derived driver-side
  from these stats).
- doc_heavy_hitters: corpus-wide frequent tokens via per-partition
  Misra-Gries candidate generation + ONE exact recount — output equals
  the oracle's full-groupBy answer while shuffling only candidates.
- graph_pagerank: 3 PageRank iterations over the symmetrized
  customer<->supplier fulfilment graph in scaled-integer arithmetic;
  the oracle unrolls the same three iterations as CTEs.
- doc_tokenset_dedup: duplicate clusters by sorted-distinct-vocabulary
  fingerprint — catches word-order/repetition mutants exact dedup
  misses, at exact-dedup cost (hash groupBy; no pairwise anything).
- part_triangle_count: triangle census of the co-occurrence graph via
  the canonical a<b<c vertex-ordering wedge join.
- graph_kcore_peel: fixed-round k-core peel with per-round
  node/edge survivor telemetry (oracle: unrolled CTE rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.graph import RANK_SCALE, pagerank_fixed
from nbody6_data_pipeline_spark.operators.sketch import (
    HLL_M,
    heavy_hitters,
    hll_register_stats,
)
from nbody6_data_pipeline_spark.operators.text import ascii_lower, token_array
from nbody6_data_pipeline_spark.queries import _t, ordered, register

# ---------------------------------------------------------------------------
# HLL distinct sketch
# ---------------------------------------------------------------------------


@register(
    "events_hll_distinct",
    f"""
    WITH h AS (
      SELECT event_type,
        CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
             AS BIGINT) AS hv
      FROM events
    ),
    b AS (
      SELECT event_type, hv % {HLL_M} AS bucket, hv // {HLL_M} AS w FROM h
    ),
    r AS (
      SELECT event_type, bucket,
        MAX(CASE WHEN w = 0 THEN 52
                 ELSE strpos(lpad(bin(w), 51, '0'), '1') END) AS reg
      FROM b GROUP BY event_type, bucket
    )
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS used_registers,
      CAST({HLL_M} - COUNT(*) AS BIGINT) AS zero_registers,
      CAST(SUM(reg) AS BIGINT) AS sum_rank
    FROM r GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type as a mergeable HLL sketch: the
    shuffle carries at most 512 registers per group however many
    billions of events stream through — THE approximate-distinct shape
    for 100 TB (register-wise max merges across shards, days, or
    streaming micro-batches). Output is the sketch's integer
    sufficient statistics, which are deterministic and hash-checked
    against DuckDB replaying the same construction; the cardinality
    estimate (float) is derived from them driver-side
    (operators/sketch.hll_estimate_from_registers) and accuracy-tested
    against exact COUNT(DISTINCT) in test_sketch.py."""
    e = _t(spark, sf_dir, "events")
    return hll_register_stats(e, F.col("user_id"), ["event_type"]).transform(
        ordered, "event_type"
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

HH_INV_THRESHOLD = 200  # keep tokens with freq > N/200 (0.5% of corpus)


@register(
    "doc_heavy_hitters",
    f"""
    WITH toks AS (
      SELECT unnest(list_filter(
        regexp_split_to_array(text, '\\s+'), x -> x != '')) AS token
      FROM documents
    ),
    c AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token)
    SELECT token, cnt FROM c
    WHERE cnt * {HH_INV_THRESHOLD} > (SELECT CAST(SUM(cnt) AS BIGINT) FROM c)
    ORDER BY cnt DESC, token
    """,
)
def q_doc_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters (tokens with frequency > 0.5% of all
    tokens) via Misra-Gries candidates + one exact recount. The oracle
    does the full token groupBy; the engine shuffles only MG survivors
    (<= capacity per partition) plus one collapsed long-tail group —
    the difference between shuffling ~every distinct token of a 100 TB
    corpus and shuffling a few hundred rows. Exact recount makes the
    answers identical (operators/sketch.heavy_hitters)."""
    d = _t(spark, sf_dir, "documents", spread=True)
    tokens = d.select(F.explode(token_array(F.col("text"))).alias("token"))
    return heavy_hitters(tokens, HH_INV_THRESHOLD).transform(
        ordered, F.col("cnt").desc(), "token"
    )


# ---------------------------------------------------------------------------
# PageRank on the customer<->supplier fulfilment graph
# ---------------------------------------------------------------------------

PR_ITER = 3


def _pr_edges_sql() -> str:
    # numeric node ids: customers even (2k), suppliers odd (2k+1) —
    # long-keyed joins/aggs instead of string concat per edge
    return """
      SELECT DISTINCT o.o_custkey * 2 AS src,
                      l.l_suppkey * 2 + 1 AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    """


def fulfilment_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized customer<->supplier fulfilment edge list — the ONE
    Spark-side twin of _pr_edges_sql (+ its reversal), shared by every
    graph query on this schema so the builds cannot drift. orders
    (2 pruned columns) is broadcast-sized at any realistic
    order/lineitem ratio -> the fact table never shuffles for the
    join; the DEDUP runs on the forward (customer->supplier) list only
    and the reverse direction is mirrored afterwards — customers are
    even ids and suppliers odd, so the two directions are disjoint by
    parity and the mirrored union of a distinct forward list is
    already distinct. The distinct Exchange therefore carries HALF the
    rows of the old explode-both-directions-then-dedup shape (guide
    §2.3 shuffle fewer bytes), and ReuseExchange lets the mirror
    branch read the same shuffle output instead of recomputing the
    scan+join."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    c, s = (F.col("o_custkey") * 2), (F.col("l_suppkey") * 2 + 1)
    fwd = (
        li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        .select(c.alias("src"), s.alias("dst"))
        .distinct()
    )
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


@register(
    "graph_pagerank",
    f"""
    WITH fwd AS ({_pr_edges_sql()}),
    edges AS (
      -- the halves are disjoint by construction ('c' vs 's' prefixes),
      -- so UNION ALL of the deduped forward list is already distinct
      SELECT src, dst FROM fwd
      UNION ALL
      SELECT dst AS src, src AS dst FROM fwd
    ),
    deg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    r0 AS (SELECT node, CAST({RANK_SCALE} AS BIGINT) AS rank FROM nodes),
    c1 AS (
      SELECT e.dst AS node, SUM(r.rank // d.out_deg) AS cs
      FROM edges e JOIN deg d ON e.src = d.src JOIN r0 r ON e.src = r.node
      GROUP BY e.dst
    ),
    r1 AS (
      SELECT n.node,
        (15 * CAST({RANK_SCALE} AS BIGINT) + 85 * COALESCE(c1.cs, 0)) // 100
          AS rank
      FROM nodes n LEFT JOIN c1 ON n.node = c1.node
    ),
    c2 AS (
      SELECT e.dst AS node, SUM(r.rank // d.out_deg) AS cs
      FROM edges e JOIN deg d ON e.src = d.src JOIN r1 r ON e.src = r.node
      GROUP BY e.dst
    ),
    r2 AS (
      SELECT n.node,
        (15 * CAST({RANK_SCALE} AS BIGINT) + 85 * COALESCE(c2.cs, 0)) // 100
          AS rank
      FROM nodes n LEFT JOIN c2 ON n.node = c2.node
    ),
    c3 AS (
      SELECT e.dst AS node, SUM(r.rank // d.out_deg) AS cs
      FROM edges e JOIN deg d ON e.src = d.src JOIN r2 r ON e.src = r.node
      GROUP BY e.dst
    ),
    r3 AS (
      SELECT n.node,
        (15 * CAST({RANK_SCALE} AS BIGINT) + 85 * COALESCE(c3.cs, 0)) // 100
          AS rank
      FROM nodes n LEFT JOIN c3 ON n.node = c3.node
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
                ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,
           CAST(rank AS BIGINT) AS rank
    FROM r3
    ORDER BY rank DESC, node
    LIMIT 50
    """,
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 PageRank nodes of the symmetrized customer<->supplier
    graph (an edge where a supplier's lineitem fulfilled a customer's
    order). Three fixed iterations in scaled-integer arithmetic
    (operators/graph.pagerank_fixed) — bit-exact against the oracle's
    unrolled recursive CTEs because every step is integer sum/div.
    Each iteration is one join+groupBy shuffle keyed on node id; the
    static edge+degree table is persisted once. High-degree suppliers
    surface at the top — the graph-centrality complement to the
    engine's flat aggregation views."""
    edges = fulfilment_edges(spark, sf_dir)
    ranks = pagerank_fixed(
        edges, iterations=PR_ITER, assume_distinct=True, symmetric=True
    )
    labeled = ranks.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c"), (F.col("node") / 2).cast("long").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("s"), (F.col("node") / 2).cast("long").cast("string"))
        )
        .alias("node"),
        F.col("rank").cast("long").alias("rank"),
    )
    return (
        labeled.orderBy(F.col("rank").desc(), "node")
        .limit(50)
        .transform(ordered, F.col("rank").desc(), "node")
    )


# ---------------------------------------------------------------------------
# Normalized-text dedup
# ---------------------------------------------------------------------------


@register(
    "doc_tokenset_dedup",
    """
    WITH n AS (
      SELECT doc_id, source,
        md5(COALESCE(array_to_string(list_sort(list_distinct(list_filter(
          regexp_split_to_array(translate(COALESCE(text, ''), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+'),
          x -> x != ''))), ' '), '')) AS fp
      FROM documents
    )
    SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS keep_doc,
      CAST(COUNT(*) AS BIGINT) AS n_dups,
      CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM n GROUP BY fp HAVING COUNT(*) > 1
    ORDER BY n_dups DESC, fp
    """,
)
def q_doc_tokenset_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-fingerprint duplicate clusters: fingerprint = md5 of
    the SORTED DISTINCT token set of the lowercased text. Documents
    built from the same vocabulary (word-order shuffles, token
    repetitions, template re-fills) collide even when byte-exact and
    whitespace-normalized dedup both miss them — a one-pass,
    hash-groupBy-cost middle ground between exact dedup and
    MinHash-LSH (which handles *partial* overlap but needs candidate
    generation + verify). One map-side-combined shuffle on the
    16-byte fingerprint; embarrassingly parallel at any corpus size.
    keep_doc = MIN(doc_id), the engine's canonical-winner rule."""
    d = _t(spark, sf_dir, "documents")
    # COALESCE to '' on BOTH sides: Spark's concat_ws treats a NULL
    # token array as empty (md5('')), DuckDB's array_to_string yields
    # NULL — align by fingerprinting NULL text as the empty vocabulary
    fp = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(
                    token_array(ascii_lower(F.coalesce(F.col("text"), F.lit(""))))
                )
            ),
        )
    )
    return (
        d.select("doc_id", "source", fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc"),
            F.count("*").alias("n_dups"),
            F.countDistinct("source").alias("n_sources"),
        )
        .filter(F.col("n_dups") > 1)
        .transform(ordered, F.col("n_dups").desc(), "fp")
    )


# ---------------------------------------------------------------------------
# Triangle counting on the part co-occurrence graph
# ---------------------------------------------------------------------------

TRI_MIN_COOC = 2  # same co-occurrence floor as part_affinity_lift


@register(
    "part_triangle_count",
    f"""
    WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM p a JOIN p b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb HAVING COUNT(*) >= {TRI_MIN_COOC}
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
      CAST((SELECT COUNT(*)
            FROM e ab JOIN e bc ON ab.pb = bc.pa
                      JOIN e ac ON ac.pa = ab.pa AND ac.pb = bc.pb)
           AS BIGINT) AS n_triangles
    """,
)
def q_part_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-occurrence graph (edges = part
    pairs sharing >= {TRI_MIN_COOC} orders): the standard clustering
    / community-structure signal, computed with the canonical
    vertex-ordering trick — edges are stored a<b only, and each
    triangle a<b<c is found exactly once by joining wedge (a,b)+(b,c)
    against closing edge (a,c). Two shuffle joins on vertex keys over
    the co-occurrence-thresholded edge list, whose size the
    MIN_COOC floor bounds independently of the raw order volume (the
    same df-cap idea as the n-gram index). The edge list is persisted
    once and read by all three join legs."""
    li = _t(spark, sf_dir, "lineitem", spread=True)
    # basket build + HOF pair unfold, same shape as part_affinity_lift:
    # one groupBy forms per-order part sets (collect_set dedups
    # map-side), ordered pairs unfold in-row
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    ps = F.col("ps")
    pair_arr = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + 2, F.greatest(F.size(ps) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    e = (
        baskets.filter(F.size(ps) >= 2)
        .select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= TRI_MIN_COOC)
        .select("pa", "pb")
        .persist()
    )
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.pb") == F.col("bc.pa"))
        .join(
            ac,
            (F.col("ac.pa") == F.col("ab.pa"))
            & (F.col("ac.pb") == F.col("bc.pb")),
        )
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    edges = e.agg(F.count("*").cast("long").alias("n_edges"))
    return edges.crossJoin(F.broadcast(tri)).select("n_edges", "n_triangles")


# ---------------------------------------------------------------------------
# k-core peeling rounds on the co-occurrence graph
# ---------------------------------------------------------------------------

KCORE_K = 2
KCORE_ROUNDS = 2


def _cooc_edges_sql() -> str:
    return f"""
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb HAVING COUNT(*) >= {TRI_MIN_COOC}
    """


@register(
    "graph_kcore_peel",
    f"""
    WITH fw AS ({_cooc_edges_sql()}),
    e0 AS (SELECT pa AS s, pb AS d FROM fw
           UNION ALL SELECT pb AS s, pa AS d FROM fw),
    d0 AS (SELECT s, COUNT(*) AS c FROM e0 GROUP BY s),
    g0 AS (SELECT s FROM d0 WHERE c >= {KCORE_K}),
    e1 AS (SELECT e.s, e.d FROM e0 e
           JOIN g0 a ON e.s = a.s JOIN g0 b ON e.d = b.s),
    d1 AS (SELECT s, COUNT(*) AS c FROM e1 GROUP BY s),
    g1 AS (SELECT s FROM d1 WHERE c >= {KCORE_K}),
    e2 AS (SELECT e.s, e.d FROM e1 e
           JOIN g1 a ON e.s = a.s JOIN g1 b ON e.d = b.s)
    SELECT 0 AS round,
      CAST((SELECT COUNT(DISTINCT s) FROM e0) AS BIGINT) AS n_nodes,
      CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS n_directed_edges
    UNION ALL
    SELECT 1,
      CAST((SELECT COUNT(DISTINCT s) FROM e1) AS BIGINT),
      CAST((SELECT COUNT(*) FROM e1) AS BIGINT)
    UNION ALL
    SELECT 2,
      CAST((SELECT COUNT(DISTINCT s) FROM e2) AS BIGINT),
      CAST((SELECT COUNT(*) FROM e2) AS BIGINT)
    ORDER BY round
    """,
)
def q_graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_ROUNDS}-round {KCORE_K}-core peel of the part
    co-occurrence graph: per-round surviving node/edge counts — the
    convergence telemetry of iterative graph sparsification
    (operators/graph.kcore_peel). Degree aggregates are node-sized
    and broadcast back onto the (localCheckpointed, monotonically
    shrinking) edge list, so no round re-shuffles the edges."""
    from nbody6_data_pipeline_spark.operators.graph import kcore_peel

    li = _t(spark, sf_dir, "lineitem", spread=True)
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    ps = F.col("ps")
    pair_arr = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + 2, F.greatest(F.size(ps) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    fw = (
        baskets.filter(F.size(ps) >= 2)
        .select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= TRI_MIN_COOC)
        .persist()  # both symmetrize branches read it
    )
    sym = fw.select(F.col("pa").alias("s"), F.col("pb").alias("d")).unionByName(
        fw.select(F.col("pb").alias("s"), F.col("pa").alias("d"))
    )
    stats = None
    for rnd, (e, _deg) in enumerate(kcore_peel(sym, KCORE_K, KCORE_ROUNDS)):
        row = e.agg(
            F.lit(rnd).alias("round"),
            F.count_distinct(F.col("s")).cast("long").alias("n_nodes"),
            F.count(F.lit(1)).cast("long").alias("n_directed_edges"),
        )
        stats = row if stats is None else stats.unionByName(row)
    return stats.transform(ordered, "round")


# ---------------------------------------------------------------------------
# Dedup provenance (row-level loser -> winner audit)
# ---------------------------------------------------------------------------


@register(
    "doc_dedup_provenance",
    """
    WITH f AS (
      SELECT doc_id, md5(text) AS bfp,
        md5(array_to_string(list_sort(list_distinct(list_filter(
          regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+'), x -> x != ''))),
          ' ')) AS vfp
      FROM documents
    ),
    w AS (
      SELECT doc_id,
        MIN(doc_id) OVER (PARTITION BY bfp) AS bwin,
        MIN(doc_id) OVER (PARTITION BY vfp) AS vwin
      FROM f
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
      CASE WHEN doc_id != bwin THEN 'exact_bytes'
           ELSE 'exact_vocab' END AS stage,
      CAST(CASE WHEN doc_id != bwin THEN bwin ELSE vwin END
           AS BIGINT) AS dup_of
    FROM w WHERE doc_id != bwin OR doc_id != vwin
    ORDER BY doc_id
    """,
)
def q_doc_dedup_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level dedup PROVENANCE: for every document the exact-dedup
    funnel would drop, WHICH doc it duplicates and at which stage —
    `exact_bytes` (byte-identical text) attributed before
    `exact_vocab` (same sorted-distinct vocabulary), mirroring the
    corpus pipeline's funnel order (corpus_pipeline.py writes the same
    product incrementally to provenance/). The batch recipe: both
    fingerprints in one projection, per-fingerprint MIN(doc_id) via
    two partitioned windows (each one shuffle whose partitions are
    duplicate-cluster-sized — no global window, no join back), then a
    funnel-ordered CASE. Byte-duplicates are vocab-duplicates too, so
    the byte stage claims first; `dup_of` is the winner of the CLAIMED
    stage's cluster (a byte-loser maps to its byte-cluster winner,
    which may itself be a vocab-loser of a wider cluster)."""
    d = _t(spark, sf_dir, "documents")
    vfp = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(F.array_distinct(token_array(ascii_lower(F.col("text"))))),
        )
    )
    f = d.select("doc_id", F.md5("text").alias("bfp"), vfp.alias("vfp"))
    w = f.select(
        "doc_id",
        F.min("doc_id").over(W.partitionBy("bfp")).alias("bwin"),
        F.min("doc_id").over(W.partitionBy("vfp")).alias("vwin"),
    )
    loser_b = F.col("doc_id") != F.col("bwin")
    loser_v = F.col("doc_id") != F.col("vwin")
    return (
        w.filter(loser_b | loser_v)
        .select(
            "doc_id",
            F.when(loser_b, "exact_bytes")
            .otherwise("exact_vocab")
            .alias("stage"),
            F.when(loser_b, F.col("bwin")).otherwise(F.col("vwin")).alias(
                "dup_of"
            ),
        )
        .transform(ordered, "doc_id")
    )


# ---------------------------------------------------------------------------
# Depth-bounded BFS layers from a seed set (reachability / blast-radius
# analysis over the fulfilment graph)
# ---------------------------------------------------------------------------

BFS_DEPTH = 3
BFS_SEED_NATION = 1


@register(
    "graph_bfs_layers",
    f"""
    WITH RECURSIVE fwd AS ({_pr_edges_sql()}),
    edges AS (
      -- NULL endpoints dropped to mirror bfs_layers' contract (a NULL
      -- node neither joins nor belongs in the layer output)
      SELECT src, dst FROM fwd
      WHERE src IS NOT NULL AND dst IS NOT NULL
      UNION ALL
      SELECT dst AS src, src AS dst FROM fwd
      WHERE src IS NOT NULL AND dst IS NOT NULL
    ),
    seeds AS (
      SELECT DISTINCT c_custkey * 2 AS node FROM customer
      WHERE c_nationkey = {BFS_SEED_NATION} AND c_custkey IS NOT NULL
    ),
    bfs(node, dist) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT e.dst, b.dist + 1
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.dist < {BFS_DEPTH}
    )
    SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
    FROM bfs GROUP BY node
    ORDER BY dist, node
    """,
)
def q_graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-distance BFS layers from one nation's customers over the
    symmetrized customer<->supplier fulfilment graph, depth-bounded —
    the blast-radius question ('every account within 3 hops of this
    cohort') that recommendation seeding, fraud spread, and
    contamination tracing all reduce to. operators/graph.bfs_layers
    expands one frontier per level (join -> distinct -> anti-join,
    each a node-keyed shuffle); the oracle is the equivalent
    depth-bounded recursive CTE reduced by MIN(dist) — identical
    min-distance semantics because the UNION-dedup of (node, dist)
    pairs can only produce a node's first appearance at its shortest
    depth. NULL keys never join in either engine and are filtered
    from the seed set."""
    from nbody6_data_pipeline_spark.operators.graph import bfs_layers

    edges = fulfilment_edges(spark, sf_dir).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    cust = _t(spark, sf_dir, "customer")
    seeds = (
        cust.filter(
            (F.col("c_nationkey") == BFS_SEED_NATION)
            & F.col("c_custkey").isNotNull()
        )
        .select((F.col("c_custkey") * 2).alias("node"))
    )
    return (
        bfs_layers(edges, seeds, BFS_DEPTH)
        .transform(ordered, "dist", "node")
    )
