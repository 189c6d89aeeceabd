"""Iterative graph computation as declarative DataFrame algebra.

`pagerank_fixed` runs a FIXED number of PageRank iterations entirely in
integer arithmetic so the result is bit-exact across engines, partition
orders, and join strategies:

- ranks are scaled BIGINTs (RANK_SCALE = 1e12 mass units per node);
- each contribution is `rank div out_degree` (truncating integer
  division — identical semantics in Spark `div` and DuckDB `//` for
  non-negative values);
- the damping update is `(15 * RANK_SCALE + 85 * contrib_sum) div 100`.

Integer sums are associative/commutative, so shuffle order cannot
perturb the result — the same determinism idiom as the engine's
decimal-sum aggregates, applied to an iterative fixpoint. This is the
declarative complement to the engine's other iterative operators
(`exact_kmeans_cells`'s Lloyd loop, `connected_components`'s label
propagation): the loop is unrolled into a chain of join+groupBy stages
that Catalyst plans as ordinary shuffles.

Scale shape: each iteration is one shuffle join of edges against the
current rank table on src plus one groupBy on dst — the textbook
distributed PageRank step. The edge table is persisted once and reused
by every iteration; co-partitioning edges and ranks on the join key
means AQE can avoid re-shuffling the static side. Dangling nodes are
avoided structurally (the caller passes a symmetrized edge list, so
out_degree >= 1 for every node).

No reference analogue — north-star extension (graph analytics over the
relational tables, e.g. the customer<->supplier fulfilment graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000_000_000  # integer mass units per node


def pagerank_fixed(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Integer-exact PageRank over a directed edge list.

    edges: DataFrame[src: string, dst: string]; every node must appear
    as a src at least once (symmetrize beforehand if needed) so there
    are no dangling nodes. Returns DataFrame[node, rank] with rank in
    RANK_SCALE-scaled units.
    """
    edges = edges.select("src", "dst").distinct().persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # out_deg joins against edges every iteration — fold it in once.
    contrib_edges = edges.join(deg, "src").persist()
    nodes = edges.select(F.col("src").alias("node")).distinct()

    ranks = nodes.withColumn("rank", F.lit(RANK_SCALE).cast("long"))
    for _ in range(iterations):
        contribs = (
            contrib_edges.join(
                ranks, contrib_edges["src"] == ranks["node"]
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div out_deg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("contrib_sum"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            F.expr(
                f"(15 * cast({RANK_SCALE} as bigint)"
                " + 85 * coalesce(contrib_sum, cast(0 as bigint))) div 100"
            ).alias("rank"),
        )
    out = ranks
    # edges/contrib_edges stay persisted until the returned plan is
    # executed; they are small relative to the rank shuffles and are
    # freed with the session. (A long-lived service would unpersist
    # after materializing.)
    return out
