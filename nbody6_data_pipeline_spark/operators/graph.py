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
propagation).

Scale shape (deliberately NOT the naive unrolled-join plan):

- The static side — each edge with its source's out-degree — is built
  from a map-side-combined degree aggregate joined back onto the edges
  (broadcast when the |V|-sized degree table fits; never a full-edge
  window sort) and materialized once via localCheckpoint, truncating
  lineage so the three iteration plans stay flat (same idiom as
  `operators/dedup.connected_components`).
- The per-node rank state is |V| rows, orders of magnitude smaller
  than |E|, so each iteration joins the rank table against the cached
  edge list with a SIZE-DISPATCHED strategy (``_state_hint``): node
  state up to BROADCAST_MAX_NODES rows is broadcast (the edge list
  never re-shuffles; the only per-iteration shuffle is the
  map-side-combined contribution aggregation, bounded by |V|), and
  bigger state drops the hint so Spark plans a shuffle hash join on
  the node key instead — the decision is made ONCE per call from an
  actual count, not a manual edit, so a billion-node rank table can
  never be force-broadcast into executor OOM.
- Iteration 1 needs no join at all: ranks are uniform, so each edge's
  contribution is the constant RANK_SCALE div out_deg.
- On symmetric graphs (`symmetric=True` — e.g. a symmetrized
  bipartite list) every node has an in-edge, so the generic
  all-nodes-left-join step collapses into the contribution aggregate
  itself, halving the per-iteration stage count. Dangling nodes are
  avoided structurally for the same reason.

No reference analogue — north-star extension (graph analytics over the
relational tables, e.g. the customer<->supplier fulfilment graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000_000_000  # integer mass units per node

# Node-state tables at or below this row count are broadcast each
# iteration (~16 B of key+rank per row -> at most ~160 MB, inside a
# normal executor's broadcast budget). Above it the hint is DROPPED
# and Spark plans a shuffle hash join on the node key — a hardcoded
# broadcast of a billion-node rank table would OOM every executor at
# 100x scale. Join strategy cannot perturb the integer-exact sums, so
# both paths are bit-identical (test_graph_shuffle_path_bit_exact).
BROADCAST_MAX_NODES = 10_000_000


def _state_hint(state: DataFrame, n_nodes: int) -> DataFrame:
    """Size-dispatch for per-iteration node state — the
    connected_components pattern: count once, then choose broadcast
    vs shuffle join for every iteration."""
    return F.broadcast(state) if n_nodes <= BROADCAST_MAX_NODES else state


def _cap_parts(df: DataFrame) -> DataFrame:
    """Narrow-coalesce an iteratively re-read edge frame to the
    session's core count before it is localCheckpointed. Symmetrize
    unions (fwd + mirrored) hand the checkpoint 2x the shuffle
    partition count, and the checkpoint PINS that count for every
    subsequent peel/BFS/PageRank round (the per-round joins are
    broadcast-side, so nothing downstream re-partitions): each round
    then launches one task per surplus tiny partition — pure
    scheduling overhead, measured as 64-task stages moving ~11 KB per
    task. coalesce() never raises a partition count, so a frame
    already at or below core count is untouched, and no shuffle is
    added either way (guide §2.4)."""
    return df.coalesce(df.sparkSession.sparkContext.defaultParallelism)


def _node_bound(edges: DataFrame, key: str = "src") -> int:
    """|V| or a cheap upper bound of it, for the broadcast decision.
    Every node appears as a `key` at least once, so |V| <= |E|; the
    exact distinct count (a real shuffle) runs only when the edge
    count alone cannot prove the state is broadcast-safe."""
    n_edges = edges.count()
    if n_edges <= BROADCAST_MAX_NODES:
        return n_edges
    return edges.select(key).distinct().count()


def _dst_bound(edges: DataFrame, n_edges: int) -> int:
    """Upper bound on |distinct dst| for the contribs-table broadcast
    decision. The contribs aggregate is keyed by dst, and on a graph
    that violates the every-node-is-a-src contract (dangling sinks)
    |distinct dst| can exceed |distinct src| — so the broadcast
    decision for contribs must be bounded by the dst domain, not the
    src domain. |distinct dst| <= |E| proves safety cheaply; the exact
    distinct count runs only past that."""
    if n_edges <= BROADCAST_MAX_NODES:
        return n_edges
    return edges.select("dst").distinct().count()


def _damp(contrib_col: str) -> str:
    return (
        f"(15 * cast({RANK_SCALE} as bigint)"
        f" + 85 * coalesce({contrib_col}, cast(0 as bigint))) div 100"
    )


def pagerank_fixed(
    edges: DataFrame,
    iterations: int = 3,
    assume_distinct: bool = False,
    symmetric: bool = False,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list.

    edges: DataFrame[src, dst] (any key type); every node must appear
    as a src at least once (symmetrize beforehand if needed) so there
    are no dangling nodes. Returns DataFrame[node, rank] with rank in
    RANK_SCALE-scaled units.

    ``assume_distinct=True`` skips the dedup shuffle when the caller
    already guarantees unique edges (e.g. a symmetrized union of a
    deduped bipartite list whose halves are disjoint by key parity).

    ``symmetric=True`` asserts every node also has at least one
    IN-edge (true for symmetrized graphs): the update then reads the
    node set off the contribution aggregate itself instead of
    left-joining a separate all-nodes table. A node without in-edges
    would silently vanish under this flag — only set it when the
    graph's construction guarantees symmetry.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    edges = edges.select("src", "dst")
    if not assume_distinct:
        edges = edges.distinct()
    # Fold out-degree onto each edge via a map-side-combined degree
    # aggregate (|V|-sized) joined back, instead of a window count
    # over the src partitioning: the window shuffles AND sorts the
    # full edge list, while the degree table broadcasts below the
    # session threshold (AQE picks the strategy from the REAL degree
    # size at runtime, so a billion-node degree table still plans a
    # shuffle join — guide §2.4/§3.1). NULL-src edges drop in both
    # engines: the oracle's deg CTE is an INNER JOIN on src too.
    # localCheckpoint materializes the result and cuts the lineage
    # feeding the iteration chain.
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ce = _cap_parts(edges.join(deg, "src")).localCheckpoint()

    # Iteration 1 against uniform ranks is a pure aggregation.
    contribs = ce.groupBy("dst").agg(
        F.sum(F.expr(f"cast({RANK_SCALE} as bigint) div out_deg")).alias(
            "contrib_sum"
        )
    )
    if symmetric:
        n_nodes = _node_bound(ce)
        ranks = contribs.select(
            F.col("dst").alias("node"), F.expr(_damp("contrib_sum")).alias("rank")
        )
        for _ in range(iterations - 1):
            contribs = (
                ce.join(_state_hint(ranks, n_nodes), ce["src"] == ranks["node"])
                .select(
                    F.col("dst"),
                    F.expr("rank div out_deg").alias("contrib"),
                )
                .groupBy("dst")
                .agg(F.sum("contrib").alias("contrib_sum"))
            )
            ranks = contribs.select(
                F.col("dst").alias("node"),
                F.expr(_damp("contrib_sum")).alias("rank"),
            )
        return ranks

    nodes = ce.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n_nodes = nodes.count()  # free: nodes was just materialized
    n_dst = _dst_bound(ce, ce.count())  # contribs is dst-keyed
    ranks = nodes.join(
        _state_hint(contribs, n_dst), nodes["node"] == contribs["dst"], "left"
    ).select("node", F.expr(_damp("contrib_sum")).alias("rank"))
    for _ in range(iterations - 1):
        contribs = (
            ce.join(_state_hint(ranks, n_nodes), ce["src"] == ranks["node"])
            .select(F.col("dst"), F.expr("rank div out_deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("contrib_sum"))
        )
        ranks = nodes.join(
            _state_hint(contribs, n_dst), nodes["node"] == contribs["dst"], "left"
        ).select("node", F.expr(_damp("contrib_sum")).alias("rank"))
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    iterations: int = 3,
    assume_distinct: bool = False,
) -> DataFrame:
    """Personalized PageRank: the teleport mass lands ONLY on the
    source set, so ranks measure proximity to the sources instead of
    global centrality (the "related items for THIS seed set" query).

    sources: DataFrame[node] — must be a subset of the graph's nodes.
    Same integer-exact arithmetic as `pagerank_fixed`
    (rank' = (15 * SCALE * is_source + 85 * contrib) div 100); the
    source flag joins onto the node table once by broadcast (seed sets
    are small by definition). Nodes unreachable from the sources decay
    to rank 0 — they are retained in the output, making the result a
    complete proximity vector.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    edges = edges.select("src", "dst")
    if not assume_distinct:
        edges = edges.distinct()
    # degree aggregate + join instead of a window count — same
    # rationale as pagerank_fixed (no full-edge sort; AQE broadcasts
    # the |V|-sized degree table when it fits)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ce = _cap_parts(edges.join(deg, "src")).localCheckpoint()
    nodes = (
        ce.select(F.col("src").alias("node"))
        .distinct()
        .join(
            F.broadcast(
                sources.select(F.col("node"), F.lit(1).alias("is_src"))
            ),
            "node",
            "left",
        )
        .select("node", F.coalesce("is_src", F.lit(0)).alias("is_src"))
        .localCheckpoint()
    )
    n_nodes = nodes.count()  # free: nodes was just materialized
    base = f"15 * cast({RANK_SCALE} as bigint) * is_src"
    update = (
        f"({base} + 85 * coalesce(contrib_sum, cast(0 as bigint))) div 100"
    )
    # iteration 1: ranks start as SCALE * is_src, so only source
    # out-edges contribute
    contribs = (
        ce.join(
            F.broadcast(nodes.filter(F.col("is_src") == 1)),
            ce["src"] == F.col("node"),
        )
        .select(
            F.col("dst"),
            F.expr(f"cast({RANK_SCALE} as bigint) div out_deg").alias(
                "contrib"
            ),
        )
        .groupBy("dst")
        .agg(F.sum("contrib").alias("contrib_sum"))
    )
    n_dst = _dst_bound(ce, ce.count())  # contribs is dst-keyed
    ranks = nodes.join(
        _state_hint(contribs, n_dst), nodes["node"] == contribs["dst"], "left"
    ).select("node", "is_src", F.expr(update).alias("rank"))
    for _ in range(iterations - 1):
        contribs = (
            ce.join(_state_hint(ranks, n_nodes), ce["src"] == ranks["node"])
            .select(F.col("dst"), F.expr("rank div out_deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("contrib_sum"))
        )
        ranks = nodes.join(
            _state_hint(contribs, n_dst), nodes["node"] == contribs["dst"], "left"
        ).select("node", "is_src", F.expr(update).alias("rank"))
    return ranks.select("node", "rank")


def kcore_peel(
    edges: DataFrame, k: int, rounds: int
) -> list[tuple[DataFrame, DataFrame]]:
    """Fixed-round k-core peeling on a SYMMETRIC edge list
    (DataFrame[s, d] containing both directions of every edge).

    Each round removes nodes of degree < k and the edges touching
    them — the standard iterative graph-sparsification primitive
    (community cores, spam/outlier trimming before expensive graph
    algorithms). A fixed round count keeps the unrolled plan
    deterministic and oracle-replayable; convergence shows up as
    round-over-round deltas going to zero (the returned per-round
    stats expose exactly that). Each round is one degree aggregation
    (node-sized output, broadcast back onto the edges twice) over the
    localCheckpointed survivor list — lineage stays flat, the edge
    list shrinks monotonically.

    Returns [(edges_r, degrees_r)] for rounds r = 0..rounds, where
    edges_0 is the (checkpointed) input.
    """
    out = []
    e = _cap_parts(edges.select("s", "d")).localCheckpoint()
    # one up-front decision: survivor sets only shrink, so if the
    # round-0 node set is broadcast-safe every later round's is too
    n_nodes = _node_bound(e, key="s")
    for rnd in range(rounds + 1):
        deg = e.groupBy("s").agg(F.count("*").alias("c"))
        out.append((e, deg))
        if rnd == rounds:
            break  # the next edge set would never be read — skip its
            # (eager) localCheckpoint materialization entirely
        good = deg.filter(F.col("c") >= k).select("s")
        e = (
            e.join(_state_hint(good, n_nodes), "s")
            .join(
                _state_hint(good.select(F.col("s").alias("d")), n_nodes),
                "d",
            )
            .select("s", "d")
            .localCheckpoint()
        )
    return out


def bfs_layers(
    edges: DataFrame, seeds: DataFrame, max_depth: int
) -> DataFrame:
    """Breadth-first min-distance from a seed set, bounded depth:
    returns (node, dist) with dist = length of the shortest path from
    any seed (seeds at 0), for dist <= max_depth. ``edges`` is the
    directed edge list (src, dst) — symmetrize first for undirected
    reach; ``seeds`` one column ``node``.

    Frontier expansion, one join+distinct+anti-join shuffle per level
    — the textbook distributed BFS: the frontier only carries
    newly-discovered nodes, the anti-join against the visited set
    guarantees each node is emitted at its MINIMUM distance exactly
    once (the same semantics as a depth-bounded recursive-CTE UNION
    followed by MIN(dist) — the DuckDB oracle shape).

    Materialization discipline: ``edges`` is localCheckpointed ONCE at
    entry — the per-level frontier join re-reads it every round, and
    without the cut the whole upstream edge build (scan + join +
    distinct at 100 TB) re-executes per level (3x the build's shuffle
    for a depth-3 BFS — measured ~28 MB of a 87 MB total at sf0.1).
    Each level checkpoints only its NEWLY-discovered frontier; the
    visited set is kept as a UNION of the per-level checkpoints
    instead of being re-materialized whole every level, so a node's
    bytes are written once at its discovery depth, not once per
    remaining level. At 100 TB the joins shuffle on node id; visited
    never exceeds the node count and the frontier usually SHRINKS
    after the graph's effective diameter."""
    edges = _cap_parts(edges.select("src", "dst")).localCheckpoint()
    seed_layer = seeds.select("node").distinct().select(
        "node", F.lit(0).cast("long").alias("dist")
    ).localCheckpoint()
    layers = [seed_layer]
    frontier = seed_layer.select("node")
    visited_nodes = frontier
    for depth in range(1, max_depth + 1):
        nxt = (
            edges.join(
                frontier.withColumnRenamed("node", "src"), "src"
            )
            .select(F.col("dst").alias("node"))
            # a NULL dst must be dropped, not emitted: the anti-join
            # below never matches NULL against visited (NULL = NULL
            # is not true), so without this filter a NULL node would
            # re-enter at EVERY level — one row per depth instead of
            # one at its minimum distance
            .filter(F.col("node").isNotNull())
            .distinct()
            .join(visited_nodes, "node", "left_anti")
            .localCheckpoint()
        )
        layers.append(
            nxt.select("node", F.lit(depth).cast("long").alias("dist"))
        )
        visited_nodes = visited_nodes.unionByName(nxt)
        frontier = nxt
    visited = layers[0]
    for layer in layers[1:]:
        visited = visited.unionByName(layer)
    return visited
