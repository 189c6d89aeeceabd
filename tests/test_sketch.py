"""Tests for operators/sketch.py (HLL, Misra-Gries) and
operators/graph.py (integer PageRank)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.graph import RANK_SCALE, pagerank_fixed
from nbody6_data_pipeline_spark.queries import registry
from nbody6_data_pipeline_spark.operators.sketch import (
    HLL_M,
    heavy_hitter_candidates,
    heavy_hitters,
    hll_estimate_from_registers,
    hll_register_stats,
    hll_registers,
)

# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_estimate_accuracy(spark):
    """Estimate from the deterministic registers lands within the
    expected error band (1.04/sqrt(512) ~ 4.6% std error; assert 4
    sigma) of the exact cardinality, across decade scales."""
    for n in (300, 5_000, 40_000):
        df = spark.range(n).select(F.col("id").alias("k"))
        regs = [
            r["reg"]
            for r in hll_registers(df, F.col("k"), []).collect()
        ]
        est = hll_estimate_from_registers(regs)
        assert abs(est - n) / n < 0.20, (n, est)


def test_hll_registers_merge(spark):
    """Register-wise max of two disjoint shards' sketches equals the
    sketch of the union — the mergeability contract that makes HLL
    shardable across files/days/streams."""
    a = spark.range(0, 3_000).select(F.col("id").alias("k"))
    b = spark.range(2_000, 6_000).select(F.col("id").alias("k"))
    whole = a.unionByName(b)
    ra = hll_registers(a, F.col("k"), []).withColumnRenamed("reg", "ra")
    rb = hll_registers(b, F.col("k"), []).withColumnRenamed("reg", "rb")
    merged = (
        ra.join(rb, "bucket", "full")
        .select(
            "bucket",
            F.greatest(
                F.coalesce("ra", F.lit(0)), F.coalesce("rb", F.lit(0))
            ).alias("reg"),
        )
    )
    expect = {
        (r["bucket"], r["reg"])
        for r in hll_registers(whole, F.col("k"), []).collect()
    }
    got = {(r["bucket"], r["reg"]) for r in merged.collect()}
    assert got == expect


def test_hll_stats_partition_invariant(spark, sf_dir):
    """Register stats identical under arbitrary repartitioning (max is
    order-independent)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    s1 = {
        tuple(r)
        for r in hll_register_stats(
            e, F.col("user_id"), ["event_type"]
        ).collect()
    }
    s2 = {
        tuple(r)
        for r in hll_register_stats(
            e.repartition(17), F.col("user_id"), ["event_type"]
        ).collect()
    }
    assert s1 == s2
    for row in s1:
        # used + zero == m
        assert row[1] + row[2] == HLL_M


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def _skewed_tokens(spark, n_heavy=5, heavy_count=2_000, tail=20_000):
    """5 tokens at ~9% each + a long tail of singletons."""
    heavy = spark.range(n_heavy * heavy_count).select(
        F.concat(F.lit("hot"), (F.col("id") % n_heavy).cast("string")).alias(
            "token"
        )
    )
    cold = spark.range(tail).select(
        F.concat(F.lit("cold"), F.col("id").cast("string")).alias("token")
    )
    return heavy.unionByName(cold).repartition(13)


def test_mg_candidates_superset(spark):
    """Every true heavy hitter (freq > N/inv) survives candidate
    generation regardless of partitioning — the MG guarantee."""
    toks = _skewed_tokens(spark)
    cands = {
        r["token"] for r in heavy_hitter_candidates(toks, 40).collect()
    }
    assert {f"hot{i}" for i in range(5)} <= cands


def test_heavy_hitters_exact(spark):
    """Two-pass MG + recount output equals the exact full groupBy
    answer, for several partitionings."""
    toks = _skewed_tokens(spark)
    n = toks.count()
    inv = 20  # threshold 5% -> exactly the 5 hot tokens (~9% each)
    exact = {
        (r["token"], r["count"])
        for r in toks.groupBy("token")
        .count()
        .filter(F.col("count") * inv > n)
        .collect()
    }
    for parts in (1, 7, 32):
        got = {
            (r["token"], r["cnt"])
            for r in heavy_hitters(toks.repartition(parts), inv).collect()
        }
        assert got == exact, parts
    assert len(exact) == 5


def test_heavy_hitters_capacity_guard(spark):
    toks = _skewed_tokens(spark, tail=100)
    with pytest.raises(ValueError):
        heavy_hitters(toks, 50, capacity=10)


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _pure_python_pagerank(edges, iterations=3):
    """Independent integer reference implementation."""
    from collections import defaultdict

    edges = sorted(set(edges))
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    nodes = sorted(outdeg)
    rank = {v: RANK_SCALE for v in nodes}
    for _ in range(iterations):
        contrib = defaultdict(int)
        for s, d in edges:
            contrib[d] += rank[s] // outdeg[s]
        rank = {
            v: (15 * RANK_SCALE + 85 * contrib.get(v, 0)) // 100
            for v in nodes
        }
    return rank


def test_pagerank_matches_reference_impl(spark):
    """Spark plan equals an independent pure-python integer PageRank
    bit-for-bit on a small random-ish graph (deterministic edges)."""
    raw = [(f"n{(7 * i) % 23}", f"n{(11 * i + 3) % 23}") for i in range(60)]
    sym = raw + [(d, s) for s, d in raw]
    sym = [(s, d) for s, d in sym if s != d]
    df = spark.createDataFrame(sym, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank_fixed(df, 3).collect()}
    want = _pure_python_pagerank(sym, 3)
    assert got == want
    # the symmetric fast path must agree with the generic path on a
    # symmetrized graph
    got_sym = {
        r["node"]: r["rank"]
        for r in pagerank_fixed(df, 3, symmetric=True).collect()
    }
    assert got_sym == want


def test_pagerank_star_center_dominates(spark):
    """Hub of a star graph accumulates the most rank."""
    leaves = [f"l{i}" for i in range(20)]
    edges = [("hub", leaf) for leaf in leaves] + [
        (leaf, "hub") for leaf in leaves
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    ranks = {r["node"]: r["rank"] for r in pagerank_fixed(df, 3).collect()}
    assert max(ranks, key=ranks.get) == "hub"
    # leaves are symmetric -> identical ranks
    assert len({ranks[leaf] for leaf in leaves}) == 1


def test_triangle_wedge_join_logic(spark, tmp_path):
    """Hand-built baskets: parts {1,2,3} co-occur in >=2 orders (one
    triangle), part 4 attaches to only one edge pair."""
    rows = []
    for order in (1, 2, 3):  # three orders with the full triple
        for part in (1, 2, 3):
            rows.append((order, part))
    for order in (10, 11):  # 1-4 edge, no closing edges
        rows.append((order, 1))
        rows.append((order, 4))
    df = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    df.write.parquet(str(tmp_path / "lineitem.parquet"))
    out = registry()["part_triangle_count"]["spark"](
        spark, str(tmp_path)
    ).collect()[0]
    # edges: (1,2),(1,3),(2,3) each in 3 orders; (1,4) in 2 orders
    assert out["n_edges"] == 4
    assert out["n_triangles"] == 1


def test_personalized_pagerank_proximity(spark):
    """PPR from a seed concentrates rank near the seed: on a path
    graph a-b-c-d-e (symmetrized), seeding at 'a' ranks b above d;
    global pagerank would rank the middle highest. An independent
    pure-python integer implementation must agree bit-for-bit."""
    from collections import defaultdict

    from nbody6_data_pipeline_spark.operators.graph import (
        personalized_pagerank,
    )

    chain = ["a", "b", "c", "d", "e"]
    edges = []
    for u, v in zip(chain, chain[1:]):
        edges += [(u, v), (v, u)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, seeds, 3).collect()
    }

    # independent reference
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    rank = {v: RANK_SCALE * (1 if v == "a" else 0) for v in chain}
    for _ in range(3):
        contrib = defaultdict(int)
        for s, d in edges:
            contrib[d] += rank[s] // outdeg[s]
        rank = {
            v: (
                15 * RANK_SCALE * (1 if v == "a" else 0)
                + 85 * contrib.get(v, 0)
            )
            // 100
            for v in chain
        }
    assert got == rank
    assert got["b"] > got["d"]
    assert got["a"] > got["e"]


def test_graph_shuffle_path_bit_exact(spark, monkeypatch):
    """Forcing the node-state join onto the SHUFFLE path (threshold 0
    -> _state_hint never broadcasts) produces bit-identical ranks and
    k-core rounds: the size dispatch chooses a physical strategy, not
    a result. This is the path a billion-node graph takes at 100x
    scale, where force-broadcasting node state would OOM executors."""
    from nbody6_data_pipeline_spark.operators import graph as G

    raw = [(f"n{(7 * i) % 23}", f"n{(11 * i + 3) % 23}") for i in range(60)]
    sym = [(s, d) for s, d in raw + [(d, s) for s, d in raw] if s != d]
    df = spark.createDataFrame(sym, ["src", "dst"])
    want = {r["node"]: r["rank"] for r in G.pagerank_fixed(df, 3).collect()}
    want_sym = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixed(df, 3, symmetric=True).collect()
    }
    edf = spark.createDataFrame(sym, ["s", "d"])
    want_core = [
        sorted(tuple(r) for r in e.collect())
        for e, _ in G.kcore_peel(edf, k=4, rounds=2)
    ]

    monkeypatch.setattr(G, "BROADCAST_MAX_NODES", 0)
    got = {r["node"]: r["rank"] for r in G.pagerank_fixed(df, 3).collect()}
    got_sym = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixed(df, 3, symmetric=True).collect()
    }
    got_core = [
        sorted(tuple(r) for r in e.collect())
        for e, _ in G.kcore_peel(edf, k=4, rounds=2)
    ]
    assert got == want
    assert got_sym == want_sym
    assert got_core == want_core


def test_heavy_hitters_empty_input(spark):
    """Zero input rows -> empty result, not TypeError from a NULL
    total (ADVICE round 4)."""
    from nbody6_data_pipeline_spark.operators.sketch import heavy_hitters

    empty = spark.createDataFrame([], "token string")
    assert heavy_hitters(empty, inv_threshold=10).count() == 0


def test_bfs_layers_min_distance_on_hand_graph(spark):
    """Path graph 1-2-3-4-5 plus a shortcut 1-4: BFS from {1} must
    assign each node its MINIMUM distance (4 via the shortcut, not the
    path), include the seed at 0, and censor nodes past max_depth."""
    from nbody6_data_pipeline_spark.operators.graph import bfs_layers

    fwd = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (8, 9)]
    edges = spark.createDataFrame(
        fwd + [(b, a) for a, b in fwd], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_layers(edges, seeds, max_depth=2).collect()
    }
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    # depth 1: node 3 and 5 censored; disconnected 8/9 never appear
    got1 = {
        r["node"]: r["dist"]
        for r in bfs_layers(edges, seeds, max_depth=1).collect()
    }
    assert got1 == {1: 0, 2: 1, 4: 1}
