"""Independent equivalence checks for the four sf1 rows-only queries
(round-10 gate).

At sf1 the DuckDB oracle for four queries exceeds the 600 s / disk
budget (CORRECTNESS_sf1_r09.json), leaving them verified by row count
alone — the weakest evidence for exactly the architecture-dominated
queries whose sf1 behavior matters most. This tool closes that gap
with INDEPENDENT verification that never runs the infeasible oracle:

- ``minhash_lsh_verified``: the candidate PAIRS are already hash-green
  vs DuckDB at sf1 (``minhash_lsh_pairs``); what is unverified is the
  exact-Jaccard stage. Recomputed here in pure Python (re/str/set —
  no Spark, no DuckDB) from the raw parquet texts: normalize,
  12-gram shingle sets, |a∩b|/|a∪b|. Exact float equality required
  (both sides divide the same two ints in IEEE double).
- ``doc_neardup_keep_best``: pairs green (above) + Python Jaccard
  (above) -> pure-Python union-find (path compression — a different
  algorithm family from the engine's min-label propagation) ->
  keep-best by (tlen DESC, doc_id ASC). Exact row-set equality.
- ``embedding_neardup_components``: the pair graph is hash-green vs
  DuckDB at sf1 (``embedding_cosine_neardup``); components recomputed
  two independent ways: (a) pure-Python union-find over the collected
  125k edges, (b) IN-ENGINE dual algorithm — the distributed
  min-label-propagation path forced via ``small_graph_edges=0``
  (the sf1 graph normally takes the driver union-find path, so this
  pits the two engine implementations against each other on the same
  input). Exact equality of (vec_id, comp) sets for all three.
- ``graph_kcore_peel``: recomputed END-TO-END in pure Python/pandas
  from lineitem.parquet (pyarrow read, Counter-based basket
  co-occurrence, dict-based peeling) — zero Spark involvement — and
  compared row-for-row against the engine output. This is the query
  whose DuckDB CTE spills >79 GB; the Python replay is O(edges) per
  round and finishes in seconds.

Writes CROSSCHECK_sf1_r10.json. Every check is exact (no tolerances).

Usage: python tools/crosscheck_sf1.py [sf1_dir] [--json OUT]
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHINGLE_LEN = 12
NEARDUP_T = 0.8
KCORE_K = 2
KCORE_ROUNDS = 2
TRI_MIN_COOC = 2

_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s (ASCII), not Python's
_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LO = "abcdefghijklmnopqrstuvwxyz"
_FOLD = str.maketrans(_UP, _LO)


def normalize(text: str) -> str:
    """Pure-Python replica of operators.dedup.normalize semantics:
    collapse ASCII whitespace, trim spaces, ASCII-only case fold."""
    return _WS.sub(" ", text).strip(" ").translate(_FOLD)


def shingle_set(norm: str) -> frozenset:
    n = max(len(norm) - (SHINGLE_LEN - 1), 1)
    return frozenset(norm[i : i + SHINGLE_LEN] for i in range(n))


class UnionFind:
    """Path-compressing union-find — a different algorithm family from
    the engine's min-label propagation AND from its driver-side
    union-find (independent code, union-by-min-root so the root is
    always the minimum member = the component label)."""

    def __init__(self):
        self.p: dict = {}

    def find(self, x):
        p = self.p
        if x not in p:
            p[x] = x
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.p[hi] = lo

    def components(self) -> dict:
        return {x: self.find(x) for x in list(self.p)}


def _docs_text(sf_dir: str) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = t.column("doc_id").to_pylist()
    txt = t.column("text").to_pylist()
    return dict(zip(ids, txt))


def check_minhash_verified(spark, qs, sf_dir: str) -> dict:
    rows = qs["minhash_lsh_verified"](spark, sf_dir).collect()
    pairs_green = {
        (r["doc_a"], r["doc_b"])
        for r in qs["minhash_lsh_pairs"](spark, sf_dir).collect()
    }
    texts = _docs_text(sf_dir)
    shing: dict = {}
    mism = 0
    pair_set = set()
    for r in rows:
        a, b = r["doc_a"], r["doc_b"]
        pair_set.add((a, b))
        for d in (a, b):
            if d not in shing:
                t = texts.get(d)
                shing[d] = shingle_set(normalize(t)) if t is not None else frozenset()
        sa, sb = shing[a], shing[b]
        uni = len(sa | sb)
        py_j = (len(sa & sb) / uni) if uni else None
        if py_j != r["jaccard"]:
            mism += 1
    return {
        "n_pairs": len(rows),
        "pairs_equal_green_pair_query": pair_set == pairs_green,
        "jaccard_mismatches": mism,
        "match": pair_set == pairs_green and mism == 0,
        "method": "pure-Python shingle-set Jaccard on raw parquet texts; "
                  "pair set vs sf1-hash-green minhash_lsh_pairs",
        "_shing": shing,  # reused by keep-best; stripped before JSON
        "_pairs_rows": [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in rows],
    }


def check_keep_best(spark, qs, sf_dir: str, mv: dict) -> dict:
    spark_rows = {
        (r["comp"], r["kept_doc_id"], r["n_members"], r["n_dropped"])
        for r in qs["doc_neardup_keep_best"](spark, sf_dir).collect()
    }
    texts = _docs_text(sf_dir)
    uf = UnionFind()
    for a, b, j in mv["_pairs_rows"]:
        if j is not None and j >= NEARDUP_T:
            uf.union(a, b)
    comp_members = defaultdict(list)
    for node, root in uf.components().items():
        comp_members[root].append(node)
    py_rows = set()
    for comp, members in comp_members.items():
        kept = min(members, key=lambda d: (-len(texts[d]), d))
        py_rows.add((comp, kept, len(members), len(members) - 1))
    return {
        "n_clusters_spark": len(spark_rows),
        "n_clusters_python": len(py_rows),
        "match": spark_rows == py_rows,
        "method": "pure-Python union-find over Python-verified >=0.8 "
                  "pairs; keep-best by (char-length DESC, doc_id ASC)",
    }


def check_embedding_components(spark, qs, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from nbody6_data_pipeline_spark.operators.dedup import connected_components
    from nbody6_data_pipeline_spark.queries_dedup import _banded_neardup_pairs

    spark_rows = {
        (r["vec_id"], r["comp"])
        for r in qs["embedding_neardup_components"](spark, sf_dir).collect()
    }
    edges = [
        (r["vec_a"], r["vec_b"])
        for r in qs["embedding_cosine_neardup"](spark, sf_dir).collect()
    ]
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    py_rows = set(uf.components().items())

    # In-engine dual algorithm: force the distributed min-label
    # propagation path (the sf1 graph is under the 250k-edge
    # threshold, so the query normally used the driver union-find).
    pairs = (
        _banded_neardup_pairs(spark, sf_dir)
        .filter(F.col("cos_sim") >= 0.35)
        .select("vec_a", "vec_b")
    )
    prop = connected_components(pairs, small_graph_edges=0)
    prop_rows = {
        (r["node"], r["comp"]) for r in prop.collect()
    }
    return {
        "n_nodes": len(spark_rows),
        "n_edges": len(edges),
        "python_match": spark_rows == py_rows,
        "propagation_match": spark_rows == prop_rows,
        "match": spark_rows == py_rows and spark_rows == prop_rows,
        "method": "pure-Python union-find over sf1-hash-green pair "
                  "graph + in-engine dual (forced min-label propagation "
                  "vs the driver union-find path)",
    }


def check_kcore(spark, qs, sf_dir: str) -> dict:
    import pyarrow.parquet as pq

    spark_rows = {
        (r["round"], r["n_nodes"], r["n_directed_edges"])
        for r in qs["graph_kcore_peel"](spark, sf_dir).collect()
    }
    t = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )
    ok = t.column("l_orderkey").to_pylist()
    pk = t.column("l_partkey").to_pylist()
    baskets = defaultdict(set)
    for o, p in zip(ok, pk):
        baskets[o].add(p)
    cooc: Counter = Counter()
    for parts in baskets.values():
        if len(parts) < 2:
            continue
        sp = sorted(parts)
        for i, a in enumerate(sp):
            for b in sp[i + 1 :]:
                cooc[(a, b)] += 1
    edges = [e for e, n in cooc.items() if n >= TRI_MIN_COOC]
    # symmetric directed edge list, then peel
    directed = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    py_rows = set()
    for rnd in range(KCORE_ROUNDS + 1):
        deg: Counter = Counter(s for s, _ in directed)
        py_rows.add((rnd, len(deg), len(directed)))
        if rnd == KCORE_ROUNDS:
            break
        keep = {n for n, c in deg.items() if c >= KCORE_K}
        directed = [(s, d) for s, d in directed if s in keep and d in keep]
    return {
        "rows_spark": sorted(spark_rows),
        "rows_python": sorted(py_rows),
        "n_undirected_edges_round0": len(edges),
        "match": spark_rows == py_rows,
        "method": "END-TO-END pure Python/pyarrow replay from "
                  "lineitem.parquet (basket co-occurrence Counter + "
                  "dict peeling) — no Spark, no DuckDB",
    }


def main() -> int:
    args = list(sys.argv[1:])
    json_out = "CROSSCHECK_sf1_r10.json"
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/repo/testdata_sf1"

    import __spark_entry__ as entrymod
    from nbody6_data_pipeline_spark.session import get_spark

    spark = get_spark("crosscheck_sf1")
    qs = entrymod.queries()

    out: dict = {"sf_dir": sf_dir}
    mv = check_minhash_verified(spark, qs, sf_dir)
    out["minhash_lsh_verified"] = {
        k: v for k, v in mv.items() if not k.startswith("_")
    }
    print(f"minhash_lsh_verified: match={mv['match']} "
          f"({mv['n_pairs']} pairs, {mv['jaccard_mismatches']} jaccard mismatches)")
    kb = check_keep_best(spark, qs, sf_dir, mv)
    out["doc_neardup_keep_best"] = kb
    print(f"doc_neardup_keep_best: match={kb['match']} "
          f"({kb['n_clusters_spark']} clusters)")
    ec = check_embedding_components(spark, qs, sf_dir)
    out["embedding_neardup_components"] = ec
    print(f"embedding_neardup_components: match={ec['match']} "
          f"(python={ec['python_match']}, propagation={ec['propagation_match']})")
    kc = check_kcore(spark, qs, sf_dir)
    out["graph_kcore_peel"] = kc
    print(f"graph_kcore_peel: match={kc['match']} rows={kc['rows_spark']}")

    ok = all(out[k]["match"] for k in (
        "minhash_lsh_verified", "doc_neardup_keep_best",
        "embedding_neardup_components", "graph_kcore_peel"))
    out["all_match"] = ok
    with open(json_out, "w") as fh:
        json.dump(out, fh, indent=2, sort_keys=True)
    print(f"\nall_match={ok}; wrote {json_out}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
