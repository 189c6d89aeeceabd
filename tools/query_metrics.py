"""Per-query physical metrics: shuffle bytes, spill, exchange count.

Wall-clock alone can hide a plan regression (a 2x shuffle-byte growth
disappears inside scheduler noise at sf0.1 but is fatal at 100 TB).
This tool runs registry queries and scrapes Spark's SQL status store
for the physical quantities that actually scale: number of exchanges,
total shuffled bytes, spilled bytes, and peak single-exchange size.

    python tools/query_metrics.py [sf_dir] [query ...]

Prints one JSON line per query:
  {"query": ..., "wall_sec": ..., "exchanges": n,
   "shuffle_bytes": n, "spill_bytes": n, "max_exchange_bytes": n,
   "broadcasts": n}

Implementation notes: executionMetrics(id) maps accumulator id ->
formatted string; plan-graph nodes map accumulator id -> (node,
metric) names. Sizes are parsed from Spark's human format ("total
(min, med, max ...)\\n12.1 KiB (...)" or "12.1 KiB"). Metrics for all
executions spawned by one query (broadcast sub-jobs appear as
separate executions in some versions; here sub-jobs share the
execution) are summed.
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")

_SIZE = re.compile(r"([\d.,]+)\s*(B|KiB|MiB|GiB|TiB)")
_MULT = {"B": 1, "KiB": 2**10, "MiB": 2**20, "GiB": 2**30, "TiB": 2**40}


def parse_bytes(text: str) -> int:
    """First size in a formatted metric string -> bytes (the leading
    number is the total in 'total (min, med, max)' renderings)."""
    m = _SIZE.search(text)
    if not m:
        return 0
    return int(float(m.group(1).replace(",", "")) * _MULT[m.group(2)])


def execution_rollup(spark, from_id: int) -> dict:
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    agg = {
        "exchanges": 0,
        "shuffle_bytes": 0,
        "spill_bytes": 0,
        "max_exchange_bytes": 0,
        "broadcasts": 0,
    }
    for i in range(execs.size()):
        ex = execs.apply(i)
        eid = ex.executionId()
        if eid < from_id:
            continue
        names = {}
        git = store.planGraph(eid).allNodes().iterator()
        while git.hasNext():
            node = git.next()
            nname = node.name()
            if nname == "Exchange":
                agg["exchanges"] += 1
            if nname == "BroadcastExchange":
                agg["broadcasts"] += 1
            try:
                mit = node.metrics().iterator()
                while mit.hasNext():
                    m = mit.next()
                    names[m.accumulatorId()] = (nname, m.name())
            except Exception:
                pass
        vit = store.executionMetrics(eid).iterator()
        while vit.hasNext():
            kv = vit.next()
            key = names.get(kv._1())
            if key is None:
                continue
            nname, mname = key
            val = kv._2()
            if nname == "Exchange" and mname == "data size":
                b = parse_bytes(val)
                agg["shuffle_bytes"] += b
                agg["max_exchange_bytes"] = max(
                    agg["max_exchange_bytes"], b
                )
            elif mname == "spill size":
                agg["spill_bytes"] += parse_bytes(val)
    return agg


def main() -> None:
    from nbody6_data_pipeline_spark.queries import registry
    from nbody6_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("query_metrics")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = sys.argv[2:] or list(reg)
    store = spark._jsparkSession.sharedState().statusStore()
    for name in names:
        spark.catalog.clearCache()
        next_id = (
            store.executionsList().apply(store.executionsList().size() - 1).executionId() + 1
            if store.executionsList().size() > 0
            else 0
        )
        t0 = time.perf_counter()
        reg[name]["spark"](spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        rec = {"query": name, "wall_sec": round(wall, 3)}
        rec.update(execution_rollup(spark, next_id))
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
