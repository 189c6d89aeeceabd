"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from nbody6_data_pipeline_spark.queries import registry
    from nbody6_data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    reg = registry()

    # Warm up the JVM / parquet footer caches with one tiny action so
    # the first timed query doesn't pay session startup.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    import gc

    def run_once(name: str) -> float:
        # isolate queries from each other: drop cached tables a prior
        # query persisted and let the ContextCleaner release orphaned
        # localCheckpoint blocks — leftovers otherwise inflate later
        # queries' timings 3-5x through executor memory pressure
        spark.catalog.clearCache()
        gc.collect()
        fn = reg[name]["spark"]
        t0 = time.perf_counter()
        # collect(), not count(): count() lets Catalyst prune the
        # aggregate columns and under-measures. Result sets are small.
        fn(spark, SF_DIR).collect()
        return time.perf_counter() - t0

    bench_start = time.perf_counter()
    timings: dict[str, float] = {}
    for name in sorted(reg):
        timings[name] = round(run_once(name), 3)
    # second pass, best-of-2 while a time budget lasts: one noisy
    # scheduler hiccup otherwise lands permanently in the record
    for name in sorted(timings, key=timings.get, reverse=True):
        if time.perf_counter() - bench_start > 400:
            break
        timings[name] = round(min(timings[name], run_once(name)), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    out = {
        "metric": f"total wall-clock sec for {len(timings)} queries",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
