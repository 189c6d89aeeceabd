"""Run EVERY registry query on a VANILLA SparkSession (no tuned confs).

The external driver builds its own session with default configs; the
engine must therefore set every load-bearing conf at runtime
(`queries.ensure_confs`: nanos-as-long for the events parquet, NTZ
inference, UTC). The tuned session used by tests and the oracle gate
hides a missing runtime conf — this sweep is the cheap guard: each
query runs once, rows-only, on a session built exactly like the
driver's.

Usage: python tools/vanilla_sweep.py [sf_dir]   (default sf0.01)
Exit 1 if any query raises.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    failed = []
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            n = len(fn(spark, sf_dir).collect())
            print(f"OK   {name} ({n} rows, {time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 - report every failure
            failed.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {e}"[:300])
    print(f"\n{len(qs) - len(failed)} ok, {len(failed)} failed")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
