"""Run-multiplier scale bench for the NBODY6 pipeline leg.

The reference workload is hundreds of runs x 18 observer coordinates
(collect_simulation_stats.py:213-250); bench.py's pipeline leg times a
fixed 10 runs. This tool drives process_all_batched at 1x/4x/16x the
run count (seeded synthetic fixture runs) and reports the wall curve +
driver job count — the scale claim to check is that the batched
orchestrator's JOB COUNT stays flat (plan-shape-bound, not run-bound)
while wall grows sub-linearly in runs (more runs = more rows through
the same fixed number of shuffles, amortizing scheduling overhead).

    python tools/bench_pipeline_scale.py [multipliers...]   # default 1 4 16

Prints one JSON line per multiplier:
  {"mult": m, "runs": n, "wall_sec": s, "jobs": j, "coords": c}
and a final summary line with the wall ratios.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

BASE_RUNS = 10
COORDS = [(50.0, 0.0, 0.0), (120.0, 30.0, -10.0), (200.0, -45.0, 5.0)]


def bench_multiplier(spark, mult: int) -> dict:
    from nbody6_data_pipeline_spark.pipeline import process_all_batched
    from tests.nbody6_fixtures import write_run

    n_runs = BASE_RUNS * mult
    base = tempfile.mkdtemp(prefix=f"nbody6_scale_{mult}x_sim_")
    out = tempfile.mkdtemp(prefix=f"nbody6_scale_{mult}x_out_")
    sc = spark.sparkContext
    try:
        for i in range(1, n_runs + 1):
            write_run(
                os.path.join(base, "Rad04", "zmet0014", "M6", f"{i:04d}")
            )
        spark.catalog.clearCache()
        group = f"pipeline-scale-{mult}x"
        sc.setJobGroup(group, f"pipeline scale bench {mult}x")
        t0 = time.perf_counter()
        process_all_batched(spark, base, out, coordinates=COORDS)
        wall = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        return {
            "mult": mult,
            "runs": n_runs,
            "coords": len(COORDS),
            "wall_sec": round(wall, 3),
            "jobs": jobs,
        }
    finally:
        sc.setJobGroup("", "")
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    from nbody6_data_pipeline_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("bench_pipeline_scale")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM so the 1x leg doesn't absorb session startup
    spark.range(1000).count()

    records = []
    for m in mults:
        rec = bench_multiplier(spark, m)
        records.append(rec)
        print(json.dumps(rec), flush=True)
    base = records[0]
    print(
        json.dumps(
            {
                "summary": {
                    f"{r['mult']}x": {
                        "wall_ratio": round(
                            r["wall_sec"] / base["wall_sec"], 2
                        ),
                        "jobs_ratio": round(r["jobs"] / base["jobs"], 2),
                    }
                    for r in records
                }
            }
        )
    )


if __name__ == "__main__":
    main()
