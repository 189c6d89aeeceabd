"""Forced-spill correctness sweep (round-10 gate).

Every prior correctness artifact records "0 spills" — the 128 GiB
sandbox never pressures the unified memory manager, which is
unrepresentative of real executors (a 100 TB cluster schedules
~4-8 GiB of execution memory per task slot and the heavies WILL
spill). This sweep re-runs the full oracle gate in a deliberately
memory-starved session so sort/aggregate/join operators actually take
their spill paths, then asserts the results are still hash-identical
to the DuckDB oracle and RECORDS the spill volumes as proof the
constrained code paths ran.

Constraint set (≈ a 4 GiB executor with 8 task slots):
  - master local[8]            (8 slots sharing one small heap)
  - spark.driver.memory=4g     (the ONLY heap in local mode)
  - spark.memory.fraction=0.2  (~0.7 GiB unified memory => per-task
                                execution memory ~90 MiB, far below
                                the working set of the heavy
                                aggregations at sf0.1)
  - spark.sql.shuffle.partitions=8 (bigger per-partition working sets
                                — the spill trigger, matching the
                                "partition no longer fits" failure
                                mode of a 100x scale-up)
  - spark.ui.enabled=true + large retained-stage caps so the status
    REST API can report memory/diskBytesSpilled for EVERY stage of
    the sweep.

Usage:
  python tools/spill_sweep.py [sf_dir] [--json CORRECTNESS_spill.json] [query ...]

The artifact is check_oracle's per-query record plus a ``_spill``
section: total/max bytes spilled and the top spilling stages.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

os.environ["SPARK_GRAFT_MASTER"] = os.environ.get(
    "SPILL_MASTER", "local[8]"
)
os.environ["SPARK_GRAFT_CPUS"] = "8"
os.environ["SPARK_GRAFT_DRIVER_MEM"] = os.environ.get("SPILL_DRIVER_MEM", "4g")
os.environ["SPARK_GRAFT_EXTRA_CONF"] = (
    "spark.memory.fraction=0.2;"
    "spark.sql.shuffle.partitions=8;"
    "spark.ui.enabled=true;"
    "spark.ui.retainedStages=100000;"
    "spark.ui.retainedJobs=100000"
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spill_report() -> dict:
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    sc = spark.sparkContext
    app = sc.applicationId
    url = f"{sc.uiWebUrl}/api/v1/applications/{app}/stages"
    with urllib.request.urlopen(url, timeout=60) as r:
        stages = json.load(r)
    done = [s for s in stages if s["status"] == "COMPLETE"]
    mem = sum(s.get("memoryBytesSpilled", 0) for s in done)
    disk = sum(s.get("diskBytesSpilled", 0) for s in done)
    top = sorted(
        (
            {
                "stageId": s["stageId"],
                "name": s["name"].split("\n")[0][:120],
                "memoryBytesSpilled": s.get("memoryBytesSpilled", 0),
                "diskBytesSpilled": s.get("diskBytesSpilled", 0),
            }
            for s in done
            if s.get("memoryBytesSpilled", 0) > 0
        ),
        key=lambda d: -d["memoryBytesSpilled"],
    )[:15]
    return {
        "constraint": {
            "master": sc.master,
            "driver_memory": os.environ["SPARK_GRAFT_DRIVER_MEM"],
            "extra_conf": os.environ["SPARK_GRAFT_EXTRA_CONF"],
        },
        "stages_reported": len(done),
        "stages_spilled": sum(
            1 for s in done if s.get("memoryBytesSpilled", 0) > 0
        ),
        "total_memoryBytesSpilled": mem,
        "total_diskBytesSpilled": disk,
        "top_spilling_stages": top,
    }


def main() -> int:
    import check_oracle

    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        json_out = argv[argv.index("--json") + 1]
    sys.argv = ["check_oracle.py"] + argv
    rc = check_oracle.main()
    report = _spill_report()
    print(
        f"\nspill: {report['stages_spilled']}/{report['stages_reported']} "
        f"stages spilled, "
        f"{report['total_memoryBytesSpilled'] / 1e9:.2f} GB memory / "
        f"{report['total_diskBytesSpilled'] / 1e9:.2f} GB disk"
    )
    if json_out and os.path.exists(json_out):
        with open(json_out) as fh:
            rec = json.load(fh)
        rec["_spill"] = report
        with open(json_out, "w") as fh:
            json.dump(rec, fh, indent=1, sort_keys=True)
        print(f"updated {json_out} with _spill section")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
