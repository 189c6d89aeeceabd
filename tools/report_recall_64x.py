"""ANN recall on the 64x-scaled corpus (round-10 "recall at scale").

The committed recall grids cover the default small-N table and sf1's
20k vectors (`tests/recall_budgets.json` sections). This tool pushes
the same grid another decade: it stages the 64x embeddings table
(128k vectors) with the SAME seeded scaler the heavy bench uses
(tools/bench_heavy.stage_dir — perturbed copies, near-dup families
preserved), measures recall@5 for every config through the same
measure_all the README table and floors come from, and writes
RECALL_64x_r10.json. The staged dir is temporary, so this point is an
ARTIFACT (plus optional budgets section recorded with its sf_dir for
provenance) rather than a per-suite re-measured gate — re-staging
128k vectors per test run would dominate the suite.

Usage: python tools/report_recall_64x.py [--json RECALL_64x_r10.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from bench_heavy import stage_dir
    from report_recall import _config_key, measure_all

    from nbody6_data_pipeline_spark.session import get_spark

    args = list(sys.argv[1:])
    json_out = "RECALL_64x_r10.json"
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]

    spark = get_spark("report_recall_64x")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = stage_dir(spark, 64)
    try:
        records = measure_all(spark, sf_dir, k=5)
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)
    out = {
        "factor": 64,
        "n_vectors": records[0]["n"] if records else None,
        "k": 5,
        "grid": {_config_key(r): r for r in records},
    }
    with open(json_out, "w") as fh:
        json.dump(out, fh, indent=2, sort_keys=True)
    for r in records:
        print(json.dumps(r))
    print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
