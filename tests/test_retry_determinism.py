"""Retry-determinism gate (round-10): task retries must not change
any query's output.

Runs tools/retry_determinism.py in a SUBPROCESS because task retries
need ``spark.task.maxFailures > 1``, which local mode only grants via
the master string ``local[N,F]`` — a per-SparkContext setting the
shared session fixture cannot flip. The harness injects a
first-attempt task failure into every even scan partition of each
target query (pass-through mapInPandas raising on
``TaskContext.attemptNumber() == 0``), lets Spark retry, and asserts
the canonical result hash is identical to the unfaulted run of the
SAME plan. Marker files prove each fault actually fired (a vacuous
pass is a fail).

Coverage: the ~20 heaviest batch registry queries plus the
determinism-critical content-hash paths (doc_priority_sample,
salted_join_revenue) — see DEFAULT_QUERIES in the tool.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata not present"
)
def test_retry_determinism_heavy_registry(tmp_path):
    out = tmp_path / "retry.json"
    env = dict(os.environ)
    env["SPARK_GRAFT_MASTER"] = "local[8,2]"
    env["SPARK_GRAFT_CPUS"] = "8"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "retry_determinism.py"),
         SF_DIR, "--json", str(out)],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3000,
    )
    assert proc.returncode == 0, (
        f"harness failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}"
    )
    rec = json.loads(out.read_text())
    assert rec["summary"]["failed"] == 0
    assert rec["summary"]["passed"] >= 20
    for name, r in rec["queries"].items():
        assert r.get("match"), f"{name}: retry changed the output hash"
        assert r.get("injected_failures", 0) > 0, f"{name}: no fault fired"
