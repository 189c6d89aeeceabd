"""Canonical result hashes for the full query registry — the
engine-vs-engine comparison leg.

Runs every registry query at a given sf_dir and records an
order-insensitive exact hash of each result (same canonicalization as
tools/retry_determinism.py). With ``--ref`` it compares against a
previously recorded run and fails on any hash drift — how the
forced-spill sweep proves sf1 results are bit-identical between an
unconstrained session and a memory-starved one WITHOUT paying the
(hours-long at sf1) DuckDB oracle a second time: the unconstrained
run's hashes are themselves oracle-checked by the concurrent
CORRECTNESS_sf1 sweep, so ref-equality transfers the oracle verdict.

When the session has the UI enabled, a ``_spill`` section records
total memory/disk bytes spilled and the top spilling stages from the
status REST API — the proof the constrained run actually exercised
the spill paths rather than fitting in memory.

Usage:
  python tools/hash_registry.py <sf_dir> --json OUT.json [--ref REF.json] [query ...]
Environment: session shaped via SPARK_GRAFT_MASTER /
SPARK_GRAFT_DRIVER_MEM / SPARK_GRAFT_EXTRA_CONF (see session.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canonical_hash(df) -> tuple[str, int]:
    rows = sorted(repr(tuple(r)) for r in df.collect())
    h = hashlib.md5()
    h.update(repr(df.columns).encode())
    for r in rows:
        h.update(r.encode())
    return h.hexdigest(), len(rows)


def spill_report(spark) -> dict | None:
    sc = spark.sparkContext
    if not sc.uiWebUrl:
        return None
    try:
        url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"
        with urllib.request.urlopen(url, timeout=60) as r:
            stages = json.load(r)
    except Exception:
        return None
    done = [s for s in stages if s["status"] == "COMPLETE"]
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
        "master": sc.master,
        "stages_reported": len(done),
        "stages_spilled": sum(
            1 for s in done if s.get("memoryBytesSpilled", 0) > 0
        ),
        "total_memoryBytesSpilled": sum(
            s.get("memoryBytesSpilled", 0) for s in done
        ),
        "total_diskBytesSpilled": sum(
            s.get("diskBytesSpilled", 0) for s in done
        ),
        "top_spilling_stages": top,
    }


def main() -> int:
    args = list(sys.argv[1:])
    json_out = ref_path = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    if "--ref" in args:
        i = args.index("--ref")
        ref_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    ref = None
    if ref_path:
        with open(ref_path) as fh:
            ref = json.load(fh)

    import __spark_entry__ as entrymod
    from nbody6_data_pipeline_spark.session import get_spark

    spark = get_spark("hash_registry")
    qs = entrymod.queries()
    record: dict = {}
    n_match = n_mismatch = n_err = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            h, n = canonical_hash(qs[name](spark, sf_dir))
        except Exception as e:
            print(f"FAIL {name}: {e}"[:300])
            record[name] = {"err": f"{e}"[:300]}
            n_err += 1
            continue
        rec = {"hash": h, "rows": n, "sec": round(time.time() - t0, 3)}
        if ref is not None:
            rh = ref.get(name, {}).get("hash")
            rec["ref_match"] = (rh == h)
            if rec["ref_match"]:
                n_match += 1
                print(f"MATCH {name} ({n} rows, {rec['sec']}s)")
            else:
                n_mismatch += 1
                print(f"MISMATCH {name}: {h} != ref {rh}")
        else:
            print(f"HASH {name} ({n} rows, {rec['sec']}s)")
        record[name] = rec

    out: dict = dict(record)
    sp = spill_report(spark)
    if sp is not None:
        out["_spill"] = sp
        print(f"spill: {sp['stages_spilled']}/{sp['stages_reported']} stages, "
              f"{sp['total_memoryBytesSpilled']/1e9:.2f} GB mem / "
              f"{sp['total_diskBytesSpilled']/1e9:.2f} GB disk")
    if ref is not None:
        print(f"\n{n_match} match, {n_mismatch} mismatch, {n_err} errors")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if (n_mismatch or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
