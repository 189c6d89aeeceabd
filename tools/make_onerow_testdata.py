"""Single-row twin of the driver testdata.

Writes every table with exactly ONE row (embeddings keeps 16 — the
k-means/PQ seed contract needs vec_ids 0..15), schemas byte-identical
to the source. This pins DEGENERATE-denominator semantics the
zero-row twin cannot reach: one-row groups make every variance,
covariance and range term exactly 0, and one-sided splits zero one
side of every ratio — ANSI Spark throws DIVIDE_BY_ZERO there while
DuckDB yields NULL, so every at-risk division needs an identical NULL
guard in both engines. Round 8 caught 5 such crashes on first contact
(OLS/corr variance, KS one-sided split, attribution zero total,
LM empty model).

Usage: python tools/make_onerow_testdata.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001 -> /root/repo/testdata_onerow
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_onerow"
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        base = pq.read_table(os.path.join(src, f"{t}.parquet"))
        n = 16 if t == "embeddings" else 1
        pq.write_table(base.slice(0, n), os.path.join(out, f"{t}.parquet"))
        print(f"{t}: {min(n, base.num_rows)} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
