"""Zero-row twin of the driver testdata (VERDICT r7 item 3).

Writes every synthetic table as a ZERO-ROW parquet file with the
exact schema (including physical timestamp types) of the source sf
dir, so `tools/check_oracle.py <out_dir>` pins the empty-relation
semantics of all registry queries cross-engine BEFORE any driver or
cluster run does: global aggregates over empty input (COUNT()=0 row
vs no row), windows over empty partitions, quantiles of nothing,
joins with empty sides, streaming censoring with no events.

Usage: python tools/make_empty_testdata.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001 -> /root/repo/testdata_empty
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
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_empty"
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src_path = os.path.join(src, f"{t}.parquet")
        out_path = os.path.join(out, f"{t}.parquet")
        base = pq.read_table(src_path)
        pq.write_table(base.slice(0, 0), out_path)
        print(f"{t}: 0 rows, schema {base.schema.names}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
