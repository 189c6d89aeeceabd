"""NULL-robustness twin of the driver testdata.

Round 4 proved local-green != driver-green: the driver regenerates
parquet each round, and three queries whose FINAL sort keys can be
NULL hash-diverged (Spark sorts ascending NULLS FIRST, DuckDB NULLS
LAST) on data shapes the pristine local tables never produce. This
tool materializes a COPY of an sf dir with deterministic NULL rows
injected into the nullable user-facing columns, so
`tools/check_oracle.py <out_dir>` exercises every oracle pair on
NULL-bearing data BEFORE the driver does.

Injected shapes (deterministic, no RNG):
- documents: rows with NULL doc_id / lang / source / text (singly and
  in combination), plus duplicated NULL-lang rows so NULL group keys
  aggregate over >1 row.
- events: rows with NULL user_id / event_type / value / props.
- lineitem/orders/part/customer/supplier: untouched — TPC-H columns
  are NOT NULL by spec and every query treats them that way.
- embeddings: untouched (vec_id is a join key; a NULL embedding row
  is rejected at ingest by the similarity ops' contract).

Usage: python tools/make_null_testdata.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001 -> /root/repo/testdata_nulls
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _null_docs(schema: pa.Schema) -> pa.Table:
    # Two words repeated to exact char lengths for the src7 rows below
    pack_shifter = ("drift token " * 20).rstrip()          # 239 chars, 40 words
    tie_a = ("alpha tie " * 60)[:600]                       # 600 chars
    tie_b = ("bravo tie " * 60)[:600]                       # 600 chars
    # (doc_id, text, lang, source, n_chars); n_chars mirrors len(text)
    rows = [
        # NULL doc_id: md5(NULL) hash keys, NULL shard buckets
        (None, "null id doc alpha words here", "en", "web", 28),
        (None, "null id doc beta", "de", "web", 16),
        # NULL doc_id rows in a BIG existing source (src7, 25 docs):
        # window-rank NULL position becomes load-bearing where the
        # per-source quota cuts INSIDE the source (mixture sample),
        # where the source spans >1 pack (prefix-sum shift), and where
        # a NULL-id doc TIES a real doc at the top-k boundary. The
        # original twin put NULL ids only in a 4-doc source whose
        # quota kept everything — structurally invisible (round-5
        # review finding).
        (None, pack_shifter, "en", "src7", len(pack_shifter)),
        (None, tie_a, "en", "src7", 600),
        (90_000_007, tie_b, "fr", "src7", 600),
        # NULL lang: the group key of every per-lang rollup
        (90_000_001, "null lang doc one common words", None, "web", 30),
        (90_000_002, "null lang doc two common words", None, "books", 30),
        (90_000_003, "null lang doc three", None, None, 19),
        # NULL source only
        (90_000_004, "null source doc", "en", None, 15),
        # NULL text: regex/tokenize/length paths
        (90_000_005, None, "en", "web", 0),
        (90_000_006, None, None, None, 0),
    ]
    cols = list(zip(*rows))
    return pa.table(
        {f.name: pa.array(cols[i], type=f.type) for i, f in enumerate(schema)},
        schema=schema,
    )


def _null_events(schema: pa.Schema) -> pa.Table:
    import datetime as dt

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        (80_000_001, t0, None, "click", 1.5, '{"k": 1}'),
        (80_000_002, t0, 77, None, 2.5, '{"k": 2}'),
        (80_000_003, t0, 77, "view", None, '{"k": 3}'),
        (80_000_004, t0, 78, "click", 3.5, None),
        (80_000_005, t0, None, None, None, None),
    ]
    cols = list(zip(*rows))
    return pa.table(
        {f.name: pa.array(cols[i], type=f.type) for i, f in enumerate(schema)},
        schema=schema,
    )


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_nulls"
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src_path = os.path.join(src, f"{t}.parquet")
        out_path = os.path.join(out, f"{t}.parquet")
        if t == "documents":
            base = pq.read_table(src_path)
            extra = _null_docs(base.schema)
            pq.write_table(pa.concat_tables([base, extra]), out_path)
        elif t == "events":
            base = pq.read_table(src_path)
            extra = _null_events(base.schema)
            # preserve the source's physical timestamp type (NANOS)
            pq.write_table(
                pa.concat_tables([base, extra.cast(base.schema)]), out_path
            )
        else:
            shutil.copyfile(src_path, out_path)
        print(f"{t}: {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
