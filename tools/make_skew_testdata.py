"""Skew-adversarial twin of the driver testdata (the sixth twin).

Every prior adversarial sweep (empty / one-row / NULL-heavy /
unicode) attacked VALUE edge cases; this one attacks the
DISTRIBUTION: one hot key holding ~90% of the rows in every fact
table, plus one near-duplicate mega-cluster so a single LSH band
bucket / k-means cell holds most candidate pairs. This is the shape
a 100-TB production table actually has (one whale customer, one bot
user, one boilerplate template), and it is the shape that breaks
naive hash-partitioned joins, single-reducer windows, and
all-pairs-within-bucket verify stages.

Built on the same measured-off-the-driver generator as the sf1 twin
(tools/make_sf1_testdata.py) at sf0.01 (60k lineitem rows), then
skewed in place:

- orders.o_custkey: 90% -> customer 7 (hot join/groupBy key);
- lineitem.l_orderkey / l_suppkey / l_partkey: 90% -> one key each
  (hot fact-to-fact and fact-to-dim joins, giant collect groups);
- events.user_id: 90% -> user 1 (hot sessionization / window
  partition);
- documents: 30% of docs are near-copies of doc 0 (one MinHash band
  bucket holds ~11k candidate pairs at this scale);
- embeddings: 40% of vectors packed in a tight ball around one
  vector (one hot LSH bucket / k-means cell).

Correctness contract: identical parquet feeds Spark and the DuckDB
oracle, so the sweep (`python tools/check_oracle.py
/root/repo/testdata_skew --json CORRECTNESS_skew_r09.json`) proves
every query's SEMANTICS survive the hot key — tie handling in ranks,
per-key windows, bucket caps — while the plan-budget gate
(`SPARK_GRAFT_SF_DIR=testdata_skew pytest tests/test_plan_budgets.py`)
proves the PLANS do.

Usage: python tools/make_skew_testdata.py [out_dir]
Default out: /root/repo/testdata_skew (gitignored; deterministic).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_sf1_testdata import gen_tables  # noqa: E402

HOT_FRACTION = 0.9


def _skew_column(tbl: pa.Table, col: str, hot_value, rng) -> pa.Table:
    """Point HOT_FRACTION of rows' ``col`` at ``hot_value``."""
    arr = tbl.column(col).to_numpy(zero_copy_only=False).copy()
    mask = rng.random(len(arr)) < HOT_FRACTION
    arr[mask] = hot_value
    field = tbl.schema.field(col)
    return tbl.set_column(
        tbl.schema.get_field_index(col), field,
        pa.array(arr, type=field.type),
    )


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_skew"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    tables = gen_tables(0.01, rng)

    tables["orders"] = _skew_column(tables["orders"], "o_custkey", 7, rng)
    li = tables["lineitem"]
    li = _skew_column(li, "l_orderkey", 5, rng)
    li = _skew_column(li, "l_suppkey", 3, rng)
    li = _skew_column(li, "l_partkey", 11, rng)
    tables["lineitem"] = li
    tables["events"] = _skew_column(tables["events"], "user_id", 1, rng)

    # one near-duplicate mega-cluster: 30% of docs are doc 0 with the
    # final 1-2 words swapped — they all land in the same MinHash band
    # buckets, so the verify stage sees one giant candidate group.
    docs = tables["documents"]
    texts = docs.column("text").to_pylist()
    vocab = np.array(sorted({w for t in texts[:50] for w in t.split(" ")}))
    base = texts[0].split(" ")
    n_doc = len(texts)
    hot_docs = rng.choice(
        np.arange(1, n_doc), size=int(0.3 * n_doc), replace=False)
    for j in hot_docs:
        w = list(base)
        k = int(rng.integers(1, 3))
        w[-k:] = list(vocab[rng.integers(0, len(vocab), k)])
        texts[int(j)] = " ".join(w)
    docs = docs.set_column(
        docs.schema.get_field_index("text"), docs.schema.field("text"),
        pa.array(texts, pa.string()))
    docs = docs.set_column(
        docs.schema.get_field_index("n_chars"), docs.schema.field("n_chars"),
        pa.array([len(t) for t in texts], pa.int64()))
    tables["documents"] = docs

    # one hot embedding ball: 40% of vectors within ~0.01 of vector 0
    emb = tables["embeddings"]
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    labels = emb.column("label").to_numpy().copy()
    hot_vecs = rng.choice(
        np.arange(1, len(vecs)), size=int(0.4 * len(vecs)), replace=False)
    ball = vecs[0] + 0.01 * rng.normal(size=(len(hot_vecs), vecs.shape[1]))
    ball /= np.linalg.norm(ball, axis=1, keepdims=True)
    vecs[hot_vecs] = ball.astype(np.float32)
    labels[hot_vecs] = labels[0]
    emb = emb.set_column(
        emb.schema.get_field_index("embedding"),
        emb.schema.field("embedding"),
        pa.array([v for v in vecs], pa.list_(pa.float32())))
    emb = emb.set_column(
        emb.schema.get_field_index("label"), emb.schema.field("label"),
        pa.array(labels, pa.int32()))
    tables["embeddings"] = emb

    for name, tbl in tables.items():
        path = os.path.join(out, f"{name}.parquet")
        pq.write_table(tbl, path, compression="zstd")
        print(f"{name}: {tbl.num_rows} rows -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
