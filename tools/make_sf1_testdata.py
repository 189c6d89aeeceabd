"""Self-generated sf1.0 twin of the driver testdata (TESTDATA.md).

The driver's read-only parquet stops at sf0.1 (600k lineitem rows);
this mirrors its schema and distributions one decade up so the full
176-query registry + DuckDB oracle can be swept at ~6M lineitem rows
(`python tools/check_oracle.py /root/repo/testdata_sf1 --json
CORRECTNESS_sf1_r09.json`). Everything here was measured off the
driver parquet at sf0.001/0.01/0.1 (schemas via pyarrow, value ranges
and category frequencies via DuckDB):

- row counts scale linearly in sf (customer 150k/sf, orders 1.5M/sf,
  lineitem = 4x orders, events 1M/sf) except documents/embeddings
  which floor at 500 (driver sf0.001 == sf0.01 == 500);
- dimension columns are uniform categoricals with the driver's exact
  domains (Brand#1..25, 6 p_types, 5 priorities, A/N/R x F/O, 11
  discount cents, 9 tax cents, integer quantities 1..50);
- lineitem rows are INDEPENDENT of orders (driver data has random
  l_orderkey, shipdate uncorrelated with orderdate: measured
  ship-order deltas span -2399..+2496 days);
- events: timestamps sorted ascending over a 30-day window,
  value ~ Exp(mean 50) rounded to cents, props = '{"k": 0..99}';
- documents: 10..100 words from the driver's exact 31-word vocab,
  source = src{doc_id % 20}, lang weighted like the measured
  en/de/es/fr/zh split, ~5% near-duplicates (copy of an earlier doc
  with the last 1-3 words replaced) and ~0.3% exact duplicates —
  the measured sf0.1 rates the MinHash/SimHash/fuzzy queries rely on;
- embeddings: 64-dim unit-norm vectors around 10 cluster centers
  (labels = cluster), ~2% near-copies for the near-dup components.

Arrow types match the driver parquet exactly (int32 nation/region
keys, linenumber, p_size, label; timestamp[us]; list<float32>).

Usage: python tools/make_sf1_testdata.py [sf] [out_dir]
Defaults: 1.0 /root/repo/testdata_sf1  (gitignored — regenerate, do
not commit; deterministic at fixed sf: numpy default_rng(42)).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ADJS = ["large", "hot", "blue", "old", "cold", "small", "new", "red"]
NOUNS = ["ring", "bolt", "plate", "gear", "screw", "cap", "wheel", "box"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

US_PER_DAY = 86_400_000_000
EPOCH_1995 = np.datetime64("1995-01-01", "us")
EPOCH_2024 = np.datetime64("2024-01-01", "us")


def _ts_us(base: np.datetime64, offset_us: np.ndarray) -> pa.Array:
    return pa.array(base + offset_us.astype("timedelta64[us]"),
                    type=pa.timestamp("us"))


def _round2(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5) / 100


def gen_tables(sf: float, rng: np.random.Generator) -> dict[str, pa.Table]:
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = 4 * n_ord
    n_ev = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))
    n_users = int(15_000 * sf)

    t: dict[str, pa.Table] = {}
    t["region"] = pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    })
    t["nation"] = pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    })
    t["customer"] = pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": _round2(rng.uniform(-1000, 10000, n_cust)),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    })
    t["supplier"] = pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": _round2(rng.uniform(-1000, 10000, n_supp)),
    })
    pk = np.arange(n_part)
    t["part"] = pa.table({
        "p_partkey": pa.array(pk, pa.int64()),
        "p_name": pa.array(
            [f"{a} {n}" for a, n in zip(
                np.array(ADJS)[rng.integers(0, 8, n_part)],
                np.array(NOUNS)[rng.integers(0, 8, n_part)])]),
        "p_brand": pa.array(
            [f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.floor((900 + (pk % 1000) / 10) * 10 + 0.5) / 10,
    })
    # orderdate: uniform over 1995-01-01 .. 2001-08-01 (whole days)
    ord_days = rng.integers(0, 2405, n_ord)
    t["orders"] = pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": _round2(rng.uniform(1000, 500000, n_ord)),
        "o_orderdate": _ts_us(EPOCH_1995, ord_days * US_PER_DAY),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    })
    ship_days = rng.integers(1, 2500, n_li)
    t["lineitem"] = pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": _round2(rng.uniform(900, 105000, n_li)),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us(EPOCH_1995, ship_days * US_PER_DAY),
    })
    # events: sorted timestamps over 30 days, Exp(50) values
    gaps = rng.exponential(30 * US_PER_DAY / max(n_ev, 1), n_ev)
    ts = np.cumsum(gaps)
    ts = (ts / ts[-1] * (30 * US_PER_DAY - 60_000_000)).astype(np.int64)
    t["events"] = pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts_us(EPOCH_2024, ts),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": _round2(rng.exponential(50.0, n_ev)),
        "props": pa.array([f'{{"k": {k}}}'
                           for k in rng.integers(0, 100, n_ev)]),
    })
    # documents: base corpus + measured dup rates
    vocab = np.array(VOCAB)
    lens = rng.integers(10, 101, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        words = vocab[rng.integers(0, len(vocab), lens[i])]
        texts.append(" ".join(words))
    # ~5% near-dups: replace tail words of a copy of an earlier doc
    n_near = int(0.05 * n_doc)
    for j in rng.integers(n_doc // 10, n_doc, n_near):
        src = int(rng.integers(0, j))
        w = texts[src].split(" ")
        k = int(rng.integers(1, 4))
        w[-k:] = list(vocab[rng.integers(0, len(vocab), k)])
        texts[int(j)] = " ".join(w)
    # ~0.3% exact dups
    for j in rng.integers(n_doc // 10, n_doc, max(2, int(0.003 * n_doc))):
        texts[int(j)] = texts[int(rng.integers(0, j))]
    langs = np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]
    t["documents"] = pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(langs),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    # embeddings: 10 unit-norm cluster centers, sigma-noise members
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + 0.35 * rng.normal(size=(n_emb, 64))
    # ~2% near-copies of an earlier vector (same label)
    for j in rng.integers(n_emb // 10, n_emb, int(0.02 * n_emb)):
        src = int(rng.integers(0, j))
        vecs[int(j)] = vecs[src] + 0.01 * rng.normal(size=64)
        labels[int(j)] = labels[src]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    t["embeddings"] = pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype(np.float32)],
            pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    return t


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    for name, tbl in gen_tables(sf, rng).items():
        path = os.path.join(out, f"{name}.parquet")
        pq.write_table(tbl, path, compression="zstd")
        print(f"{name}: {tbl.num_rows} rows -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
