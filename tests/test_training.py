"""Property tests for the training-pipeline queries (independent
python recomputation on the fixture tables — not the same code path
as either engine)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_deterministic_sample_membership_exact(spark, sf_dir):
    """The kept set is exactly {doc: md5-bucket(doc_id) < 20} — verified
    against hashlib, a third implementation of the hash."""
    from nbody6_data_pipeline_spark.queries_training import (
        SAMPLE_PCT,
        q_doc_deterministic_sample,
    )

    kept = {
        r["doc_id"]
        for r in q_doc_deterministic_sample(spark, sf_dir).collect()
    }
    all_ids = [r["doc_id"] for r in _docs(spark, sf_dir).select("doc_id").collect()]
    expect = {
        i
        for i in all_ids
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        < SAMPLE_PCT
    }
    assert kept == expect
    assert 0 < len(kept) < len(all_ids)


def test_chunk_overlap_reconstructs_documents(spark, sf_dir):
    """Stride-prefixes of all chunks but the last, plus the last chunk,
    concatenate back to the original token stream — no token lost or
    duplicated beyond the declared overlap."""
    from nbody6_data_pipeline_spark.queries_training import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        q_doc_chunk_overlap,
    )

    chunks = {}
    for r in q_doc_chunk_overlap(spark, sf_dir).collect():
        chunks.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"].split(" "), r["n_chunk_tokens"])
        )
    docs = {
        r["doc_id"]: r["text"].split()
        for r in _docs(spark, sf_dir).collect()
    }
    checked = 0
    for doc_id, parts in chunks.items():
        parts.sort()
        toks = docs[doc_id]
        rebuilt = []
        for idx, words, n in parts:
            assert idx == len(rebuilt) // CHUNK_STRIDE or idx == parts[-1][0]
            assert len(words) == n <= CHUNK_TOKENS
            if (idx, words, n) is not parts[-1]:
                rebuilt.extend(words[:CHUNK_STRIDE])
            else:
                rebuilt.extend(words)
        assert rebuilt == toks
        checked += 1
    assert checked == sum(1 for t in docs.values() if t)


def test_repetition_ratio_brute_force(spark, sf_dir):
    from collections import Counter

    from nbody6_data_pipeline_spark.queries_training import (
        q_doc_repetition_filter,
    )

    got = {
        r["doc_id"]: (r["n_bigrams"], r["top_count"])
        for r in q_doc_repetition_filter(spark, sf_dir).collect()
    }
    docs = _docs(spark, sf_dir).collect()
    for r in docs[:100]:
        toks = r["text"].lower().split()
        if len(toks) < 2:
            assert r["doc_id"] not in got
            continue
        bg = Counter(zip(toks, toks[1:]))
        assert got[r["doc_id"]] == (len(toks) - 1, max(bg.values()))


def test_rolling_1h_brute_force(spark, sf_dir):
    from nbody6_data_pipeline_spark.queries_training import (
        ROLL_US,
        q_events_rolling_1h,
    )

    rows = q_events_rolling_1h(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, evs in list(by_user.items())[:20]:
        evs.sort(key=lambda r: (r["us"], r["event_id"]))
        for r in evs:
            expect_n = sum(1 for o in evs if r["us"] - ROLL_US <= o["us"] <= r["us"])
            assert r["n_1h"] == expect_n


def test_pack_sequences_conservation(spark, sf_dir):
    """Packing must conserve tokens: per doc, contributions across
    packs sum to its token count; per (source, pack), contributions
    sum to SEQ_LEN except the shard's final partial pack."""
    from collections import defaultdict

    from nbody6_data_pipeline_spark.queries_training import (
        SEQ_LEN,
        q_doc_pack_sequences,
    )

    rows = q_doc_pack_sequences(spark, sf_dir).collect()
    per_doc = defaultdict(int)
    per_pack = defaultdict(int)
    max_pack = {}
    for r in rows:
        per_doc[r["doc_id"]] += r["n_tokens_in_pack"]
        per_pack[(r["source"], r["pack_id"])] += r["n_tokens_in_pack"]
        max_pack[r["source"]] = max(
            max_pack.get(r["source"], -1), r["pack_id"]
        )
    docs = _docs(spark, sf_dir).collect()
    for r in docs:
        n = len(r["text"].split())
        if n:
            assert per_doc[r["doc_id"]] == n
    for (source, pack_id), tot in per_pack.items():
        if pack_id < max_pack[source]:
            assert tot == SEQ_LEN, (source, pack_id, tot)
        else:
            assert 0 < tot <= SEQ_LEN


def test_benchmark_contamination_brute_force(spark, sf_dir):
    """Contamination flags match a python set-intersection recompute
    of 8-gram overlap against the benchmark subset."""
    from nbody6_data_pipeline_spark.queries_training import (
        BENCH_MOD,
        CONTAM_GRAM,
        q_doc_benchmark_contamination,
    )

    def grams(text):
        t = text.lower().split()
        return {
            " ".join(t[i : i + CONTAM_GRAM])
            for i in range(len(t) - CONTAM_GRAM + 1)
        }

    docs = {r["doc_id"]: r["text"] for r in _docs(spark, sf_dir).collect()}
    bench = set()
    for i, txt in docs.items():
        if i % BENCH_MOD == 0:
            bench |= grams(txt)
    got = {
        r["doc_id"]: r["n_contaminated_grams"]
        for r in q_doc_benchmark_contamination(spark, sf_dir).collect()
    }
    assert set(got) == {i for i in docs if i % BENCH_MOD != 0}
    for i, txt in list(docs.items())[:150]:
        if i % BENCH_MOD != 0:
            assert got[i] == len(grams(txt) & bench), i
