"""End-to-end training-corpus pipeline: funnel monotonicity,
dedup behavior, determinism across reruns."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.corpus_pipeline import (
    N_SHARDS,
    build_training_corpus,
)


def test_corpus_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    manifest = build_training_corpus(spark, sf_dir, out)

    st = manifest["stages"]
    # monotone funnel with a non-trivial gate
    assert st["raw"] >= st["gated"] >= st["deduped"] > 0
    assert st["gated"] < st["raw"]  # the gate actually fires

    # shard accounting adds up and stays within the shard-count bound
    assert sum(s["n_docs"] for s in manifest["shards"]) == st["deduped"]
    assert len(manifest["shards"]) <= N_SHARDS

    # written manifest matches the returned one
    with open(os.path.join(out, "manifest.json")) as fh:
        assert json.load(fh) == manifest

    # deterministic rerun: byte-identical manifest, identical corpus
    corpus1 = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "shards")).collect()
    )
    manifest2 = build_training_corpus(spark, sf_dir, out)
    assert manifest2 == manifest
    corpus2 = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "shards")).collect()
    )
    assert corpus1 == corpus2


def test_corpus_pipeline_removes_near_dups(spark, tmp_path):
    """A planted near-dup family collapses to its lowest doc_id."""
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the observer counts tokens carefully one by one today "
    ) * 3
    rows = []
    for i in range(3):  # three near-identical variants
        rows.append((100 + i, base + f"variant tail {i}", "en", "s", len(base)))
    rows.append((500, "completely different content " * 20, "en", "s", 600))
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df.write.parquet(os.path.join(sf, "documents.parquet"))
    out = str(tmp_path / "corpus")
    manifest = build_training_corpus(spark, sf, out)
    kept = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "shards")).collect()
    )
    assert kept == [100, 500]
    assert manifest["stages"]["deduped"] == 2


def test_incremental_update_dedups_against_corpus(spark, tmp_path):
    """Delta docs that near-dup or exactly duplicate corpus docs are
    dropped (first-seen wins); genuinely new docs append; replaying
    the same delta appends nothing (the indexes now contain it)."""
    import os

    from nbody6_data_pipeline_spark.corpus_pipeline import (
        update_training_corpus,
    )

    base_text = (
        "the quick brown fox jumps over the lazy dog repeatedly "
        "while careful observers count every token in the corpus "
    ) * 3
    novel_text = (
        "an entirely different subject matter about stellar clusters "
        "and dynamic simulations with many unique words in sequence "
    ) * 3
    initial = spark.createDataFrame(
        [(1, base_text, "en", "s", len(base_text))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    initial.write.parquet(os.path.join(sf, "documents.parquet"))
    out = str(tmp_path / "corpus")
    m0 = build_training_corpus(spark, sf, out)
    assert m0["stages"]["deduped"] == 1

    delta = spark.createDataFrame(
        [
            # near-dup of corpus doc 1 (suffix mutation)
            (50, base_text + " tail mutation", "en", "s", len(base_text) + 14),
            # exact duplicate of corpus doc 1
            (51, base_text, "en", "s", len(base_text)),
            # genuinely new doc
            (52, novel_text, "en", "s", len(novel_text)),
            # near-dup of the new doc WITHIN the delta -> one survives
            (53, novel_text + " small tail", "en", "s", len(novel_text) + 11),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    m1 = update_training_corpus(spark, delta, out)
    assert m1["delta"]["raw"] == 4
    assert m1["delta"]["appended"] == 1  # only doc 52 survives

    # provenance: every dropped doc is logged with stage + culprit
    prov = {
        r["doc_id"]: (r["stage"], r["dup_of"])
        for r in spark.read.parquet(os.path.join(out, "provenance")).collect()
    }
    assert prov[51] == ("exact_vs_corpus", 1)
    assert prov[50][1] == 1  # near-dupped corpus doc 1 at some stage
    assert prov[50][0] in ("neardup_vs_corpus", "neardup_intra_delta")
    assert prov[53] == ("neardup_intra_delta", 52)
    assert 52 not in prov  # survivors are never logged

    corpus = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "shards")).collect()
    )
    assert corpus == [1, 52]

    # replay: everything is now indexed -> nothing appends
    m2 = update_training_corpus(spark, delta, out)
    assert m2["delta"]["appended"] == 0
    corpus2 = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "shards")).collect()
    )
    assert corpus2 == [1, 52]

    # the replay re-logs doc 53 at a LATER stage (its fp was never
    # indexed, so it now drops against the corpus); the audit view
    # must still return exactly one funnel-earliest row per doc
    from nbody6_data_pipeline_spark.corpus_pipeline import read_provenance

    view = {
        r["doc_id"]: (r["stage"], r["dup_of"])
        for r in read_provenance(spark, out).collect()
    }
    assert view[53] == ("neardup_intra_delta", 52)
    assert len(read_provenance(spark, out).collect()) == len(view)


def test_retire_docs_removes_and_readmits(spark, sf_dir, tmp_path):
    """Retiring docs removes them from shards AND both dedup indexes
    (so re-submission is admitted fresh), touches only affected shard
    partitions, logs provenance, and is idempotent."""
    from nbody6_data_pipeline_spark.corpus_pipeline import (
        retire_docs,
        update_training_corpus,
    )

    out = str(tmp_path / "corpus")
    build_training_corpus(spark, sf_dir, out)
    shards = spark.read.parquet(os.path.join(out, "shards"))
    victims = [r["doc_id"] for r in shards.limit(2).collect()]
    victim_rows = shards.filter(shards["doc_id"].isin(victims)).collect()

    # file listing of every shard partition BEFORE the retire
    def shard_files():
        root = os.path.join(out, "shards")
        return {
            d: sorted(os.listdir(os.path.join(root, d)))
            for d in os.listdir(root)
            if d.startswith("shard=")
        }

    before = shard_files()
    affected_parts = {f"shard={r['shard']}" for r in victim_rows}

    ids = spark.createDataFrame([(v,) for v in victims], ["doc_id"])
    m = retire_docs(spark, ids, out)
    assert m["retire"]["requested"] == len(set(victims))
    assert m["retire"]["removed"] == len(set(victims))

    after = shard_files()
    # only the victims' shard partitions were rewritten
    for part, files in before.items():
        if part not in affected_parts:
            assert after[part] == files, f"untouched {part} changed"

    remaining = spark.read.parquet(os.path.join(out, "shards"))
    assert remaining.filter(remaining["doc_id"].isin(victims)).count() == 0
    for idx, col in (("fingerprints", "doc_id"), ("bands", "doc")):
        t = spark.read.parquet(os.path.join(out, idx))
        assert t.filter(t[col].isin(victims)).count() == 0

    # provenance logged with stage='retired'
    prov = spark.read.parquet(os.path.join(out, "provenance"))
    logged = {
        r["doc_id"]
        for r in prov.filter(prov["stage"] == "retired").collect()
    }
    assert logged == set(victims)

    # idempotent: replaying removes nothing more
    m2 = retire_docs(spark, ids, out)
    assert m2["retire"]["removed"] == 0

    # re-submitting a retired doc is admitted FRESH (indexes cleaned)
    resubmit = spark.createDataFrame(
        [
            (
                r["doc_id"],
                r["text"],
                r["lang"],
                r["source"],
                r["n_chars"],
            )
            for r in victim_rows
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    md = update_training_corpus(spark, resubmit, out)
    assert md["delta"]["appended"] == len(set(victims))


def test_compact_corpus_shards(spark, sf_dir, tmp_path):
    """Delta appends multiply per-shard files; compaction folds them
    without changing the corpus contents."""
    from nbody6_data_pipeline_spark.corpus_pipeline import (
        compact_corpus_shards,
        update_training_corpus,
    )

    out = str(tmp_path / "corpus")
    build_training_corpus(spark, sf_dir, out)
    # two deltas of fresh synthetic docs -> extra file sets per shard
    for i in range(2):
        delta = spark.createDataFrame(
            [
                (
                    1_000_000 + i * 100 + j,
                    f"unique delta document {i} {j} " * 30,
                    "en",
                    "d",
                    900,
                )
                for j in range(20)
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        update_training_corpus(spark, delta, out)

    shards = os.path.join(out, "shards")
    docs_before = sorted(
        r["doc_id"] for r in spark.read.parquet(shards).collect()
    )

    def n_files():
        return sum(
            1
            for d in os.listdir(shards)
            if d.startswith("shard=")
            for f in os.listdir(os.path.join(shards, d))
            if f.endswith(".parquet")
        )

    before = n_files()
    report = compact_corpus_shards(spark, out)
    after = n_files()
    assert after < before
    assert after == sum(v["files_after"] for v in report.values())
    docs_after = sorted(
        r["doc_id"] for r in spark.read.parquet(shards).collect()
    )
    assert docs_after == docs_before


def test_read_provenance_dedups_replayed_drops(spark, tmp_path):
    """A replayed delta re-logs its drops; the audit view collapses
    them to one row per (doc_id, stage)."""
    from nbody6_data_pipeline_spark.corpus_pipeline import (
        read_provenance,
        update_training_corpus,
    )

    text = (
        "the quick brown fox jumps over the lazy dog repeatedly "
        "while careful observers count every token in the corpus "
    ) * 3
    initial = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    initial.write.parquet(os.path.join(sf, "documents.parquet"))
    out = str(tmp_path / "corpus")
    build_training_corpus(spark, sf, out)

    dup = spark.createDataFrame(
        [(9, text, "en", "s", len(text))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    update_training_corpus(spark, dup, out)
    update_training_corpus(spark, dup, out)  # replay re-logs the drop

    raw = spark.read.parquet(os.path.join(out, "provenance"))
    assert raw.filter(raw["doc_id"] == 9).count() == 2  # logged twice
    view = read_provenance(spark, out)
    rows = view.filter(view["doc_id"] == 9).collect()
    assert len(rows) == 1 and rows[0]["dup_of"] == 1


def test_null_gate_columns_are_logged(spark, tmp_path):
    """A doc whose gate predicate evaluates NULL (e.g. NULL lang) is
    dropped AND logged — three-valued logic must not let it vanish
    silently."""
    from nbody6_data_pipeline_spark.corpus_pipeline import (
        update_training_corpus,
    )

    text = "perfectly reasonable words repeated for length " * 10
    seed = spark.createDataFrame(
        [(1, text + "seed", "en", "s", 600)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    seed.write.parquet(os.path.join(sf, "documents.parquet"))
    out = str(tmp_path / "corpus")
    build_training_corpus(spark, sf, out)

    delta = spark.createDataFrame(
        [
            (70, text + "null lang", None, "s", 600),  # NULL predicate
            (71, text + "fresh doc", "en", "s", 600),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    m = update_training_corpus(spark, delta, out)
    assert m["delta"]["appended"] == 1  # only 71
    prov = {
        r["doc_id"]: (r["stage"], r["dup_of"])
        for r in spark.read.parquet(os.path.join(out, "provenance")).collect()
    }
    assert prov[70] == ("quality_gate", None)


def test_staging_leftovers_never_corrupt_readers(spark, tmp_path):
    """Simulated crash leftovers — a hidden compaction staging dir and
    an un-restored retire old_base — must not change what readers see
    (hidden prefix) and must self-heal on the next retire call."""
    import shutil

    from nbody6_data_pipeline_spark.corpus_pipeline import retire_docs

    docs = spark.createDataFrame(
        [
            (
                i,
                (f"distinct vocabulary number {i} " * 8) + f"doc {i} body",
                "en",
                "s",
                400,
            )
            for i in range(40)
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))
    out = str(tmp_path / "corpus")
    build_training_corpus(spark, sf, out)
    shards = os.path.join(out, "shards")
    n0 = spark.read.parquet(shards).count()
    parts = sorted(d for d in os.listdir(shards) if d.startswith("shard="))

    # 1) hidden compaction leftover: a stale duplicate copy under a
    #    "."-prefixed sibling must be invisible to partition discovery
    shutil.copytree(
        os.path.join(shards, parts[0]),
        os.path.join(shards, f".compact_old.{parts[0]}"),
    )
    assert spark.read.parquet(shards).count() == n0

    # 2) interrupted retire: a shard moved OUT (crash between the two
    #    renames) is restored by the next call's entry self-heal
    old_base = shards + "._retire_old"
    os.makedirs(old_base, exist_ok=True)
    os.rename(
        os.path.join(shards, parts[1]), os.path.join(old_base, parts[1])
    )
    victim = spark.read.parquet(shards).limit(1).collect()[0]["doc_id"]
    ids = spark.createDataFrame([(victim,)], ["doc_id"])
    m = retire_docs(spark, ids, out)
    assert m["retire"]["removed"] == 1
    assert not os.path.isdir(old_base)  # healed and cleaned
    assert spark.read.parquet(shards).count() == n0 - 1


def _mini_corpus(spark, tmp_path, n=40):
    """Small distinct-doc corpus + built output dir, for crash tests."""
    docs = spark.createDataFrame(
        [
            (
                i,
                (f"distinct vocabulary number {i} " * 8) + f"doc {i} body",
                "en",
                "s",
                400,
            )
            for i in range(n)
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sf_crash")
    os.makedirs(sf, exist_ok=True)
    docs.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = str(tmp_path / "corpus_base")
    build_training_corpus(spark, sf, out)
    return out


def _corpus_state(spark, out):
    """Doc-id content snapshot of every swap-managed table."""
    shards = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "shards")).collect()
    )
    fps = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "fingerprints")).collect()
    )
    bands = sorted(
        (r["doc"], r["band"])
        for r in spark.read.parquet(os.path.join(out, "bands")).collect()
    )
    return shards, fps, bands


def test_retire_crash_at_every_rename_boundary(spark, tmp_path):
    """TRUE fault injection for the staged-swap crash contract
    (corpus_pipeline.retire_docs / _swap_rewrite): kill os.rename at
    EVERY call index in the sequence and prove, for each crash point,
    that (a) all three tables stay readable with no torn partition and
    no doc duplicated, and (b) replaying the same retire WITHOUT the
    fault converges to exactly the clean-run end state (idempotent
    resume via the entry self-heal)."""
    import shutil

    from nbody6_data_pipeline_spark.corpus_pipeline import retire_docs

    base = _mini_corpus(spark, tmp_path)
    orig_state = _corpus_state(spark, base)
    victims = orig_state[0][:2]
    ids = spark.createDataFrame([(v,) for v in victims], ["doc_id"])

    # clean reference run
    ref = str(tmp_path / "ref")
    shutil.copytree(base, ref)
    retire_docs(spark, ids, ref)
    ref_state = _corpus_state(spark, ref)
    assert not set(victims) & set(ref_state[0])

    real_rename = os.rename
    k = 1
    while True:  # one iteration per rename boundary until none fires
        out = str(tmp_path / f"crash_{k}")
        shutil.copytree(base, out)
        calls = {"n": 0}

        def crashing(src, dst, *, _k=k):
            calls["n"] += 1
            if calls["n"] == _k:
                raise RuntimeError(f"injected crash at rename #{_k}")
            return real_rename(src, dst)

        os.rename = crashing
        crashed = False
        try:
            retire_docs(spark, ids, out)
        except RuntimeError as e:
            assert "injected crash" in str(e)
            crashed = True
        finally:
            os.rename = real_rename
        if not crashed:
            # the k-th rename never happened: every boundary is covered
            assert _corpus_state(spark, out) == ref_state
            break

        # (a) post-crash: every VISIBLE table is readable with no
        # duplicates and no foreign rows. A table caught between
        # _swap_rewrite's two renames may be absent entirely — the
        # documented restore-on-next-call window — in which case the
        # complete old copy MUST exist at its ._swap_old sibling.
        for table, col, orig in (
            ("shards", "doc_id", orig_state[0]),
            ("fingerprints", "doc_id", orig_state[1]),
            ("bands", None, orig_state[2]),
        ):
            path = os.path.join(out, table)
            if not os.path.isdir(path):
                assert os.path.isdir(path + "._swap_old"), (
                    f"{table} lost with no old copy after crash #{k}"
                )
                continue
            rows = spark.read.parquet(path).collect()
            snap = sorted(
                (r["doc"], r["band"]) if col is None else r[col]
                for r in rows
            )
            assert len(snap) == len(set(snap)), f"dup rows after crash #{k}"
            assert set(snap) <= set(orig), f"foreign rows after crash #{k}"

        # (b) resume without fault: converges to the clean end state
        m = retire_docs(spark, ids, out)
        assert m["retire"]["removed"] <= len(victims)
        assert _corpus_state(spark, out) == ref_state, f"crash #{k}"
        # audit trail survives (may be double-logged; the view dedups)
        from nbody6_data_pipeline_spark.corpus_pipeline import read_provenance

        logged = {
            r["doc_id"]
            for r in read_provenance(spark, out)
            .filter(F.col("stage") == "retired")
            .collect()
        }
        assert set(victims) <= logged
        k += 1
    assert k >= 5, f"only {k - 1} rename boundaries exercised"


def test_compaction_crash_mid_swap_is_invisible_then_resumable(spark, tmp_path):
    """compact_corpus_shards inherits compact_small_files' staged-swap
    contract: a crash between its two renames leaves readers on a
    complete copy, and the next compaction self-heals and completes."""
    import shutil

    from nbody6_data_pipeline_spark.corpus_pipeline import (
        compact_corpus_shards,
    )

    out = _mini_corpus(spark, tmp_path)
    before = _corpus_state(spark, out)

    real_rename = os.rename
    for k in (1, 2):  # crash after source moved out / after staging in
        calls = {"n": 0}

        def crashing(src, dst, *, _k=k):
            calls["n"] += 1
            if calls["n"] == _k:
                raise RuntimeError("injected compaction crash")
            return real_rename(src, dst)

        os.rename = crashing
        try:
            with __import__("pytest").raises(RuntimeError):
                compact_corpus_shards(spark, out)
        finally:
            os.rename = real_rename
        # mid-crash readers: table stays READABLE with no torn
        # partition and no duplicated doc; a shard moved out between
        # the two renames is allowed to be temporarily invisible (the
        # documented restore-on-next-call window), never corrupted
        shards, fps, bands = _corpus_state(spark, out)
        assert len(shards) == len(set(shards)), f"dup rows crash #{k}"
        assert set(shards) <= set(before[0]), f"foreign rows crash #{k}"

    # resume: self-heal + full compaction succeeds, contents unchanged
    report = compact_corpus_shards(spark, out)
    assert report  # every shard reported
    assert _corpus_state(spark, out) == before
    # no staging/old leftovers survive a completed pass
    shards_root = os.path.join(out, "shards")
    leftovers = [
        d
        for d in os.listdir(shards_root)
        if d.startswith(".compact_")
    ]
    assert leftovers == []
