"""End-to-end training-corpus pipeline: the glue that runs the
registry's LLM-data operators as ONE orchestrated flow.

    raw documents
      -> quality gate        (length / language / token floor)
      -> exact+vocab dedup   (tokenset fingerprint, keep lowest id)
      -> near-dup dedup      (MinHash-LSH candidates -> exact Jaccard
                              verify -> connected components -> keep
                              best per cluster)
      -> shard + write       (content-hash shards, partitioned write)
      -> manifest            (per-stage funnel + per-shard stats)

Every stage is the SAME operator the registry exposes individually
(operators/dedup, queries_training's gate/shard constructions), so
correctness evidence transfers: what the oracle gate proves about
each query, this pipeline inherits. Design properties:

- **Deterministic end to end.** Every choice is content-addressed
  (md5 ids/hashes, min-id winners), so reruns — and replays after
  failures — produce byte-identical corpora and manifests. The
  manifest is the contract a downstream trainer validates.
- **Monotone funnel.** Stages only remove rows; the manifest records
  each stage's survivor count, so drift shows up at the stage that
  caught it (same observability shape as doc_filter_funnel).
- **Scale shape.** The gate is a pure filter (no shuffle); dedup
  stages shuffle fingerprints / LSH bands, never all-pairs; the shard
  write is one partitionBy. Each layer lands as parquet before the
  next reads it, so recovery resumes from the last completed layer
  and lineage never accumulates across stages (same layering idiom
  as pipeline.py for the NBODY6 legs).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.dedup import (
    LSH_BUCKET_CAP,
    connected_components,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_bands,
)
from nbody6_data_pipeline_spark.operators.text import ascii_lower, token_array
from nbody6_data_pipeline_spark.queries import md5_bucket

MIN_CHARS = 120
LANGS = ("en", "de")
MIN_TOKENS = 25
NEARDUP_JACCARD = 0.8
N_SHARDS = 16


def gate_predicate() -> F.Column:
    """The quality gate as a reusable boolean column, so callers can
    take the PASSING rows (filter) or the FAILING rows (negated
    filter, for provenance) without an anti-join."""
    return (
        (F.col("n_chars") >= MIN_CHARS)
        & (F.col("lang").isin(*LANGS))
        & (F.size(token_array(F.col("text"))) >= MIN_TOKENS)
    )


def quality_gate(docs: DataFrame) -> DataFrame:
    """Pure-filter quality gate (no shuffle)."""
    return docs.filter(gate_predicate())


def tokenset_dedup(docs: DataFrame) -> DataFrame:
    """Exact + vocabulary dedup: keep the lowest doc_id per sorted
    distinct-token-set fingerprint (subsumes byte-exact dedup)."""
    w = docs.select("doc_id", _tokenset_fp().alias("fp"))
    keep = w.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return docs.join(keep.select("doc_id"), "doc_id", "left_semi")


def neardup_losers(docs: DataFrame, bands: DataFrame | None = None) -> DataFrame:
    """(doc_id, dup_of) for every doc that loses its near-dup cluster:
    MinHash-LSH candidates -> exact Jaccard verify -> connected
    components; the lowest doc_id in each cluster keeps, the rest map
    to it. Exposed separately so the delta path can record dedup
    PROVENANCE (why a doc was dropped) without recomputing.

    ``bands``: optional precomputed ``minhash_bands(docs, ...)`` (the
    corpus paths localCheckpoint it so the expensive signature pass is
    shared with the bucket-cap telemetry recorded in the manifest)."""
    if bands is None:
        bands = minhash_bands(docs, F.col("text"), "doc_id")
    # persist: jaccard_verify consumes the candidate pairs three times
    # (two semi-join id sides + the pair join); unpersisted, each
    # reference re-runs the band-bucket expansion
    cand = lsh_candidate_pairs(bands).persist()
    pairs = (
        jaccard_verify(cand, docs, F.col("text"), "doc_id")
        .filter(F.col("jaccard") >= NEARDUP_JACCARD)
        .select("doc_a", "doc_b")
    )
    comp = connected_components(pairs, a_col="doc_a", b_col="doc_b")
    return (
        comp.groupBy("comp")
        .agg(F.min("node").alias("keep"))
        .join(comp, "comp")
        .filter(F.col("node") != F.col("keep"))
        .select(F.col("node").alias("doc_id"), F.col("keep").alias("dup_of"))
    )


def neardup_dedup(docs: DataFrame, bands: DataFrame | None = None) -> DataFrame:
    """MinHash-LSH candidates -> exact Jaccard verify -> connected
    components -> keep the lowest doc_id per near-dup cluster."""
    return docs.join(
        neardup_losers(docs, bands=bands).select("doc_id"),
        "doc_id",
        "left_anti",
    )


def _log_seq() -> F.Column:
    """Log-time sequence stamp for provenance rows (epoch micros at
    WRITE time). Chronology is what read_provenance recovers the
    first-ingest drop reason from; only cross-call ordering matters,
    which the clock guarantees. The log is an operational audit
    artifact, not an oracle-checked query output, so a wall clock is
    acceptable here."""
    return F.unix_micros(F.current_timestamp()).alias("seq_us")


def _tokenset_fp() -> F.Column:
    return F.md5(
        F.concat_ws(
            " ",
            F.array_sort(F.array_distinct(token_array(ascii_lower(F.col("text"))))),
        )
    )


def _write_indexes(docs: DataFrame, out_dir: str, mode: str) -> None:
    """Persist the dedup indexes of the kept docs — the exact/vocab
    fingerprint table and the MinHash band table — so later DELTA
    batches can dedup against the corpus without rescanning it."""
    docs.select(F.col("doc_id"), _tokenset_fp().alias("fp")).write.mode(
        mode
    ).parquet(os.path.join(out_dir, "fingerprints"))
    minhash_bands(docs, F.col("text"), "doc_id").write.mode(mode).parquet(
        os.path.join(out_dir, "bands")
    )


def _lsh_cap_telemetry(bands: DataFrame) -> dict:
    """EXACT bucket-cap telemetry for the manifest: one cheap
    aggregation over the (materialized) band table, counting the rows
    and buckets the ``LSH_BUCKET_CAP`` in ``lsh_candidate_pairs`` will
    drop. Computed as its own job rather than a ``.observe()`` on the
    dedup plan because Spark 4.1's observed-metrics row is corrupt
    when the observed RESULT is empty (toPyRow assertion, even with
    AQEPropagateEmptyRelation excluded) — and a delta batch with zero
    intra-delta near-dups is a completely normal case the production
    manifest must survive."""
    row = (
        bands.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("band_rows"),
            F.coalesce(
                F.sum(F.when(F.col("n") > LSH_BUCKET_CAP, F.col("n"))),
                F.lit(0),
            ).alias("dropped_rows"),
            F.coalesce(
                F.sum(F.when(F.col("n") > LSH_BUCKET_CAP, 1)), F.lit(0)
            ).alias("dropped_buckets"),
        )
        .collect()[0]
    )
    return {
        "cap": LSH_BUCKET_CAP,
        "band_rows": int(row["band_rows"]),
        "dropped_rows": int(row["dropped_rows"]),
        "dropped_buckets": int(row["dropped_buckets"]),
    }


def build_training_corpus(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict:
    """Run the full flow; returns the manifest (also written as JSON).

    Layers land under out_dir: gated/, deduped/, shards/ (partitioned
    by shard), fingerprints/ + bands/ (the dedup indexes delta
    batches match against), manifest.json.
    """
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_raw = raw.count()

    gated = quality_gate(raw)
    gated.write.mode("overwrite").parquet(os.path.join(out_dir, "gated"))
    gated = spark.read.parquet(os.path.join(out_dir, "gated"))
    n_gated = gated.count()

    exact = tokenset_dedup(gated)
    # bands materialized ONCE (localCheckpoint): shared by the dedup
    # plan and the exact bucket-cap telemetry below, so the expensive
    # minhash-signature pass runs a single time.
    build_bands = minhash_bands(exact, F.col("text"), "doc_id").localCheckpoint()
    near = neardup_dedup(exact, bands=build_bands)
    near.write.mode("overwrite").parquet(os.path.join(out_dir, "deduped"))
    near = spark.read.parquet(os.path.join(out_dir, "deduped"))
    n_deduped = near.count()

    sharded = near.withColumn("shard", md5_bucket(F.col("doc_id"), N_SHARDS))
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(out_dir, "shards")
    )
    _write_indexes(near, out_dir, "overwrite")
    shard_stats = (
        spark.read.parquet(os.path.join(out_dir, "shards"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = {
        "stages": {
            "raw": n_raw,
            "gated": n_gated,
            "deduped": n_deduped,
        },
        # LSH bucket-cap telemetry (round-9 ADVICE): a band bucket
        # larger than the cap is dropped before pair expansion — this
        # records HOW MUCH was dropped so it is never silent. On every
        # observed corpus dropped_buckets == 0.
        "lsh_bucket_cap": _lsh_cap_telemetry(build_bands),
        "shards": [
            {
                "shard": int(r["shard"]),
                "n_docs": int(r["n_docs"]),
                "total_chars": int(r["total_chars"]),
            }
            for r in shard_stats
        ],
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


def update_training_corpus(
    spark: SparkSession,
    delta: DataFrame,
    out_dir: str,
    manifest_name: str = "delta_manifest.json",
) -> dict:
    """Incremental ingest: run a DELTA batch of documents through the
    same gates and dedup it against the EXISTING corpus via the
    persisted indexes — the corpus itself is never rescanned except to
    verify the (tiny) candidate set.

    Dedup semantics are FIRST-SEEN-WINS: a delta doc that duplicates
    (exactly, by vocabulary, or by near-dup Jaccard) anything already
    in the corpus is dropped, whatever its id — the only causally
    consistent rule for an append-only corpus (a full rebuild's global
    min-id winner could differ; rebuild when winner policy matters).

    Scale shape: exact/vocab dedup is one anti-join against the
    fingerprint index; near-dup candidates come from joining the
    delta's bands against the stored band index on (band, band_hash)
    — at 100 TB both indexes would be bucketed by their join key so a
    delta batch touches only matching buckets; verification reads
    ONLY the candidate corpus docs (semi-join into the shards).
    Survivors append to shards/fingerprints/bands, making the update
    itself replayable: re-ingesting the same delta drops every doc at
    the exact-dedup stage (its fingerprints are now in the index).

    The three appends are not jointly atomic: a crash between them can
    leave a doc in shards but not the indexes (replay would re-append
    it) or vice versa. delta_manifest.json is written last and acts as
    the commit record — on a crash before it exists, rebuild with
    ``build_training_corpus`` (deterministic, so cheap to reason
    about) rather than replaying the delta.

    Every dropped doc is logged to ``provenance/`` as
    (doc_id, stage, dup_of): which funnel stage dropped it and — for
    dedup stages — the lowest-id doc it duplicated. The log is
    append-only: replaying a delta re-logs its drops, and a replayed
    intra-delta near-dup loser may re-log at a DIFFERENT stage
    (its fingerprint was never indexed, so on replay it falls through
    the exact stage and is caught against the now-indexed winner as a
    corpus near-dup). Audit through ``read_provenance``, which keeps
    one chronologically-first row per doc.
    """
    id_t = delta.schema["doc_id"].dataType

    def _prov(df: DataFrame, stage: str) -> DataFrame:
        return df.select(
            "doc_id",
            F.lit(stage).alias("stage"),
            F.col("dup_of").cast(id_t).alias("dup_of"),
            _log_seq(),
        )

    n_delta = delta.count()
    gated = quality_gate(delta)
    # Gate drops by NEGATED predicate — shuffle-free, no anti-join.
    # coalesce: a NULL predicate (NULL lang/n_chars/text) is a DROP
    # (filter keeps only TRUE), and three-valued ~NULL is NULL — the
    # coalesce keeps such docs from vanishing without a log row.
    gate_drops = delta.filter(
        ~F.coalesce(gate_predicate(), F.lit(False))
    ).select("doc_id", F.lit(None).cast(id_t).alias("dup_of"))

    # intra-delta exact/vocab dedup: the fingerprint is computed ONCE
    # (checkpointed — the tiny (doc_id, fp) table feeds the winner
    # aggregate, the loser log, and the corpus-index join below).
    fp_tagged = (
        gated.select("doc_id", _tokenset_fp().alias("fp")).localCheckpoint()
    )
    exact_intra_drops = (
        fp_tagged.join(
            fp_tagged.groupBy("fp").agg(F.min("doc_id").alias("dup_of")),
            "fp",
        )
        .filter(F.col("doc_id") != F.col("dup_of"))
        .select("doc_id", "dup_of")
    )
    exact_fp = fp_tagged.join(
        exact_intra_drops.select("doc_id"), "doc_id", "left_anti"
    )
    _swap_heal(os.path.join(out_dir, "fingerprints"))
    fp_index = spark.read.parquet(os.path.join(out_dir, "fingerprints"))
    # ONE scan of the fingerprint index serves both the dedup and its
    # provenance: a left-outer join (1:1 — fp is unique in the index:
    # the build deduped on it, appends anti-join first) is split into
    # survivors (no corpus match) and drops (match = the culprit).
    # Materialize the joined layer once (localCheckpoint, the
    # delta-sized analogue of the build's write-then-reread layering):
    # the downstream dedup operators reference their input several
    # times (band build, shingle semi-join, final anti-join), and an
    # unmaterialized lineage would re-run the whole upstream funnel —
    # including the index join — once per reference. Checked frames
    # are delta-sized, so the materialization is cheap.
    matched = (
        gated.join(
            exact_fp.join(
                fp_index.select(
                    "fp", F.col("doc_id").alias("_corpus_doc")
                ),
                "fp",
                "left_outer",
            ).drop("fp"),
            "doc_id",
        )
    ).localCheckpoint()
    exact_corpus_drops = matched.filter(
        F.col("_corpus_doc").isNotNull()
    ).select("doc_id", F.col("_corpus_doc").alias("dup_of"))
    fresh = matched.filter(F.col("_corpus_doc").isNull()).drop("_corpus_doc")
    n_after_exact = fresh.count()

    # near-dup vs corpus: delta bands x stored band index
    delta_bands = minhash_bands(fresh, F.col("text"), "doc_id").persist()
    _swap_heal(os.path.join(out_dir, "bands"))
    band_index = spark.read.parquet(os.path.join(out_dir, "bands"))
    # persist: consumed by the corpus-candidate semi-join AND three
    # times inside jaccard_verify; unpersisted, each reference re-ran
    # the delta-band x stored-band-index join (4 band-index scans)
    cand = (
        delta_bands.join(
            band_index.select(
                F.col("doc").alias("corpus_doc"), "band", "band_hash"
            ),
            ["band", "band_hash"],
        )
        .select(F.col("corpus_doc").alias("doc_a"), F.col("doc").alias("doc_b"))
        .distinct()
    ).persist()
    corpus_candidates = spark.read.parquet(
        os.path.join(out_dir, "shards")
    ).join(
        cand.select(F.col("doc_a").alias("doc_id")).distinct(),
        "doc_id",
        "left_semi",
    )
    verify_source = corpus_candidates.select(
        "doc_id", "text"
    ).unionByName(fresh.select("doc_id", "text"))
    # (doc_id, dup_of) of delta docs near-dupping the corpus; a doc
    # may match several corpus docs -> deterministic min. Checkpointed
    # because it is read twice (anti-join + provenance log) and its
    # lineage holds the corpus-verify join; it is drop-sized.
    neardup_corpus_drops = (
        jaccard_verify(cand, verify_source, F.col("text"), "doc_id")
        .filter(F.col("jaccard") >= NEARDUP_JACCARD)
        .groupBy(F.col("doc_b").alias("doc_id"))
        .agg(F.min("doc_a").alias("dup_of"))
    ).localCheckpoint()
    fresh2 = fresh.join(
        neardup_corpus_drops.select("doc_id"), "doc_id", "left_anti"
    ).localCheckpoint()
    n_after_corpus = fresh2.count()

    # intra-delta near-dup among what's left. localCheckpoint here is
    # ALSO load-bearing for correctness, not just plan hygiene: the
    # survivor lineage READS the very paths the appends below WRITE
    # (fingerprints/bands/shards), and Spark's recacheByPath
    # invalidates a merely-persisted plan on the first append — the
    # later index writes would then recompute survivors against the
    # already-updated fingerprint index and append empty indexes
    # (observed: band index silently missing every delta doc, so
    # replays re-append). Checkpointing truncates the lineage to
    # materialized rows that no path write can invalidate.
    # Loser pairs computed ONCE (checkpointed, loser-sized) and used
    # for both the survivor anti-join and the provenance log — running
    # neardup_dedup here would redo the whole LSH+verify for the log.
    intra_bands = minhash_bands(
        fresh2, F.col("text"), "doc_id"
    ).localCheckpoint()
    neardup_intra_drops = neardup_losers(
        fresh2, bands=intra_bands
    ).localCheckpoint()
    survivors = fresh2.join(
        neardup_intra_drops.select("doc_id"), "doc_id", "left_anti"
    ).localCheckpoint()
    n_appended = survivors.count()
    delta_bands.unpersist()

    _prov(gate_drops, "quality_gate").unionByName(
        _prov(exact_intra_drops, "exact_intra_delta")
    ).unionByName(_prov(exact_corpus_drops, "exact_vs_corpus")).unionByName(
        _prov(neardup_corpus_drops, "neardup_vs_corpus")
    ).unionByName(
        _prov(neardup_intra_drops, "neardup_intra_delta")
    ).write.mode("append").parquet(os.path.join(out_dir, "provenance"))

    survivors.withColumn(
        "shard", md5_bucket(F.col("doc_id"), N_SHARDS)
    ).write.mode("append").partitionBy("shard").parquet(
        os.path.join(out_dir, "shards")
    )
    _write_indexes(survivors, out_dir, "append")

    manifest = {
        "delta": {
            "raw": n_delta,
            "after_exact_vs_corpus": n_after_exact,
            "after_neardup_vs_corpus": n_after_corpus,
            "appended": n_appended,
        },
        # intra-delta LSH bucket-cap telemetry (see build manifest)
        "lsh_bucket_cap": _lsh_cap_telemetry(intra_bands),
    }
    with open(os.path.join(out_dir, manifest_name), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


def _swap_heal(path: str) -> None:
    """Restore a swap-managed table interrupted between
    ``_swap_rewrite``'s two renames: the complete old copy parks at
    ``<path>._swap_old`` while ``path`` itself is briefly absent. MUST
    run before ANY ``spark.read.parquet(path)`` of a swap-managed
    table — the read resolves the schema eagerly and raises
    PATH_NOT_FOUND on the healable state otherwise (found by the
    round-9 rename fault-injection test). Old copy is deleted LAST in
    the swap, so when both exist the visible path is the complete new
    copy and the old one is dropped."""
    old = path.rstrip("/") + "._swap_old"
    if os.path.isdir(old):
        if os.path.isdir(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)


def _swap_rewrite(df: DataFrame, path: str) -> None:
    """Rewrite ``path`` with ``df`` (whose lineage may READ ``path``)
    via a sibling staging directory and two renames, source deleted
    LAST — the same crash-contract as plans/layout.compact_small_files:
    a crash leaves either the untouched source (stale staging GC'd on
    the next call) or the complete old copy at ``<path>._swap_old``
    (auto-restored on the next call). The data streams executor->disk;
    nothing is materialized through executor storage."""
    tmp = path.rstrip("/") + "._swap_tmp"
    old = path.rstrip("/") + "._swap_old"
    _swap_heal(path)  # self-heal an interrupted swap
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def retire_docs(
    spark: SparkSession,
    doc_ids: DataFrame,
    out_dir: str,
    manifest_name: str = "retire_manifest.json",
) -> dict:
    """Targeted removal (right-to-be-forgotten / takedown / license
    revocation): delete the given doc_ids from the corpus SHARDS and
    from both dedup INDEXES, so a later re-submission of the same
    content is admitted fresh rather than silently suppressed by a
    fingerprint whose payload no longer exists.

    Scale shape — the deletion cost is proportional to the AFFECTED
    partitions, not the corpus: the shard of every retired id is a
    pure function of the id (md5_bucket), so only those shard
    directories are rewritten (anti-join + staged per-partition swap);
    untouched shards are never read or written. The fingerprint/band
    indexes are rewritten by one anti-join each (at 100 TB they would
    be bucketed by their join key — plans/bucketing.py — making those
    rewrites bucket-pruned the same way).

    Crash contract: all staging lives OUTSIDE the shards table root
    (``shards._retire_tmp`` / ``shards._retire_old`` siblings), so a
    reader — or Spark's partition discovery — never sees a half-swapped
    or stale copy; interrupted swaps self-heal at the next call's
    entry. The audit log is written FIRST (from the checkpointed
    removed set, before anything destructive — a crash can therefore
    double-log but never lose the trail; ``read_provenance`` dedups),
    the manifest last as the commit record, and the whole operation is
    IDEMPOTENT — replaying after any crash converges (anti-joins of
    already-removed ids are no-ops). Payload (shards) is removed
    before the indexes, so a mid-crash state errs toward the
    privacy-safe side.
    """
    ids = doc_ids.select("doc_id").distinct().localCheckpoint()
    id_t = doc_ids.schema["doc_id"].dataType
    n_requested = ids.count()
    shards_path = os.path.join(out_dir, "shards")
    tmp_base = shards_path.rstrip("/") + "._retire_tmp"
    old_base = shards_path.rstrip("/") + "._retire_old"

    # Self-heal BEFORE any read: a prior crash may have left a shard
    # moved out but not replaced (restore it) or replaced but not
    # cleaned (drop the old copy). Both live outside the table root,
    # so even an unhealed state never corrupts readers.
    if os.path.isdir(old_base):
        for d in os.listdir(old_base):
            back = os.path.join(shards_path, d)
            if os.path.isdir(back):
                shutil.rmtree(os.path.join(old_base, d))
            else:
                os.rename(os.path.join(old_base, d), back)
        shutil.rmtree(old_base, ignore_errors=True)
    shutil.rmtree(tmp_base, ignore_errors=True)

    affected = sorted(
        r["shard"]
        for r in ids.select(
            md5_bucket(F.col("doc_id"), N_SHARDS).alias("shard")
        )
        .distinct()
        .collect()
    )  # bounded by N_SHARDS
    in_affected = spark.read.parquet(shards_path).filter(
        F.col("shard").isin([int(s) for s in affected])
    )
    removed = (
        in_affected.join(ids, "doc_id", "left_semi")
        .select("doc_id")
        .localCheckpoint()  # request-bounded; survives the rewrite below
    )
    n_removed = removed.count()

    # 1) audit trail FIRST — before anything destructive
    removed.select(
        "doc_id",
        F.lit("retired").alias("stage"),
        F.lit(None).cast(id_t).alias("dup_of"),
        _log_seq(),
    ).write.mode("append").parquet(os.path.join(out_dir, "provenance"))

    # 2) shards: rewrite ONLY affected partitions via staged swap
    survivors = in_affected.join(ids, "doc_id", "left_anti")
    survivors.write.mode("overwrite").partitionBy("shard").parquet(tmp_base)
    os.makedirs(old_base, exist_ok=True)
    for s in affected:
        part = f"shard={int(s)}"
        src = os.path.join(tmp_base, part)
        dst = os.path.join(shards_path, part)
        if os.path.isdir(dst):
            os.rename(dst, os.path.join(old_base, part))
        if os.path.isdir(src):
            os.rename(src, dst)
    shutil.rmtree(old_base, ignore_errors=True)
    shutil.rmtree(tmp_base, ignore_errors=True)

    # 3) indexes: one anti-join each, staged swap
    fp_path = os.path.join(out_dir, "fingerprints")
    _swap_heal(fp_path)  # the read below resolves schema EAGERLY
    _swap_rewrite(
        spark.read.parquet(fp_path).join(ids, "doc_id", "left_anti"), fp_path
    )
    bands_path = os.path.join(out_dir, "bands")
    _swap_heal(bands_path)
    _swap_rewrite(
        spark.read.parquet(bands_path).join(
            ids.select(F.col("doc_id").alias("doc")), "doc", "left_anti"
        ),
        bands_path,
    )

    manifest = {
        "retire": {
            "requested": n_requested,
            "removed": n_removed,
            "shards_rewritten": [int(s) for s in affected],
        }
    }
    with open(os.path.join(out_dir, manifest_name), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


def compact_corpus_shards(
    spark: SparkSession,
    out_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Maintenance companion to the delta/retire paths: every
    ``update_training_corpus`` appends one file set per shard it
    touches, so file counts grow with ingest frequency until scan
    planning degrades (the classic small-file problem). Compact each
    shard PARTITION DIRECTORY independently with the layout
    compactor — per-partition scope keeps the rewrite incremental,
    inherits its staged-swap crash contract, and leaves concurrent
    readers of other shards untouched. Returns per-shard
    (files_before, files_after)."""
    from nbody6_data_pipeline_spark.plans.layout import compact_small_files

    shards_path = os.path.join(out_dir, "shards")
    # Orphan heal BEFORE enumerating partitions: compact_small_files
    # self-heals only when called on its own path, but this loop
    # derives paths from listdir — a crash between its two renames
    # leaves the partition parked at ``.compact_old.shard=N`` and
    # NOTHING visible to enumerate, so without this pre-pass the
    # orphan would never be restored (found by the round-9 rename
    # fault-injection test). Same authority rule as the inner heal:
    # the old copy is deleted LAST, so if both exist the visible
    # partition is the complete new copy and the old one is dropped.
    for d in sorted(os.listdir(shards_path)):
        if not d.startswith(".compact_old."):
            continue
        orig = os.path.join(shards_path, d[len(".compact_old."):])
        src = os.path.join(shards_path, d)
        if os.path.isdir(orig):
            shutil.rmtree(src)
        else:
            os.rename(src, orig)
    report = {}
    for d in sorted(os.listdir(shards_path)):
        if not d.startswith("shard="):
            continue
        before, after = compact_small_files(
            spark, os.path.join(shards_path, d), target_file_bytes
        )
        report[d] = {"files_before": before, "files_after": after}
    return report


def read_provenance(spark: SparkSession, out_dir: str) -> DataFrame:
    """Audit view over the provenance log: ONE row per doc per event
    class. Replays re-log drops, and NOT necessarily at the same
    stage (an intra-delta near-dup loser's fingerprint was never
    indexed, so on replay it falls through the exact stage and is
    caught as a CORPUS near-dup against its now-indexed winner — a
    different, equally true, but historically later reason). The
    first-ingest truth is therefore selected CHRONOLOGICALLY: every
    log row carries seq_us (log-time clock), and the view keeps the
    earliest row per doc. 'retired' is a separate lifecycle event,
    kept as its own (deduped) row."""
    log = spark.read.parquet(os.path.join(out_dir, "provenance"))
    drops = (
        log.filter(F.col("stage") != "retired")
        .groupBy("doc_id")
        # lexicographic struct-min: chronology first; the remaining
        # fields only break (practically impossible) same-microsecond
        # ties deterministically
        .agg(F.min(F.struct("seq_us", "stage", "dup_of")).alias("w"))
        .select("doc_id", F.col("w.stage").alias("stage"),
                F.col("w.dup_of").alias("dup_of"))
    )
    retired = (
        log.filter(F.col("stage") == "retired")
        .select("doc_id", "stage", "dup_of")
        .distinct()
    )
    return drops.unionByName(retired)
