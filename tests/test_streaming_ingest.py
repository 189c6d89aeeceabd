"""foreachBatch ingest-dedup: cross-batch exactness via the parquet
fingerprint store."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Row
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.streaming.ingest import start_ingest_dedup


def _write_batch(spark, tmp_path, stream_dir, name, mtime, rows):
    spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows]
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / f"stage_{name}")
    )
    src = glob.glob(str(tmp_path / f"stage_{name}" / "part-*.parquet"))[0]
    dst = stream_dir / f"{name}.parquet"
    shutil.copy(src, dst)
    os.utime(dst, (mtime, mtime))


def test_ingest_dedup_across_batches(spark, tmp_path):
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    out = tmp_path / "ingested"

    # batch a: two distinct docs + one in-batch duplicate (normalized:
    # case/whitespace differences are the same fingerprint)
    _write_batch(
        spark, tmp_path, stream_dir, "a", 1_000_000,
        [(1, "alpha beta"), (2, "gamma"), (3, "  Alpha   BETA ")],
    )
    # batch b: cross-batch duplicate of doc 1 + a genuinely new doc
    _write_batch(
        spark, tmp_path, stream_dir, "b", 1_000_100,
        [(4, "ALPHA  beta"), (5, "delta")],
    )

    schema = spark.read.parquet(str(stream_dir)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = start_ingest_dedup(spark, stream, str(out))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    corpus = spark.read.parquet(str(out / "corpus"))
    kept = sorted(r["doc_id"] for r in corpus.collect())
    # 3 dropped in-batch, 4 dropped cross-batch
    assert kept == [1, 2, 5]

    seen = spark.read.parquet(str(out / "seen"))
    assert seen.count() == 3
    assert {r["first_doc_id"] for r in seen.collect()} == {1, 2, 5}
    # the alpha-beta fingerprint is recorded once, for doc 1
    fp_counts = (
        seen.groupBy("fingerprint").count().filter(F.col("count") > 1).count()
    )
    assert fp_counts == 0


def test_ingest_replay_idempotent(spark, tmp_path):
    """foreachBatch may re-run a batch id after crash recovery: the
    replay must REPLACE the batch's own partition (not append next to
    the crashed attempt's rows), and later batches must still dedup
    against earlier ones."""
    from pyspark.sql import Row

    from nbody6_data_pipeline_spark.streaming.ingest import (
        make_batch_processor,
    )

    out = str(tmp_path / "replayed")
    proc = make_batch_processor(out)
    b0 = spark.createDataFrame(
        [Row(doc_id=1, text="alpha"), Row(doc_id=2, text="beta")]
    )
    proc(b0, 0)
    proc(b0, 0)  # crash replay of the SAME batch id
    corpus = spark.read.parquet(f"{out}/corpus")
    assert sorted(r["doc_id"] for r in corpus.collect()) == [1, 2]
    assert spark.read.parquet(f"{out}/seen").count() == 2

    # a later batch with a cross-batch duplicate still dedups
    b1 = spark.createDataFrame(
        [Row(doc_id=3, text="ALPHA"), Row(doc_id=4, text="gamma")]
    )
    proc(b1, 1)
    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out}/corpus").collect()
    )
    assert kept == [1, 2, 4]
    # replaying batch 1 changes nothing
    proc(b1, 1)
    kept2 = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out}/corpus").collect()
    )
    assert kept2 == [1, 2, 4]


def test_streaming_neardup_corpus_ingest(spark, tmp_path):
    """Cross-BATCH near-dup: a later micro-batch's near-duplicate of a
    doc an EARLIER batch appended is caught, because each batch updates
    the corpus band/fingerprint indexes before the next one runs."""
    from nbody6_data_pipeline_spark.corpus_pipeline import (
        build_training_corpus,
    )
    from nbody6_data_pipeline_spark.streaming.ingest import (
        start_corpus_neardup_ingest,
    )

    base_text = (
        "the quick brown fox jumps over the lazy dog repeatedly "
        "while careful observers count every token in the corpus "
    ) * 3
    novel_text = (
        "an entirely different subject matter about stellar clusters "
        "and dynamic simulations with many unique words in sequence "
    ) * 3
    third_text = (
        "yet another wholly separate topic concerning orchestral music "
        "theory and the harmonic relationships between modal scales "
    ) * 3

    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        [(1, base_text, "en", "s", len(base_text))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(str(sf / "documents.parquet"))
    out = str(tmp_path / "corpus")
    build_training_corpus(spark, str(sf), out)

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()

    def batch_file(name, mtime, rows):
        df = spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in rows],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage_{name}")
        )
        src = glob.glob(str(tmp_path / f"stage_{name}" / "part-*.parquet"))[0]
        dst = stream_dir / f"{name}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (mtime, mtime))

    # batch a: near-dup of corpus doc 1 (dropped) + new doc 10 (appends)
    batch_file("a", 1_000_000, [(9, base_text + " tail bits"), (10, novel_text)])
    # batch b: near-dup of doc 10 FROM BATCH A (dropped) + new doc 20
    batch_file("b", 1_000_100, [(19, novel_text + " small tail"), (20, third_text)])

    schema = spark.read.parquet(str(stream_dir)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = start_corpus_neardup_ingest(spark, stream, out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    kept = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "shards")).collect()
    )
    assert kept == [1, 10, 20]
    # one commit-record manifest per micro-batch
    assert sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(out, "delta_manifest_*.json"))
    ) == ["delta_manifest_0.json", "delta_manifest_1.json"]
