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
