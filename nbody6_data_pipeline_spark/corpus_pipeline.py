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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.dedup import (
    connected_components,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_bands,
)
from nbody6_data_pipeline_spark.operators.text import token_array
from nbody6_data_pipeline_spark.queries import md5_bucket

MIN_CHARS = 120
LANGS = ("en", "de")
MIN_TOKENS = 25
NEARDUP_JACCARD = 0.8
N_SHARDS = 16


def quality_gate(docs: DataFrame) -> DataFrame:
    """Pure-filter quality gate (no shuffle)."""
    return docs.filter(
        (F.col("n_chars") >= MIN_CHARS)
        & (F.col("lang").isin(*LANGS))
        & (F.size(token_array(F.col("text"))) >= MIN_TOKENS)
    )


def tokenset_dedup(docs: DataFrame) -> DataFrame:
    """Exact + vocabulary dedup: keep the lowest doc_id per sorted
    distinct-token-set fingerprint (subsumes byte-exact dedup)."""
    fp = F.md5(
        F.concat_ws(
            " ", F.array_sort(F.array_distinct(token_array(F.lower(F.col("text")))))
        )
    )
    w = docs.select("doc_id", fp.alias("fp"))
    keep = w.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return docs.join(keep.select("doc_id"), "doc_id", "left_semi")


def neardup_dedup(docs: DataFrame) -> DataFrame:
    """MinHash-LSH candidates -> exact Jaccard verify -> connected
    components -> keep the lowest doc_id per near-dup cluster."""
    pairs = (
        jaccard_verify(
            lsh_candidate_pairs(minhash_bands(docs, F.col("text"), "doc_id")),
            docs,
            F.col("text"),
            "doc_id",
        )
        .filter(F.col("jaccard") >= NEARDUP_JACCARD)
        .select("doc_a", "doc_b")
    )
    comp = connected_components(pairs, a_col="doc_a", b_col="doc_b")
    losers = (
        comp.groupBy("comp")
        .agg(F.min("node").alias("keep"))
        .join(comp, "comp")
        .filter(F.col("node") != F.col("keep"))
        .select(F.col("node").alias("doc_id"))
    )
    return docs.join(losers, "doc_id", "left_anti")


def build_training_corpus(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict:
    """Run the full flow; returns the manifest (also written as JSON).

    Layers land under out_dir: gated/, deduped/, shards/ (partitioned
    by shard), manifest.json.
    """
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_raw = raw.count()

    gated = quality_gate(raw)
    gated.write.mode("overwrite").parquet(os.path.join(out_dir, "gated"))
    gated = spark.read.parquet(os.path.join(out_dir, "gated"))
    n_gated = gated.count()

    exact = tokenset_dedup(gated)
    near = neardup_dedup(exact)
    near.write.mode("overwrite").parquet(os.path.join(out_dir, "deduped"))
    near = spark.read.parquet(os.path.join(out_dir, "deduped"))
    n_deduped = near.count()

    sharded = near.withColumn("shard", md5_bucket(F.col("doc_id"), N_SHARDS))
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(out_dir, "shards")
    )
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
