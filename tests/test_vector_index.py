"""Persisted IVF index layout: build determinism, partition-pruned
probes, and pruned-vs-full result identity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.plans.vector_index import (
    POSTINGS,
    ann_query_pruned,
    build_vector_index,
    train_production_codebook,
    upsert_vector_index,
)


@pytest.fixture(scope="module")
def index_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vidx"))
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    report = build_vector_index(spark, vecs, out)
    assert report["n_vectors"] == vecs.count()
    assert report["n_cells"] > 1
    return out


def test_layout_one_file_per_cell(spark, index_dir):
    per_cell = (
        spark.read.parquet(os.path.join(index_dir, POSTINGS))
        .select("cell", F.input_file_name().alias("f"))
        .groupBy("cell")
        .agg(F.countDistinct("f").alias("nf"))
        .collect()
    )
    assert per_cell and all(r["nf"] == 1 for r in per_cell)


def test_probe_prunes_cell_directories(spark, sf_dir, index_dir):
    post = spark.read.parquet(os.path.join(index_dir, POSTINGS))
    total_files = post.select(F.input_file_name()).distinct().count()
    cells = sorted(r["cell"] for r in post.select("cell").distinct().collect())
    probe = cells[:2]
    pruned = post.filter(F.col("cell").isin(probe))
    # PLAN-level proof: the cell predicate must land in the scan's
    # PartitionFilters (resolved before reading), not a row Filter —
    # input_file_name over surviving rows would look identical under
    # a broken full-scan-then-filter plan, so inspect the plan itself
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf_line = next(
        line for line in plan.splitlines() if "PartitionFilters" in line
    )
    assert "cell" in pf_line and pf_line.split("PartitionFilters")[1] != ": []"
    touched = pruned.select(F.input_file_name()).distinct().count()
    assert touched == len(probe) < total_files


def test_pruned_query_equals_full_scan(spark, sf_dir, index_dir):
    """The COMPLETE pruned top-k (candidates, distances, AND ranks)
    must equal the same search executed without the partition-prunable
    predicate (prune=False joins the full posting scan to the same
    probe cells) — catching ranking bugs, not just distance bugs."""
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = vecs.filter(F.col("vec_id") < 6)
    pruned = {
        (r["query_id"], r["rank"]): (r["cand_id"], r["d2"])
        for r in ann_query_pruned(spark, index_dir, q).collect()
    }
    full = {
        (r["query_id"], r["rank"]): (r["cand_id"], r["d2"])
        for r in ann_query_pruned(
            spark, index_dir, q, prune=False
        ).collect()
    }
    assert pruned, "no results"
    assert pruned == full


def test_rebuild_is_byte_identical(spark, sf_dir, tmp_path):
    """Two builds from the same input must produce BYTE-identical
    parquet postings per cell directory — the reproducibility that
    build_vector_index's sortWithinPartitions exists to guarantee
    (value-identical but byte-shuffled files would let a re-build
    invalidate downstream content-addressed caches)."""
    import glob
    import hashlib

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def file_digests(out: str) -> dict[str, str]:
        # one digest per cell directory, over the concatenated bytes of
        # its parquet files in name-sorted order (one file per cell by
        # construction, but stay robust to multi-file cells)
        digests = {}
        for cell_dir in sorted(
            glob.glob(os.path.join(out, POSTINGS, "cell=*"))
        ):
            h = hashlib.md5()
            for p in sorted(glob.glob(os.path.join(cell_dir, "*.parquet"))):
                with open(p, "rb") as f:
                    h.update(f.read())
            digests[os.path.basename(cell_dir)] = h.hexdigest()
        return digests

    results = []
    for d in ("a", "b"):
        out = str(tmp_path / d)
        build_vector_index(spark, vecs, out)
        results.append(file_digests(out))
    assert results[0], "no cell directories written"
    assert results[0] == results[1]


def _topk(spark, index_dir, q, **kw):
    return {
        (r["query_id"], r["rank"]): (r["cand_id"], r["d2"])
        for r in ann_query_pruned(spark, index_dir, q, **kw).collect()
    }


def test_production_codebook_build_prunes_identically(
    spark, sf_dir, tmp_path
):
    """The k~sqrt(N) production trainer must drop into the SAME layout
    and probe path as the exact-parity codebook: partition pruning
    fires at plan level, and the pruned top-k equals the full-scan
    top-k bit-for-bit — proving the two trainers share one search
    implementation rather than parallel code paths."""
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_production_codebook(vecs)
    # k ~ sqrt(N), not the pinned exact-parity k
    import math

    n = vecs.count()
    assert len(cents) == max(4, min(4096, math.isqrt(n)))
    out = str(tmp_path / "prod")
    report = build_vector_index(spark, vecs, out, cents=cents)
    assert report["n_vectors"] == n

    post = spark.read.parquet(os.path.join(out, POSTINGS))
    probe = sorted(r["cell"] for r in post.select("cell").distinct().collect())[:2]
    plan = (
        post.filter(F.col("cell").isin(probe))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf_line = next(
        line for line in plan.splitlines() if "PartitionFilters" in line
    )
    assert "cell" in pf_line and pf_line.split("PartitionFilters")[1] != ": []"

    q = vecs.filter(F.col("vec_id") < 6)
    pruned = _topk(spark, out, q)
    full = _topk(spark, out, q, prune=False)
    assert pruned and pruned == full


def test_upsert_equals_rebuild_on_persisted_layout(spark, sf_dir, tmp_path):
    """Appending a delta through upsert_vector_index must yield the
    same index CONTENT as one build of the full corpus under the same
    codebook: identical (cell, vec_id, vq) posting sets and identical
    probe results. (Byte identity is a single-build property — an
    upserted cell holds two files by design.)"""
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cut = vecs.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
    base, delta = (
        vecs.filter(F.col("vec_id") <= cut),
        vecs.filter(F.col("vec_id") > cut),
    )
    cents = train_production_codebook(base)

    up_dir = str(tmp_path / "up")
    build_vector_index(spark, base, up_dir, cents=cents)
    up_report = upsert_vector_index(spark, delta, up_dir)

    rb_dir = str(tmp_path / "rb")
    rb_report = build_vector_index(spark, vecs, rb_dir, cents=cents)
    assert up_report == rb_report

    def postings_set(d):
        return {
            (r["cell"], r["vec_id"], tuple(r["vq"]))
            for r in spark.read.parquet(os.path.join(d, POSTINGS)).collect()
        }

    assert postings_set(up_dir) == postings_set(rb_dir)

    q = vecs.filter(F.col("vec_id") % 97 == 3)
    assert _topk(spark, up_dir, q) == _topk(spark, rb_dir, q)
