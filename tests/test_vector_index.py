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
