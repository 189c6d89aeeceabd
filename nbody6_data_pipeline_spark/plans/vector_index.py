"""Persisted IVF vector index as a TABLE LAYOUT.

The missing piece between the in-memory ANN operators
(operators/similarity) and a 100 TB corpus: the index must live on
disk, and PROBING it must be a partition-pruned scan, not a full read.
This module writes the IVF posting lists as a parquet table
hive-partitioned by coarse cell (`cell=<id>/part-*.parquet`) plus a
tiny centroid table. At query time the probe cells are computed from
the centroid table alone (k rows), and the posting scan carries
`cell IN (<probed>)` — Spark prunes every non-probed cell DIRECTORY at
planning time, so a 1000-cell index answers an nprobe=2 query by
touching ~2/1000ths of the files, the exact on-disk analogue of
FAISS's inverted-list seek.

Layout choice: one directory per cell mirrors the posting-list
structure; at 100 TB each cell directory holds its own file set and
the balance across cells follows the k-means balance (the build
reports per-cell row counts so a skewed codebook is visible at write
time). Maintenance: appends must carry THIS layout's schema —
(vec_id, vq) assigned with the same exact `_CELL_STRUCTS` argmin
(`operators/similarity.ivf_upsert` shows the assignment flow, but its
in-memory postings are float-typed and numpy-assigned — re-encode
before appending here, or the bit-exact d2 contract breaks); after
many small appends, `plans/layout.compact_small_files` compacts a
cell directory in place.

Determinism: the index derives from `exact_kmeans_cells` (integer-
quantized Lloyd), so rebuilding from the same corpus yields
byte-identical postings — the property that makes the layout safely
reproducible from provenance alone.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.similarity import (
    _CELL_STRUCTS,
    _CENT_SCHEMA,
    _quantize,
    _with_cents,
    exact_kmeans_cells,
)

POSTINGS = "postings"
CENTROIDS = "centroids"


def build_vector_index(
    spark: SparkSession,
    vectors: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> dict:
    """Train the coarse quantizer and persist the index:

    - ``<out>/postings/cell=<c>/``: (vec_id, vq) posting lists,
      hive-partitioned by cell — the pruning unit.
    - ``<out>/centroids/``: the k-row codebook.

    Returns a small build report {n_vectors, n_cells, max_cell_rows}
    so codebook skew is visible at write time (a cell holding half
    the corpus means probes degenerate to scans — retrain with a
    larger k before shipping such an index)."""
    cents, cells = exact_kmeans_cells(
        vectors, id_col=id_col, vec_col=vec_col, dim=dim
    )
    postings = cells.select("vec_id", "vq", "cell")
    # repartition BY CELL before the partitioned write: every cell's
    # postings land in one task, so each cell directory holds one
    # file instead of one-per-shuffle-partition (a 32-task write
    # otherwise scatters ~32 small files into every cell — the
    # small-file problem at birth). sortWithinPartitions fixes the
    # intra-file row order: shuffle blocks arrive in nondeterministic
    # fetch order on a real cluster, so without the sort two builds
    # of the same corpus produce value-identical but byte-different
    # files — breaking the byte-level reproducibility this layout
    # advertises.
    postings.repartition("cell").sortWithinPartitions(
        "vec_id"
    ).write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(out_dir, POSTINGS)
    )
    spark.createDataFrame(cents, _CENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, CENTROIDS))
    sizes = postings.groupBy("cell").count().collect()
    # the build only writes and reports: release the corpus-sized
    # caches exact_kmeans_cells pinned (repeated retrains otherwise
    # accumulate cached copies for the session lifetime)
    for dep in getattr(cells, "_cached_deps", ()):
        dep.unpersist()
    return {
        "n_vectors": sum(r["count"] for r in sizes),
        "n_cells": len(sizes),
        "max_cell_rows": max((r["count"] for r in sizes), default=0),
    }


def ann_query_pruned(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
    topk: int = 3,
    prune: bool = True,
) -> DataFrame:
    """Top-k ANN against the persisted index with partition pruning.

    Probe-cell selection touches ONLY the k-row centroid table; the
    posting scan then carries an `isin` over the probed cells — a
    partition-column predicate Spark resolves at planning time, so
    non-probed cell directories are never listed or read (verified by
    input_file_name in tests). The query batch is broadcast into the
    cell-equi-join; distances are the exact integer folds of the
    in-memory operators, so pruned results are bit-identical to a
    full-scan evaluation.

    Returns (query_id, cand_id, d2, rank <= topk)."""
    from pyspark.sql import Window as W

    cents = [
        (r["c_id"], list(r["cv"]))
        for r in spark.read.parquet(
            os.path.join(index_dir, CENTROIDS)
        ).collect()
    ]
    probe_expr = (
        f"transform(slice(array_sort({_CELL_STRUCTS}), 1, {int(nprobe)}),"
        " s -> s.c_id)"
    )
    q = (
        _with_cents(
            queries.select(
                F.col(id_col).alias("query_id"),
                _quantize(F.col(vec_col)).alias("vq"),
            ),
            spark,
            cents,
        )
        .select(
            "query_id",
            F.col("vq").alias("qv"),
            F.explode(F.expr(probe_expr)).alias("cell"),
        )
        # |queries| * nprobe rows: checkpoint so the probe assignment
        # (quantize + centroid fold) evaluates ONCE — it is read twice
        # below (cell collect + the scoring join)
        .localCheckpoint()
    )
    # bounded driver collect — the price of turning the probe into a
    # PLANNING-time partition filter
    probe_cells = sorted(
        {r["cell"] for r in q.select("cell").distinct().collect()}
    )
    postings = spark.read.parquet(os.path.join(index_dir, POSTINGS))
    if prune:
        postings = postings.filter(F.col("cell").isin(probe_cells))
    else:
        # verification path: same candidate set via a JOIN on the
        # probed cells (no partition-prunable predicate), so tests can
        # prove pruned == unpruned bit-for-bit
        postings = postings.join(
            F.broadcast(
                spark.createDataFrame(
                    [(c,) for c in probe_cells], "cell long"
                )
            ),
            "cell",
        )
    scored = (
        postings.join(F.broadcast(q), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.expr(
                "aggregate(zip_with(qv, vq, (x, y) -> (x-y)*(x-y)), "
                "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("d2"),
        )
    )
    w = W.partitionBy("query_id").orderBy("d2", "cand_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= topk)
    )
