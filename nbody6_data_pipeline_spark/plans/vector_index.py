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

import math

from nbody6_data_pipeline_spark.operators.similarity import (
    CELL_ASSIGN_EXPR,
    _CELL_STRUCTS,
    _CENT_SCHEMA,
    _kmeans_fit,
    _quantize,
    _with_cents,
    exact_kmeans_cells,
)

POSTINGS = "postings"
CENTROIDS = "centroids"


def train_production_codebook(
    vectors: DataFrame,
    vec_col: str = "embedding",
    k: int | None = None,
    sample_cap: int = 20_000,
    iters: int = 15,
    seed: int = 42,
) -> list[tuple[int, list[float]]]:
    """The PRODUCTION coarse quantizer for this layout: k ~ sqrt(N)
    cells trained by driver-side Lloyd on a bounded sample — the
    build_ivf_index recipe (operators/similarity.py), retargeted at
    the persisted layout's QUANTIZED coordinate space so the trained
    centroids drop into the same centroid table, `_CELL_STRUCTS`
    assignment fold, and `ann_query_pruned` probe path as the
    exact-parity codebook (one layout, two trainers).

    Driver cost is O(sample_cap * k * iters) regardless of corpus
    size; the returned codebook is seed-deterministic for a fixed
    input (df.sample is seed-stable per partition split)."""
    n = vectors.count()
    if k is None:
        k = max(4, min(4096, math.isqrt(max(n, 1))))
    frac = min(1.0, sample_cap / max(n, 1))
    q = vectors.select(_quantize(F.col(vec_col)).alias("q"))
    sample = [list(r["q"]) for r in q.sample(fraction=frac, seed=seed).collect()]
    if len(sample) < k:  # tiny corpora: every vector is the sample
        sample = [list(r["q"]) for r in q.collect()]
    fitted = _kmeans_fit(sample, k=min(k, len(sample)), iters=iters, seed=seed)
    return [(i, [float(x) for x in row]) for i, row in enumerate(fitted)]


def _assign_cells(
    spark: SparkSession,
    vectors: DataFrame,
    cents: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(vec_id, vq, cell) for every vector: one broadcast-centroid
    argmin projection — the exact `_CELL_STRUCTS` fold every probe
    uses, so build-time and query-time assignment can never drift."""
    e = vectors.select(
        F.col(id_col).alias("vec_id"),
        _quantize(F.col(vec_col)).alias("vq"),
    )
    return (
        _with_cents(e, spark, cents)
        .withColumn("cell", F.expr(CELL_ASSIGN_EXPR))
        .select("vec_id", "vq", "cell")
    )


def build_vector_index(
    spark: SparkSession,
    vectors: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    cents: list[tuple[int, list[float]]] | None = None,
) -> dict:
    """Train the coarse quantizer and persist the index:

    - ``<out>/postings/cell=<c>/``: (vec_id, vq) posting lists,
      hive-partitioned by cell — the pruning unit.
    - ``<out>/centroids/``: the k-row codebook.

    ``cents=None`` (default) trains the exact-parity codebook
    (`exact_kmeans_cells`, pinned k — DuckDB-replayable). Pass an
    explicit codebook — e.g. `train_production_codebook`'s k~sqrt(N)
    sampled trainer — for the production path: SAME layout, same
    assignment fold, same probe code, different trainer.

    Returns a small build report {n_vectors, n_cells, max_cell_rows}
    so codebook skew is visible at write time (a cell holding half
    the corpus means probes degenerate to scans — retrain with a
    larger k before shipping such an index)."""
    if cents is None:
        cents, cells = exact_kmeans_cells(
            vectors, id_col=id_col, vec_col=vec_col, dim=dim
        )
    else:
        cells = _assign_cells(spark, vectors, cents, id_col, vec_col)
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
    # the build only writes and reports: release the corpus-sized
    # caches exact_kmeans_cells pinned (repeated retrains otherwise
    # accumulate cached copies for the session lifetime)
    for dep in getattr(cells, "_cached_deps", ()):
        dep.unpersist()
    return _cell_report(spark, out_dir)


def _cell_report(spark: SparkSession, out_dir: str) -> dict:
    # count from the WRITTEN postings (metadata-cheap scan of the
    # partition column + row counts), not the build plan — one source
    # of truth for both the trainer paths and post-upsert states
    sizes = (
        spark.read.parquet(os.path.join(out_dir, POSTINGS))
        .groupBy("cell")
        .count()
        .collect()
    )
    return {
        "n_vectors": sum(r["count"] for r in sizes),
        "n_cells": len(sizes),
        "max_cell_rows": max((r["count"] for r in sizes), default=0),
    }


def upsert_vector_index(
    spark: SparkSession,
    new_vectors: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incrementally add vectors to a persisted index WITHOUT
    retraining or rewriting existing postings: read the k-row codebook,
    assign the new vectors with the same `_CELL_STRUCTS` argmin the
    build used, and APPEND one file per touched cell directory — the
    on-disk analogue of operators/similarity.ivf_upsert. Untouched
    cell directories are not opened, so upsert cost scales with the
    delta, not the index. Probes see the union immediately (the
    posting scan lists each cell directory's files at plan time).

    After many small deltas a cell accumulates one file per upsert —
    compact with plans/layout.compact_small_files when the per-cell
    file count hurts scan startup.

    Returns the post-upsert cell report (same shape as the build's)."""
    cents = [
        (r["c_id"], list(r["cv"]))
        for r in spark.read.parquet(
            os.path.join(index_dir, CENTROIDS)
        ).collect()
    ]
    cells = _assign_cells(spark, new_vectors, cents, id_col, vec_col)
    cells.repartition("cell").sortWithinPartitions("vec_id").write.mode(
        "append"
    ).partitionBy("cell").parquet(os.path.join(index_dir, POSTINGS))
    return _cell_report(spark, index_dir)


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
