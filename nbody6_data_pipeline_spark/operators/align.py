"""J10 — cross-file timestamp alignment (reference loader.py:138-200).

The six raw files of a run carry slightly-jittered timestamps. The
reference aligns them by ROW INDEX: the i-th timestamp of every file
must agree within ``tolerance`` (2e-2 Myr); all are renamed to the
OUT34 reference timestamp (rounded to 2 decimals).

The alignment decision itself runs DRIVER-SIDE on the collected
per-file timestamp lists — they are bounded by (n_files x
n_snapshots) ~ thousands of floats per run, and a driver decision
avoids a chain of tiny shuffle jobs. The rename is then applied
distributively as a broadcast equi-join on the (old_time -> ref_time)
mapping — the same as-of/tolerance-alignment pattern as SURVEY §2.3
J10.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.sources.block_text import BlockTables
from nbody6_data_pipeline_spark.sources.nbody6 import NBody6Run, NBody6Runs

TOLERANCE = 2e-2  # Myr (reference loader.py:100)


def _decide_alignment(
    by_file: dict[str, list[float]],
    files: list[str],
    tolerance: float,
    allow_trim: bool,
    ctx: str = "",
) -> list[tuple[int, float]]:
    """Driver-side alignment decision for ONE run's timestamp lists:
    returns [(kept_row_index, ref_time)] or raises (loader.py:143-186).
    The lists are bounded by n_files x n_snapshots — thousands of
    floats — so this is deliberately plain Python."""
    n_rows = max((len(v) for v in by_file.values()), default=0)
    if not allow_trim:
        counts = {f: len(v) for f, v in by_file.items()}
        if len(set(counts.values())) > 1:
            raise ValueError(
                f"Timestamps count mismatch across files.{ctx} Counts: {counts}"
            )
        n_bad = sum(
            1
            for i in range(n_rows)
            if max(by_file[f][i] for f in files) - min(by_file[f][i] for f in files)
            > tolerance
        )
        if n_bad:
            raise ValueError(
                f"{n_bad} inconsistent timestamps found{ctx} (tolerance: {tolerance})."
            )
        kept = list(range(n_rows))
    else:
        kept = [
            i
            for i in range(min((len(v) for v in by_file.values()), default=0))
            if max(by_file[f][i] for f in files) - min(by_file[f][i] for f in files)
            <= tolerance
        ]
        if not kept:
            raise ValueError(
                f"No aligned timestamps found across all files{ctx} "
                f"with tolerance {tolerance}."
            )
    ref = [round(by_file["OUT34"][i], 2) for i in kept]
    if ref and ref[0] != 0.0:
        warnings.warn(f"First aligned timestamp is {ref[0]}, not 0.0.{ctx}")
    return list(zip(kept, ref))


def align_runs(
    runs: NBody6Runs,
    tolerance: float = TOLERANCE,
    allow_trim: bool = False,
) -> NBody6Runs:
    """Batched J10: unify timestamps for EVERY run in ONE collect job.

    The per-run ``align_run`` issues one collect per run — a driver
    bottleneck at thousands of runs. Here the per-(run, file) sorted
    timestamp lists are gathered with a single groupBy/collect_list
    job (small: n_runs x n_files rows), each run's alignment decision
    runs driver-side, and ONE broadcast (run_id, file, old->ref)
    mapping remaps every table."""
    parts = []
    for fname, bt in runs.tables.items():
        parts.append(
            bt.headers.select(
                F.lit(fname).alias("file"), "run_id", "time"
            ).distinct()
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    ts_rows = (
        union.groupBy("run_id", "file")
        .agg(F.sort_array(F.collect_list("time")).alias("times"))
        .collect()  # the ONE driver action for the whole batch
    )
    by_run: dict[str, dict[str, list[float]]] = {}
    for r in ts_rows:
        by_run.setdefault(r["run_id"], {})[r["file"]] = list(r["times"])

    files = list(runs.tables)
    mapping_rows = []
    for rid in sorted(by_run):
        by_file = by_run[rid]
        missing = [f for f in files if f not in by_file]
        if missing:
            raise ValueError(f"Run {rid}: no timestamps parsed for {missing}.")
        for i, ref_t in _decide_alignment(
            by_file, files, tolerance, allow_trim, ctx=f" [run {rid}]"
        ):
            for f in files:
                mapping_rows.append((rid, f, by_file[f][i], ref_t))

    spark = runs.tables["OUT34"].headers.sparkSession
    mapping = spark.createDataFrame(
        mapping_rows, "run_id string, file string, old_time double, ref_time double"
    )

    def _remap(df: DataFrame, fname: str) -> DataFrame:
        m = mapping.filter(F.col("file") == fname).select(
            F.col("run_id").alias("_m_rid"), "old_time", "ref_time"
        )
        return (
            df.join(
                F.broadcast(m),
                (df["run_id"] == m["_m_rid"]) & (df["time"] == m["old_time"]),
                "inner",
            )
            .drop("time", "old_time", "_m_rid")
            .withColumnRenamed("ref_time", "time")
        )

    aligned = {
        fname: BlockTables(
            headers=_remap(bt.headers, fname), data=_remap(bt.data, fname)
        )
        for fname, bt in runs.tables.items()
    }
    return NBody6Runs(aligned, runs.run_ids)


def align_run(
    run: NBody6Run,
    tolerance: float = TOLERANCE,
    allow_trim: bool = False,
) -> NBody6Run:
    """Return a run whose tables all carry unified OUT34 timestamps.

    strict (default): per-file timestamp counts must match and every
    row's max-min spread must be within tolerance, else ValueError
    (loader.py:143-163). trim: keep only row indices where all files
    have a timestamp within tolerance (loader.py:166-186).
    """
    # ONE job: per-file sorted timestamp lists (small).
    parts = []
    for fname, bt in run.tables.items():
        parts.append(
            bt.headers.select(
                F.lit(fname).alias("file"), F.col("time")
            ).distinct()
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    by_file: dict[str, list[float]] = {f: [] for f in run.tables}
    for r in union.collect():
        by_file[r["file"]].append(r["time"])
    for f in by_file:
        by_file[f].sort()

    files = list(run.tables)
    decided = _decide_alignment(by_file, files, tolerance, allow_trim)

    spark = run.tables["OUT34"].headers.sparkSession
    mapping_rows = [
        (f, by_file[f][i], ref_t) for f in files for i, ref_t in decided
    ]
    mapping = spark.createDataFrame(
        mapping_rows, "file string, old_time double, ref_time double"
    )

    def _remap(df: DataFrame, fname: str) -> DataFrame:
        m = mapping.filter(F.col("file") == fname).select("old_time", "ref_time")
        return (
            df.join(F.broadcast(m), df["time"] == m["old_time"], "inner")
            .drop("time", "old_time")
            .withColumnRenamed("ref_time", "time")
        )

    aligned = {
        fname: BlockTables(
            headers=_remap(bt.headers, fname), data=_remap(bt.data, fname)
        )
        for fname, bt in run.tables.items()
    }
    return NBody6Run(aligned, run.run_root)
