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
from nbody6_data_pipeline_spark.sources.nbody6 import NBody6Run

TOLERANCE = 2e-2  # Myr (reference loader.py:100)


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
    n_rows = max(len(v) for v in by_file.values())

    if not allow_trim:
        counts = {f: len(v) for f, v in by_file.items()}
        if len(set(counts.values())) > 1:
            raise ValueError(
                f"Timestamps count mismatch across files. Counts: {counts}"
            )
        n_bad = sum(
            1
            for i in range(n_rows)
            if max(by_file[f][i] for f in files) - min(by_file[f][i] for f in files)
            > tolerance
        )
        if n_bad:
            raise ValueError(
                f"{n_bad} inconsistent timestamps found (tolerance: {tolerance})."
            )
        kept = list(range(n_rows))
    else:
        kept = [
            i
            for i in range(min(len(v) for v in by_file.values()))
            if max(by_file[f][i] for f in files) - min(by_file[f][i] for f in files)
            <= tolerance
        ]
        if not kept:
            raise ValueError(
                f"No aligned timestamps found across all files with tolerance {tolerance}."
            )

    ref = [round(by_file["OUT34"][i], 2) for i in kept]
    if ref and ref[0] != 0.0:
        warnings.warn(f"First aligned timestamp is {ref[0]}, not 0.0.")

    spark = run.tables["OUT34"].headers.sparkSession
    mapping_rows = [
        (f, by_file[f][i], ref[k])
        for f in files
        for k, i in enumerate(kept)
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
