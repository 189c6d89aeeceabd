"""S3-S8 — the six NBODY6 source configurations + per-run loading.

Positional schemas transcribed from the reference parser configs
(token indices and converters cited per source). Vector headers become
ArrayType columns; all ids are LONG, codes INT, physics DOUBLE
(SURVEY §1.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.sources.block_text import (
    BlockSourceConfig,
    BlockTables,
    parse_blocks,
    raise_block_violation,
    read_block_file,
    read_lines_runs,
)

# reference parser/out34.py:7-33
OUT34_CONFIG = BlockSourceConfig(
    header_prefix="#",
    header_length=1,
    header_schema={
        "time": (7, "double"),
        "nzero": (5, "int"),
        "rbar": (8, "double"),
        "vstar": (9, "double"),
        "rtide": (10, "double"),
        "plummer_mass": (12, "double"),
        "rd": ([13, 14, 15], "double"),
        "rcm": ([16, 17, 18], "double"),
        "rg": ([22, 23, 24], "double"),
        "vg": ([25, 26, 27], "double"),
    },
    data_schema={
        "x": (0, "double"),
        "y": (1, "double"),
        "z": (2, "double"),
        "vx": (3, "double"),
        "vy": (4, "double"),
        "vz": (5, "double"),
        "mass": (6, "double"),
        "name": (7, "long"),
        "kstar": (8, "int"),
    },
)

# reference parser/out9.py:5-23 (3-line header; time at concatenated idx 1)
OUT9_CONFIG = BlockSourceConfig(
    header_prefix="#",
    header_length=3,
    header_schema={
        "time": (1, "double"),
        "npairs": (2, "int"),
    },
    data_schema={
        "ecc": (3, "double"),
        "semi": (4, "double"),
        "p": (5, "double"),
        "mass1": (6, "double"),
        "mass2": (7, "double"),
        "name1": (8, "long"),
        "name2": (9, "long"),
        "cmName": (13, "long"),
    },
)

# reference parser/fort19.py:5-24
FORT19_CONFIG = BlockSourceConfig(
    header_prefix="#",
    header_length=1,
    header_schema={
        "time": (0, "double"),
        "npairs": (1, "int"),
    },
    data_schema={
        "ecc": (3, "double"),
        "semi": (4, "double"),
        "p": (5, "double"),
        "mass1": (6, "double"),
        "mass2": (7, "double"),
        "name1": (8, "long"),
        "name2": (9, "long"),
        "hiarch": (12, "int"),
    },
)

# reference parser/fort82.py:5-25 (## BEGIN / ## END delimited)
FORT82_CONFIG = BlockSourceConfig(
    header_prefix="## BEGIN",
    footer_prefix="## END",
    header_length=1,
    header_schema={"time": (1, "double")},
    data_schema={
        "name1": (0, "long"),
        "name2": (1, "long"),
        "x": (5, "double"),
        "y": (6, "double"),
        "z": (7, "double"),
        "mass1": (11, "double"),
        "mass2": (12, "double"),
        "zlum1": (13, "double"),
        "zlum2": (14, "double"),
        "rad1": (15, "double"),
        "rad2": (16, "double"),
        "tempe1": (17, "double"),
        "tempe2": (18, "double"),
    },
)

# reference parser/fort83.py:5-20
FORT83_CONFIG = BlockSourceConfig(
    header_prefix="## BEGIN",
    footer_prefix="## END",
    header_length=1,
    header_schema={"time": (1, "double")},
    data_schema={
        "name": (0, "long"),
        "x": (2, "double"),
        "y": (3, "double"),
        "z": (4, "double"),
        "mass": (5, "double"),
        "zlum": (6, "double"),
        "rad": (7, "double"),
        "tempe": (8, "double"),
    },
)

# reference parser/density_center.py:12-30 — headers-only file
# (header_prefix "": every line is its own single-line-header block)
DENS_CENTRE_CONFIG = BlockSourceConfig(
    header_prefix="",
    header_length=1,
    header_schema={
        "time": (0, "double"),
        "r_tidal": (1, "double"),
        "density_center": ([2, 3, 4], "double"),
    },
    data_schema={},
)

FILE_CONFIGS: dict[str, BlockSourceConfig] = {
    "OUT34": OUT34_CONFIG,
    "OUT9": OUT9_CONFIG,
    "fort.19": FORT19_CONFIG,
    "fort.82": FORT82_CONFIG,
    "fort.83": FORT83_CONFIG,
    "densCentre.txt": DENS_CENTRE_CONFIG,
}


class NBody6Run:
    """Parsed per-run tables (the reference's NBODY6Data, loader.py:20-51,
    flattened): one headers+data DataFrame pair per source file."""

    def __init__(self, tables: dict[str, BlockTables], run_root: str):
        self.tables = tables
        self.run_root = run_root

    def headers(self, name: str) -> DataFrame:
        return self.tables[name].headers

    def data(self, name: str) -> DataFrame:
        return self.tables[name].data


def load_run(
    spark: SparkSession, run_root: str, is_strict: bool = True
) -> NBody6Run:
    """Parse the six raw files of one simulation run
    (reference NBODY6DataLoader.__init__/load, loader.py:56-136)."""
    tables: dict[str, BlockTables] = {}
    for fname, cfg in FILE_CONFIGS.items():
        path = os.path.join(run_root, fname)
        if not os.path.isfile(path):
            raise FileNotFoundError(f"Required file '{fname}' not found in '{run_root}'.")
        tables[fname] = read_block_file(spark, path, cfg, is_strict=is_strict)
    return NBody6Run(tables, run_root)


class NBody6Runs:
    """Batched multi-run tables: one headers+data pair per file format,
    each carrying a ``run_id`` column spanning every loaded run."""

    def __init__(self, tables: dict[str, BlockTables], run_ids: list[str]):
        self.tables = tables
        self.run_ids = run_ids

    def headers(self, name: str) -> DataFrame:
        return self.tables[name].headers

    def data(self, name: str) -> DataFrame:
        return self.tables[name].data


def load_runs(
    spark: SparkSession,
    runs: list[tuple[str, str]],
    is_strict: bool = True,
    validate: bool = True,
) -> NBody6Runs:
    """Parse the six raw files of MANY runs as six batched lazy plans.

    Per file format: ONE wholeTextFiles source over every run's file
    and ONE grouped parse (windows partitioned by run_id). Structural
    validation across all runs x formats is checked in a single job —
    the per-run driver loop (2 jobs per file x 6 files x N runs)
    becomes O(1) driver actions for the whole batch.
    """
    for rid, root in runs:
        for fname in FILE_CONFIGS:
            if not os.path.isfile(os.path.join(root, fname)):
                raise FileNotFoundError(
                    f"Required file '{fname}' not found in '{root}'."
                )
    tables: dict[str, BlockTables] = {}
    all_viol = None
    for fname, cfg in FILE_CONFIGS.items():
        lines = read_lines_runs(
            spark, [(rid, os.path.join(root, fname)) for rid, root in runs]
        )
        bt = parse_blocks(
            lines, cfg, is_strict=is_strict,
            group_cols=["run_id"], defer_validation=True,
        )
        tables[fname] = bt
        v = bt.violations.select(
            F.lit(fname).alias("file"), "run_id", "bad_line", "bad_txt",
            "incomplete_header",
        )
        all_viol = v if all_viol is None else all_viol.unionByName(v)
    if validate:
        bad = all_viol.first()  # ONE job validates every run and format
        if bad is not None:
            raise_block_violation(bad)
    return NBody6Runs(tables, [rid for rid, _ in runs])
