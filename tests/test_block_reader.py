"""S1/S2 block-text reader tests against the synthetic NBODY6 fixture
files (reference semantics: parser/base.py:156-332)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.sources.block_text import (
    BlockSourceConfig,
    parse_blocks,
    read_block_file,
    read_block_file_split,
)
from nbody6_data_pipeline_spark.sources.nbody6 import (
    DENS_CENTRE_CONFIG,
    FORT82_CONFIG,
    OUT9_CONFIG,
    OUT34_CONFIG,
    load_run,
)
from tests.nbody6_fixtures import CM_NAME, R_TIDAL, STARS, TIMES, write_run


@pytest.fixture(scope="module")
def run_root(tmp_path_factory):
    return write_run(str(tmp_path_factory.mktemp("run") / "sim"))


def test_out34_blocks(spark, run_root):
    bt = read_block_file(spark, os.path.join(run_root, "OUT34"), OUT34_CONFIG)
    headers = {r["time"]: r for r in bt.headers.collect()}
    assert sorted(headers) == TIMES
    h0 = headers[0.0]
    assert h0["nzero"] == 10
    assert h0["rtide"] == R_TIDAL
    assert h0["rd"] == [1.0, 2.0, 3.0]
    assert h0["rg"] == [5.0, 6.0, 7.0]
    data = bt.data.filter("time = 0.0").collect()
    # 8 atomic stars + 1 center-of-mass particle
    assert len(data) == 9
    names = {r["name"] for r in data}
    assert CM_NAME in names and 1 not in names and 2 not in names


def test_out9_multiline_header(spark, run_root):
    bt = read_block_file(spark, os.path.join(run_root, "OUT9"), OUT9_CONFIG)
    headers = {r["time"]: r for r in bt.headers.collect()}
    # jitter 0.004 rounds away at 2 decimals
    assert sorted(headers) == TIMES
    assert headers[1.0]["npairs"] == 1
    rows = bt.data.filter("time = 1.0").collect()
    assert len(rows) == 1
    assert rows[0]["cmName"] == CM_NAME and rows[0]["name1"] == 1


def test_fort82_footer_and_lstrip(spark, run_root):
    bt = read_block_file(spark, os.path.join(run_root, "fort.82"), FORT82_CONFIG)
    headers = sorted(r["time"] for r in bt.headers.collect())
    assert headers == TIMES
    row = bt.data.filter("time = 0.0").collect()[0]
    assert (row["name1"], row["name2"]) == (1, 2)
    assert row["zlum1"] == 1.0 and row["tempe2"] == 3.8


def test_dens_centre_headers_only(spark, run_root):
    bt = read_block_file(
        spark, os.path.join(run_root, "densCentre.txt"), DENS_CENTRE_CONFIG
    )
    rows = {r["time"]: r for r in bt.headers.collect()}
    assert sorted(rows) == TIMES
    assert rows[0.0]["r_tidal"] == R_TIDAL
    assert rows[0.0]["density_center"] == [1.0, 2.0, 3.0]
    assert bt.data.count() == 0


def test_load_run_all_six(spark, run_root):
    run = load_run(spark, run_root)
    assert set(run.tables) == {
        "OUT34", "OUT9", "fort.19", "fort.82", "fort.83", "densCentre.txt",
    }
    assert run.data("fort.19").filter("time = 0.0").count() == 2


SIMPLE = BlockSourceConfig(
    header_prefix="#",
    header_length=1,
    header_schema={"time": (0, "double"), "n": (1, "int")},
    data_schema={"a": (0, "double"), "b": (1, "long")},
)


def _mk(spark, text):
    lines = spark.createDataFrame(
        [(i + 1, ln) for i, ln in enumerate(text.splitlines())],
        ["line_no", "raw"],
    )
    return lines


def test_duplicate_timestamp_last_wins(spark):
    # reference parser/base.py:217-223: duplicate ts overwrites
    bt = parse_blocks(_mk(spark, "# 1.0 1\n10.0 1\n# 1.0 1\n20.0 2\n"), SIMPLE)
    assert bt.headers.count() == 1
    rows = bt.data.collect()
    assert len(rows) == 1 and rows[0]["a"] == 20.0


def test_data_before_header_raises(spark):
    with pytest.raises(ValueError, match="Expected a header line"):
        parse_blocks(_mk(spark, "10.0 1\n# 1.0 1\n"), SIMPLE)


def test_incomplete_multiline_header_raises(spark):
    cfg = BlockSourceConfig(
        header_prefix="#",
        header_length=2,
        header_schema={"time": (0, "double")},
        data_schema={"a": (0, "double")},
    )
    with pytest.raises(ValueError, match="Incomplete header"):
        parse_blocks(_mk(spark, "# 1.0\n# x\n1.0\n# 2.0\n"), cfg)


def test_lax_mode_bad_token_null(spark):
    bt = parse_blocks(
        _mk(spark, "# 1.0 1\nBAD 7\n"), SIMPLE, is_strict=False
    )
    row = bt.data.collect()[0]
    assert row["a"] is None and row["b"] == 7


def test_strict_mode_bad_token_raises(spark):
    bt = parse_blocks(_mk(spark, "# 1.0 1\nBAD 7\n"), SIMPLE, is_strict=True)
    with pytest.raises(Exception):
        bt.data.collect()


@pytest.mark.parametrize(
    "fname,cfg",
    [
        ("OUT34", OUT34_CONFIG),
        ("OUT9", OUT9_CONFIG),
        ("fort.82", FORT82_CONFIG),
        ("densCentre.txt", DENS_CENTRE_CONFIG),
    ],
)
def test_split_reader_parity(spark, run_root, fname, cfg):
    """read_block_file_split must equal the windowed reader on every
    format — with enough partitions that blocks straddle split
    boundaries (the fixture files are dozens of lines; 7 partitions
    guarantee several blocks span partitions)."""
    path = os.path.join(run_root, fname)
    win = read_block_file(spark, path, cfg)
    spl = read_block_file_split(spark, path, cfg, min_partitions=7)
    for attr in ("headers", "data"):
        a = getattr(win, attr)
        b = getattr(spl, attr)
        assert sorted(a.columns) == sorted(b.columns)
        cols = sorted(a.columns)
        ra = sorted(map(str, a.select(*cols).collect()))
        rb = sorted(map(str, b.select(*cols).collect()))
        assert ra == rb, f"{fname} {attr} mismatch"


def test_split_reader_block_spans_partition_boundary(spark, tmp_path):
    """One block whose data lines land in a later partition than its
    header: the stitched hdr_cum must still attach them to it."""
    p = tmp_path / "big.txt"
    # one header + 40 data lines, then another block — with
    # min_partitions=8 the first block inevitably crosses splits
    body = "# 1.0 1\n" + "".join(f"{i}.0 {i}\n" for i in range(40))
    body += "# 2.0 1\n" + "".join(f"{i}.5 {i}\n" for i in range(10))
    p.write_text(body)
    bt = read_block_file_split(spark, str(p), SIMPLE, min_partitions=8)
    hdrs = {r["time"]: r["block_id"] for r in bt.headers.collect()}
    assert set(hdrs) == {1.0, 2.0}
    counts = {
        r["time"]: r["n"]
        for r in bt.data.groupBy("time").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert counts == {1.0: 40, 2.0: 10}


def test_split_reader_validation_errors(spark, tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("10.0 1\n# 1.0 1\n")
    with pytest.raises(ValueError, match="Expected a header line"):
        read_block_file_split(spark, str(p), SIMPLE, min_partitions=4)


def test_empty_lines_skipped(spark):
    bt = parse_blocks(
        _mk(spark, "\n# 1.0 1\n\n10.0 1\n\n\n# 2.0 1\n20.0 2\n\n"), SIMPLE
    )
    assert bt.headers.count() == 2
    assert bt.data.count() == 2
