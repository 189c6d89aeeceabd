"""End-to-end pipeline orchestration test: discovery -> process ->
resume skip -> output layers readable."""

from __future__ import annotations

import os

import pytest

from nbody6_data_pipeline_spark.pipeline import process_all
from nbody6_data_pipeline_spark.sources.discovery import fetch_sim_runs
from tests.nbody6_fixtures import write_run


@pytest.fixture(scope="module")
def sim_base(tmp_path_factory):
    base = tmp_path_factory.mktemp("simroot")
    write_run(str(base / "Rad04" / "zmet0014" / "M6" / "0001"))
    write_run(str(base / "Rad04" / "zmet0014" / "M6" / "0002"))
    return str(base)


def test_discovery(sim_base):
    runs = fetch_sim_runs(sim_base)
    assert len(runs) == 2
    assert runs[0].label == "Rad04-zmet0014-M6-0001"
    assert runs[1].label == "Rad04-zmet0014-M6-0002"
    assert runs[0].attrs["init_mass_lv"] == 6


def test_process_all_and_resume(spark, sim_base, tmp_path):
    out = str(tmp_path / "out")
    runs = process_all(
        spark, sim_base, out, coordinates=[(50.0, 0.0, 0.0)]
    )
    assert len(runs) == 2

    # BOTH runs' partitions must survive in every layer — a static
    # partition-overwrite would leave only the last run written.
    for layer, per_run in (
        ("overall_stats", 3),  # 3 timestamps x 1 coordinate
        ("snapshot_headers", 3),
        ("observed_stars", None),
    ):
        df = spark.read.parquet(os.path.join(out, layer))
        run_ids = {r["run_id"] for r in df.select("run_id").distinct().collect()}
        assert run_ids == {
            "Rad04-zmet0014-M6-0001",
            "Rad04-zmet0014-M6-0002",
        }, f"{layer} lost a run partition"
        if per_run is not None:
            assert df.count() == 2 * per_run

    stats = spark.read.parquet(os.path.join(out, "overall_stats"))
    r = stats.filter(stats.run_id == "Rad04-zmet0014-M6-0001").collect()[0]
    assert r["obs_x"] == 50.0
    assert r["init_mass_lv"] == 6
    assert r["n_star"] > 0

    annular = spark.read.parquet(os.path.join(out, "annular_stats"))
    assert annular.select("run_id").distinct().count() == 2

    csv_dir = os.path.join(
        out, "csv", "Rad04-zmet0014-M6-0001", "overall_stats"
    )
    assert os.path.isdir(csv_dir)

    # resume: second invocation skips (no error, same outputs)
    process_all(spark, sim_base, out, coordinates=[(50.0, 0.0, 0.0)])
    assert spark.read.parquet(os.path.join(out, "overall_stats")).count() == 6
