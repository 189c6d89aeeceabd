"""End-to-end pipeline orchestration test: discovery -> process ->
resume skip -> output layers readable."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

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


def test_batched_pipeline_matches_per_run(spark, sim_base, tmp_path):
    """process_all_batched must produce the same overall_stats rows as
    the per-run path, with O(1) driver actions for load+align."""
    from nbody6_data_pipeline_spark.pipeline import process_all_batched

    out_a = str(tmp_path / "per_run")
    out_b = str(tmp_path / "batched")
    process_all(spark, sim_base, out_a, coordinates=[(50.0, 0.0, 0.0)])
    process_all_batched(spark, sim_base, out_b, coordinates=[(50.0, 0.0, 0.0)])

    cols = None
    frames = []
    for out in (out_a, out_b):
        df = spark.read.parquet(os.path.join(out, "overall_stats"))
        if cols is None:
            cols = sorted(df.columns)
        rows = sorted(
            df.select(*[F.col(c).cast("string") for c in cols]).collect()
        )
        frames.append(rows)
    assert frames[0] == frames[1]

    headers = spark.read.parquet(os.path.join(out_b, "snapshot_headers"))
    assert headers.select("run_id").distinct().count() == 2

    # batched CSV export exists, partitioned by run_id
    csv_dir = os.path.join(out_b, "csv_batched", "overall_stats")
    assert any(
        name.startswith("run_id=") for name in os.listdir(csv_dir)
    )

    # resume: re-invocation is a no-op
    process_all_batched(spark, sim_base, out_b, coordinates=[(50.0, 0.0, 0.0)])
    assert (
        spark.read.parquet(os.path.join(out_b, "overall_stats")).count() == 6
    )


def test_align_runs_executor_side_parity(spark, sim_base):
    """The applyInPandas (executor-side) alignment decision must
    produce byte-identical aligned tables to the driver-collect path —
    same pure ``_decide_alignment``, different placement."""
    from nbody6_data_pipeline_spark.operators.align import align_runs
    from nbody6_data_pipeline_spark.sources.nbody6 import load_runs

    runs = fetch_sim_runs(sim_base)
    pairs = [(r.label, r.path) for r in runs]
    a = align_runs(load_runs(spark, pairs), executor_side=False)
    b = align_runs(load_runs(spark, pairs), executor_side=True)
    assert set(a.tables) == set(b.tables)
    for fname in a.tables:
        for part in ("headers", "data"):
            da = getattr(a.tables[fname], part)
            db = getattr(b.tables[fname], part)
            cols = sorted(da.columns)
            assert cols == sorted(db.columns), fname
            ra = sorted(
                da.select(*[F.col(c).cast("string") for c in cols]).collect()
            )
            rb = sorted(
                db.select(*[F.col(c).cast("string") for c in cols]).collect()
            )
            assert ra == rb, f"{fname}.{part} diverged"


def test_align_runs_executor_side_strict_error(spark, tmp_path, monkeypatch):
    """Strict-mode timestamp violations must still raise with the
    reference's error text when the decision runs on executors."""
    from tests import nbody6_fixtures
    from nbody6_data_pipeline_spark.operators.align import align_runs
    from nbody6_data_pipeline_spark.sources.nbody6 import load_runs

    root = str(tmp_path / "badrun")
    monkeypatch.setitem(
        nbody6_fixtures.JITTER, "OUT9", 0.5  # way past the 2e-2 tolerance
    )
    write_run(root)
    multi = load_runs(spark, [("bad", root)], validate=False)
    with pytest.raises(Exception, match="inconsistent timestamps"):
        aligned = align_runs(multi, executor_side=True)
        aligned.tables["OUT34"].headers.collect()


def test_batched_load_align_constant_driver_actions(spark, sim_base):
    """load_runs + align_runs issue a constant number of driver
    actions: the Spark job count (AQE materializes a few jobs per
    action, fixed by plan shape) must NOT grow with the run count —
    the per-run path issues ~2 actions per file per run instead."""
    from nbody6_data_pipeline_spark.operators.align import align_runs
    from nbody6_data_pipeline_spark.sources.nbody6 import load_runs

    runs = fetch_sim_runs(sim_base)
    assert len(runs) >= 2
    sc = spark.sparkContext

    def count_jobs(tag, subset):
        sc.setJobGroup(tag, "job-count probe")
        try:
            multi = load_runs(spark, [(r.label, r.path) for r in subset])
            align_runs(multi)  # plan construction + ONE collect
            return len(sc.statusTracker().getJobIdsForGroup(tag))
        finally:
            sc.setJobGroup(None, None)

    one = count_jobs("bla-1", runs[:1])
    two = count_jobs("bla-2", runs)
    # same plan shape -> same job count regardless of run count
    # (tolerance 2 for AQE's incremental take-jobs in the first())
    assert two <= one + 2


def test_batched_pipeline_lax_mode(spark, tmp_path):
    """End-to-end lax mode: a run whose pairing info references a star
    missing from the attribute catalog processes to completion with
    the offending binaries dropped (strict mode raises instead)."""
    import pytest

    from nbody6_data_pipeline_spark.pipeline import process_all_batched

    base = tmp_path / "laxroot"
    write_run(str(base / "Rad04" / "zmet0014" / "M6" / "0001"), drop_name=7)
    out_strict = str(tmp_path / "out_strict")
    with pytest.raises(Exception):
        process_all_batched(
            spark, str(base), out_strict, coordinates=[(50.0, 0.0, 0.0)],
            is_strict=True,
        )
    out = str(tmp_path / "out_lax")
    process_all_batched(
        spark, str(base), out, coordinates=[(50.0, 0.0, 0.0)],
        is_strict=False,
    )
    stats = spark.read.parquet(os.path.join(out, "overall_stats"))
    rows = stats.collect()
    assert len(rows) == 3 and all(r["n_star"] > 0 for r in rows)
