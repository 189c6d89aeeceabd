"""Tests for queries_mining.py building blocks and invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.expectations import (
    anti_join_count,
    expectation_report,
)
from nbody6_data_pipeline_spark.queries import registry


def test_expectation_report_counts(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (None, 3.0), (4, None)],
        ["k", "v"],
    )
    rep = expectation_report(
        df,
        {
            "null_k": F.col("k").isNull(),
            "neg_v": F.col("v") < 0,
            "null_v": F.col("v").isNull(),
        },
        "t",
    ).collect()
    got = {r["check_name"]: (r["n_checked"], r["n_violations"]) for r in rep}
    assert got == {"null_k": (4, 1), "neg_v": (4, 1), "null_v": (4, 1)}
    assert all(r["table_name"] == "t" for r in rep)


def test_anti_join_count(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], ["fk"])
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    n = anti_join_count(child, parent, "fk", "pk").collect()[0]["n_violations"]
    assert n == 2  # both orphaned 9s count


def test_part_affinity_lift_math(spark, sf_dir, tmp_path):
    """Lift on a hand-built basket set: parts A,B always co-occur
    (lift > 1 x), A,C never do."""
    rows = []
    for order in range(10):
        rows.append((order, 100))  # A in every order
        rows.append((order, 200))  # B in every order
    for order in range(10, 20):
        rows.append((order, 300))  # C alone
    df = spark.createDataFrame(
        [(o, p, 1) for o, p in rows], ["l_orderkey", "l_partkey", "x"]
    )
    path = str(tmp_path / "lineitem.parquet")
    df.write.parquet(path)
    # reuse the registry query against a directory that mimics sf_dir
    import shutil

    q = registry()["part_affinity_lift"]["spark"]
    out = q(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["part_a"], r["part_b"], r["n_ab"]) == (100, 200, 10)
    # P(ab)=10/20, P(a)=P(b)=10/20 -> lift = 0.5/(0.25) = 2.0
    assert r["lift_q6"] == 2_000_000
    shutil.rmtree(path, ignore_errors=True)


def test_decayed_value_partition_invariant(spark, sf_dir):
    q = registry()["events_decayed_value"]["spark"]
    base = {tuple(r) for r in q(spark, sf_dir).collect()}
    # same query with a different session shuffle setting still equals
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        again = {tuple(r) for r in q(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == again


def test_boilerplate_detects_shared_footer(spark, tmp_path):
    footer = "this content is provided under the creative commons license"
    docs = [
        (i, f"unique text body number {i} with words. " * 3 + footer, "en", "s", 1)
        for i in range(5)
    ] + [(99, "completely unrelated document body", "en", "s", 1)]
    df = spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    q = registry()["doc_boilerplate_shingles"]["spark"]
    out = q(spark, str(tmp_path)).collect()
    assert any(footer.split()[0] in r["gram"] for r in out)
    # every reported gram is shared by >= 3 docs
    assert all(r["n_docs"] >= 3 for r in out)
    # the unique doc contributes no gram
    assert all(r["first_doc"] != 99 for r in out)


def test_label_centroids_match_numpy(spark, sf_dir):
    import numpy as np

    q = registry()["embedding_label_centroids"]["spark"]
    got = {
        (r["label"], r["dim"]): (r["n"], r["centroid"])
        for r in q(spark, sf_dir).collect()
    }
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("label", "embedding")
        .collect()
    )
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(r["embedding"])
    for label, vecs in by_label.items():
        arr = np.array(vecs, dtype=np.float64)
        for d in range(arr.shape[1]):
            n, c = got[(label, d + 1)]
            assert n == len(vecs)
            assert abs(c - arr[:, d].mean()) < 1e-6


def test_session_paths_gap_and_order(spark, tmp_path):
    """Two sessions for one user (gap > 30 min splits), paths keep
    event-time order with event_id tie-breaks."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # session 1: view -> click -> purchase -> extra (4th step cut)
        (1, base, 10, "view", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=1), 10, "click", 1.0, "{}"),
        (3, base + dt.timedelta(minutes=2), 10, "purchase", 1.0, "{}"),
        (4, base + dt.timedelta(minutes=3), 10, "error", 1.0, "{}"),
        # session 2 after 2h gap: single signup
        (5, base + dt.timedelta(hours=3), 10, "signup", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r["path"]: r["n_sessions"]
        for r in registry()["session_top_paths"]["spark"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {"view->click->purchase": 1, "signup": 1}


def test_expectation_report_rejects_bad_names(spark):
    """Quote/backtick-bearing or empty check sets must fail fast, not
    generate broken stack(...) SQL (ADVICE round 4)."""
    import pytest
    from pyspark.sql import functions as F

    from nbody6_data_pipeline_spark.operators.expectations import (
        expectation_report,
    )

    df = spark.range(3)
    with pytest.raises(ValueError, match="at least one check"):
        expectation_report(df, {}, "t")
    with pytest.raises(ValueError, match="invalid check name"):
        expectation_report(df, {"bad'name": F.col("id") > 1}, "t")
