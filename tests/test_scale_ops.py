"""Unit tests for the round-6 scale-infrastructure operators:
count-min sketch, bit-packed Bloom filter, Z-order layout, and SQ8
scalar quantization — the guarantees each structure advertises
(one-sided CMS error, zero Bloom false negatives, Morton locality,
SQ8 code range) verified directly, independent of the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
)
from nbody6_data_pipeline_spark.operators.similarity import (
    _quantize,
    sq8_bounds,
    sq8_codes,
)
from nbody6_data_pipeline_spark.operators.sketch import (
    CMS_D,
    CMS_W,
    cms_counters,
    cms_estimates,
)
from nbody6_data_pipeline_spark.operators.zorder import (
    ZBITS,
    morton_sql,
    zorder_bucket_stats,
)

# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_cms_estimate_one_sided_and_exact_totals(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    counters = cms_counters(e, F.col("user_id"))
    # grid accounts for every input row, D times
    total = counters.agg(F.sum("cnt")).collect()[0][0]
    assert total == e.count() * CMS_D
    # grid never exceeds D * W cells (+ up to D NULL-bucket cells)
    assert counters.count() <= CMS_D * (CMS_W + 1)
    keys = e.select("user_id").distinct().filter(F.col("user_id") < 40)
    est = cms_estimates(counters, keys, "user_id")
    exact = e.groupBy("user_id").agg(F.count("*").alias("c"))
    joined = est.join(exact, "user_id").collect()
    assert len(joined) == keys.count()
    for r in joined:  # the CMS guarantee: estimate >= truth, always
        assert r["cms_est"] >= r["c"]


def test_cms_counters_merge_and_partitioning_independent(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    whole = {
        (r["row_i"], r["bucket"]): r["cnt"]
        for r in cms_counters(e, F.col("user_id")).collect()
    }
    # partitioning independence
    repart = {
        (r["row_i"], r["bucket"]): r["cnt"]
        for r in cms_counters(e.repartition(7), F.col("user_id")).collect()
    }
    assert whole == repart
    # shard merge = counter-wise addition
    lo = cms_counters(e.filter(F.col("event_id") % 2 == 0), F.col("user_id"))
    hi = cms_counters(e.filter(F.col("event_id") % 2 == 1), F.col("user_id"))
    merged: dict = {}
    for r in lo.collect() + hi.collect():
        key = (r["row_i"], r["bucket"])
        merged[key] = merged.get(key, 0) + r["cnt"]
    assert merged == whole


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded_fp(spark, sf_dir):
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    words, nb = bloom_build(cust, "c_custkey")
    # every member passes: zero false negatives by construction
    members = bloom_probe(
        cust.withColumnRenamed("c_custkey", "k"), "k", words, nb
    )
    assert members.filter(~F.col("bloom_pass")).count() == 0
    # non-members pass at roughly the design rate (~3.1% at 8 bits/key;
    # assert a loose upper bound, not the exact rate)
    non = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") != "BUILDING")
        .select(F.col("c_custkey").alias("k"))
    )
    probed = bloom_probe(non, "k", words, nb)
    n = probed.count()
    fp = probed.filter(F.col("bloom_pass")).count()
    assert fp / max(n, 1) < 0.15
    # the filter is genuinely compressed: word count <= nb/62 + 1
    nbits = nb.collect()[0]["nb"]
    assert words.count() <= nbits // 62 + 1


def test_bloom_null_key_fails_probe(spark):
    keys = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    words, nb = bloom_build(keys, "k")
    probe = spark.createDataFrame([(1,), (None,)], "k long")
    rows = {
        r["k"]: r["bloom_pass"]
        for r in bloom_probe(probe, "k", words, nb).collect()
    }
    assert rows[1] is True
    assert rows[None] is False


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def test_morton_sql_matches_python_interleave(spark):
    # cross-check the generated arithmetic against a bit-twiddling
    # reference implementation over the full 16x16 grid
    def ref(px, py):
        m = 0
        for b in range(ZBITS):
            m |= ((px >> b) & 1) << (2 * b)
            m |= ((py >> b) & 1) << (2 * b + 1)
        return m

    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "px int, py int"
    )
    got = grid.selectExpr(
        "px", "py", f"({morton_sql('px', 'py')}) AS m"
    ).collect()
    for r in got:
        assert r["m"] == ref(r["px"], r["py"]), (r["px"], r["py"])


def test_zorder_stats_partition_rows_exactly(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    stats = zorder_bucket_stats(li, "l_partkey", "l_suppkey")
    rows = stats.collect()
    assert sum(r["n_rows"] for r in rows) == li.count()
    for r in rows:
        assert 0 <= r["bucket"] < (1 << (2 * ZBITS))
        assert r["min_x"] <= r["max_x"] and r["min_y"] <= r["max_y"]
        # Morton buckets are axis-aligned rectangles of the grid: each
        # bucket's value range spans at most one grid cell per axis
        # (grid cell width = (max+1) / 2^bits, rows within a bucket
        # share the same cell on both axes by construction)


def test_zorder_beats_linear_on_2d_predicate(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    mxr = li.agg(
        F.max("l_partkey").alias("mx"), F.max("l_suppkey").alias("my")
    ).collect()[0]
    stats = zorder_bucket_stats(li, "l_partkey", "l_suppkey").collect()
    # probe = the low quadrant of both keys
    xhi, yhi = mxr["mx"] // 2, mxr["my"] // 2
    z_rows = sum(
        r["n_rows"]
        for r in stats
        if not (r["min_x"] > xhi or r["max_y"] < 0 or r["min_y"] > yhi)
    )
    total = sum(r["n_rows"] for r in stats)
    # Z-order confines the quadrant to ~1/4 of the data; a partkey-only
    # sort would have to scan ~1/2 (every suppkey for low partkeys)
    assert z_rows < total * 0.4


# ---------------------------------------------------------------------------
# SQ8 scalar quantization
# ---------------------------------------------------------------------------


def test_sq8_codes_in_range_and_deterministic(spark, sf_dir):
    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", _quantize(F.col("embedding")).alias("vq"))
    )
    codes = sq8_codes(e, sq8_bounds(e))
    stats = codes.selectExpr(
        "array_min(code) AS lo", "array_max(code) AS hi"
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).collect()[0]
    assert stats["lo"] >= 0 and stats["hi"] <= 255
    # partitioning independence (bounds are exact MIN/MAX)
    again = sq8_codes(e.repartition(5), sq8_bounds(e.repartition(3)))
    a = {r["vec_id"]: r["code"] for r in codes.select("vec_id", "code").collect()}
    b = {r["vec_id"]: r["code"] for r in again.select("vec_id", "code").collect()}
    assert a == b


# ---------------------------------------------------------------------------
# Grid-histogram quantiles
# ---------------------------------------------------------------------------


def test_grid_quantile_bracket_contains_exact_percentile(spark, sf_dir):
    from nbody6_data_pipeline_spark.queries import registry

    rows = registry()["lineitem_grid_quantiles"]["spark"](
        spark, sf_dir
    ).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    import math

    for r in rows:
        vals = sorted(
            x["l_extendedprice"]
            for x in li.filter(
                F.col("l_returnflag") == r["l_returnflag"]
            ).collect()
            if x["l_extendedprice"] is not None
        )
        # the half-open bracket [lo, hi_excl) must contain the exact
        # lower-interpolation percentile: first value v with
        # rank >= ceil(q * n)
        idx = max(math.ceil(r["q_bp"] / 10000 * len(vals)) - 1, 0)
        exact = vals[idx]
        assert r["lo"] <= exact < r["hi_excl"], (r, exact)
        assert r["cum_n"] >= math.ceil(r["q_bp"] / 10000 * r["total_n"])


def test_grid_histogram_merges_across_shards(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_extendedprice").isNotNull()
    )

    def hist(df):
        return {
            (r["l_returnflag"], r["bin"]): r["n"]
            for r in df.groupBy(
                "l_returnflag",
                F.expr(
                    "CAST(floor(l_extendedprice / 100.0) AS BIGINT)"
                ).alias("bin"),
            )
            .agg(F.count("*").alias("n"))
            .collect()
        }

    whole = hist(li)
    lo = hist(li.filter(F.col("l_orderkey") % 2 == 0))
    hi = hist(li.filter(F.col("l_orderkey") % 2 == 1))
    merged: dict = {}
    for k, v in list(lo.items()) + list(hi.items()):
        merged[k] = merged.get(k, 0) + v
    assert merged == whole


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_ranks_are_dense_and_scores_monotone(spark, sf_dir):
    from nbody6_data_pipeline_spark.queries import registry

    rows = registry()["doc_bm25_topk"]["spark"](spark, sf_dir).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score_q6"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        # top-k docs are distinct
        assert len({r["doc_id"] for r in rs}) == len(rs)


# ---------------------------------------------------------------------------
# Streaming CMS + MinHash estimation guarantees
# ---------------------------------------------------------------------------


def test_streaming_cms_overcount_one_sided_per_window(spark, sf_dir):
    from nbody6_data_pipeline_spark.queries import registry

    rows = registry()["streaming_cms_freq"]["spark"](spark, sf_dir).collect()
    assert rows, "no windows produced"
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"] >= 1, r
        assert r["overcount"] == r["cms_est"] - r["exact_cnt"]


def test_minhash_estimate_bounds_and_columns(spark, sf_dir):
    from nbody6_data_pipeline_spark.operators.dedup import NUM_HASHES
    from nbody6_data_pipeline_spark.queries import registry

    rows = registry()["doc_minhash_jaccard_estimate"]["spark"](
        spark, sf_dir
    ).collect()
    assert rows, "no candidate pairs at sf0.001"
    for r in rows:
        assert 0 <= r["sig_agree"] <= NUM_HASHES
        assert abs(r["est_jaccard"] - r["sig_agree"] / NUM_HASHES) == 0.0
        assert 0.0 <= r["jaccard"] <= 1.0
        # LSH candidates here are near-dup shaped: the sketch estimate
        # should be informative, not random — within 0.5 of truth
        assert abs(r["est_jaccard"] - r["jaccard"]) <= 0.5, r


# ---------------------------------------------------------------------------
# KMV sketch
# ---------------------------------------------------------------------------


def test_kmv_partition_prune_equals_global_kmin(spark):
    from nbody6_data_pipeline_spark.operators.sketch import kmv_sketches

    rows = [(g, (h * 2654435761) % 1_000_003) for g in "ab" for h in range(500)]
    df = spark.createDataFrame(rows, "grp string, hv long").repartition(7)
    got = {
        (r["grp"], r["rn"]): r["hv"]
        for r in kmv_sketches(df, "grp", "hv", k=32).collect()
    }
    import itertools

    for g in "ab":
        expect = sorted({h for gg, h in rows if gg == g})[:32]
        assert [got[(g, i + 1)] for i in range(32)] == expect


def test_kmv_estimates_calibrated(spark, sf_dir):
    from nbody6_data_pipeline_spark.operators.sketch import (
        KMV_K,
        kmv_estimate,
    )
    from nbody6_data_pipeline_spark.queries import registry

    rows = registry()["events_kmv_setops"]["spark"](spark, sf_dir).collect()
    assert len(rows) == 10  # 5 choose 2 type pairs
    for r in rows:
        true_union = r["exact_a"] + r["exact_b"] - r["exact_common"]
        if r["n_union_k"] < KMV_K:
            # sketch holds the whole union: exact by construction
            assert r["n_union_k"] == true_union
            continue
        est_u = kmv_estimate(r["n_union_k"], r["kth_union_hv"], KMV_K)
        assert abs(est_u - true_union) / true_union < 0.35, r
        jac = r["n_both"] / KMV_K
        true_jac = r["exact_common"] / true_union
        assert abs(jac - true_jac) < 0.25, r


# ---------------------------------------------------------------------------
# CMS join estimate + rolling HLL merge
# ---------------------------------------------------------------------------


def test_cms_join_estimate_one_sided_and_close(spark, sf_dir):
    from nbody6_data_pipeline_spark.queries import registry

    r = registry()["lineitem_cms_join_estimate"]["spark"](
        spark, sf_dir
    ).collect()[0]
    assert r["overcount"] >= 0  # inner product >= true join size, always
    assert r["est_join_rows"] >= r["true_join_rows"] > 0
    # expected collision mass per hash row is Na * Nl / W; the min over
    # D rows should stay within a small factor of that theory bound
    na = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    nl = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    expected_overcount = na * nl / r["cms_w"]
    assert r["overcount"] < 3 * expected_overcount


def test_hll_rolling_merge_estimates_trailing_distinct(spark, sf_dir):
    from nbody6_data_pipeline_spark.operators.sketch import (
        HLL_M,
    )
    from nbody6_data_pipeline_spark.queries import event_us, registry

    rows = registry()["events_hll_rolling_distinct"]["spark"](
        spark, sf_dir
    ).collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.select("user_id", event_us(ev).alias("us")).filter(
        F.col("user_id").isNotNull() & F.col("us").isNotNull()
    )
    import math

    day_us = 86_400_000_000
    for r in rows[:5] + rows[-3:]:
        d = r["day"]
        true = (
            ev.filter(
                (F.col("us") >= (d - 6) * day_us)
                & (F.col("us") < (d + 1) * day_us)
            )
            .select("user_id")
            .distinct()
            .count()
        )
        # linear-counting estimate from the integer stats (small-range
        # regime: plenty of zero registers at test scale)
        zeros = r["zero_registers"]
        assert 0 < zeros < HLL_M
        est = HLL_M * math.log(HLL_M / zeros)
        assert abs(est - true) / max(true, 1) < 0.15, (r, true, est)


def test_grid_quantiles_parity_with_null_returnflag(spark, sf_dir, tmp_path):
    """The driver may regenerate data outside the TPC-H NOT NULL spec;
    a NULL l_returnflag group must survive the histogram-to-totals
    join exactly as in the oracle (eqNullSafe vs IS NOT DISTINCT
    FROM — a plain equi-join drops the NULL partition)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tools.check_oracle import TABLES, compare, duck_run
    from nbody6_data_pipeline_spark.queries import registry

    out = tmp_path / "sf_null_li"
    out.mkdir()
    for t in TABLES:
        shutil.copyfile(f"{sf_dir}/{t}.parquet", out / f"{t}.parquet")
    base = pq.read_table(out / "lineitem.parquet")
    row = base.slice(0, 4).to_pydict()
    row["l_returnflag"] = [None] * 4
    row["l_extendedprice"] = [1234.5, 2345.6, 99999.9, 50000.0]
    pq.write_table(
        pa.concat_tables(
            [base, pa.Table.from_pydict(row, schema=base.schema)]
        ),
        out / "lineitem.parquet",
    )
    spec = registry()["lineitem_grid_quantiles"]
    sdf = spec["spark"](spark, str(out))
    rows = [tuple(r) for r in sdf.collect()]
    duck_cols, duck_rows = duck_run(spec["oracle"], str(out))
    problems, ok = compare(rows, sdf.columns, duck_rows, duck_cols)
    assert ok, problems
    # the NULL-flag group is present with 3 quantile rows
    assert sum(1 for r in rows if r[0] is None) == 3


# ---------------------------------------------------------------------------
# Drift monitoring: PSI + KS
# ---------------------------------------------------------------------------


def test_psi_terms_finite_and_population_complete(spark, sf_dir):
    from nbody6_data_pipeline_spark.queries import registry

    rows = registry()["orders_psi_drift"]["spark"](spark, sf_dir).collect()
    assert rows
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_total = o.filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull()
    ).count()
    assert sum(r["c_early"] + r["c_late"] for r in rows) == n_total
    # smoothing keeps every term finite; PSI total is a sane magnitude
    psi = sum(r["psi_term_q6"] for r in rows) / 1e6
    assert 0.0 <= psi < 10.0


def test_ks_stat_matches_python_recomputation(spark, sf_dir):
    from nbody6_data_pipeline_spark.queries import event_us, registry

    r = registry()["lineitem_ks_drift"]["spark"](spark, sf_dir).collect()[0]
    assert 0.0 <= r["ks_stat"] <= 1.0
    assert r["d_num"] == r["ks_stat"] * r["n_early"] * r["n_late"]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = (
        li.filter(
            F.col("l_extendedprice").isNotNull()
            & F.col("l_shipdate").isNotNull()
        )
        .select(
            F.expr(
                "CAST(floor(l_extendedprice / 100.0) AS BIGINT)"
            ).alias("bin"),
            (event_us(li, "l_shipdate") < 883_612_800_000_000).alias(
                "early"
            ),
        )
        .collect()
    )
    from collections import Counter

    ce: Counter = Counter()
    cl: Counter = Counter()
    for x in rows:
        (ce if x["early"] else cl)[x["bin"]] += 1
    n1, n2 = sum(ce.values()), sum(cl.values())
    assert (n1, n2) == (r["n_early"], r["n_late"])
    cum1 = cum2 = 0
    # best starts at -1 so a zero-drift dataset (d == 0 everywhere)
    # still selects the smallest bin, matching the query's tiebreak
    best = (-1, None)
    for b in sorted(set(ce) | set(cl)):
        cum1 += ce[b]
        cum2 += cl[b]
        d = abs(cum1 * n2 - cum2 * n1)
        if d > best[0]:
            best = (d, b)
    assert best == (r["d_num"], r["d_bin"])


def test_chisq_statistic_matches_reference(spark, sf_dir):
    """The summed chi-square terms must equal the textbook
    sum-over-cells (O-E)^2/E statistic computed independently from the
    same contingency table — the check that catches SHARED algebra
    mistakes the cross-engine hash is blind to (a review pass found an
    N-inflated first version both engines agreed on)."""
    from nbody6_data_pipeline_spark.queries import registry

    rows = registry()["events_chisq_drift"]["spark"](
        spark, sf_dir
    ).collect()
    ce = {r["event_type"]: r["c_early"] for r in rows}
    cl = {r["event_type"]: r["c_late"] for r in rows}
    n_e, n_l = sum(ce.values()), sum(cl.values())
    n = n_e + n_l
    expected = 0.0
    for t in ce:
        m = ce[t] + cl[t]
        if m == 0:
            continue
        for o, rt in ((ce[t], n_e), (cl[t], n_l)):
            e = rt * m / n
            if e > 0:
                expected += (o - e) ** 2 / e
    got = sum(r["chisq_term_q6"] for r in rows) / 1e6
    assert abs(got - expected) < 1e-3 * max(expected, 1.0), (got, expected)


def test_bootstrap_ci_contains_mean_and_tightens_with_n(spark):
    """Statistical sanity of the Poisson bootstrap: each flag's 95% CI
    must bracket the point estimate, and 10x the data must yield
    SMALLER relative CI widths (the 1/sqrt(n) contraction that proves
    the replicas actually resample the data rather than echo it)."""
    from nbody6_data_pipeline_spark.queries import registry

    q = registry()["lineitem_bootstrap_ci"]["spark"]

    def widths(sf_dir):
        out = {}
        for r in q(spark, sf_dir).collect():
            assert r["ci_lo"] < r["ci_hi"]
            assert r["ci_lo"] <= r["mean_price"] <= r["ci_hi"], r
            out[r["l_returnflag"]] = (
                (r["ci_hi"] - r["ci_lo"]) / r["mean_price"]
            )
        return out

    small = widths("/root/testdata/sf0.001")
    big = widths("/root/testdata/sf0.01")
    for flag in big:
        assert big[flag] < small[flag], (flag, big[flag], small[flag])


# ---------------------------------------------------------------------------
# MinHash LSH verify-stage bucket cap (round-9: bounded verify work)
# ---------------------------------------------------------------------------


def test_minhash_bucket_cap_drops_mega_bucket_with_telemetry(spark):
    """A boilerplate template cluster larger than ``bucket_cap`` must
    be cut BEFORE pair expansion, and the Observation telemetry must
    report exactly what was dropped (no silent truncation)."""
    from pyspark.sql import Observation

    from nbody6_data_pipeline_spark.operators.dedup import (
        BANDS,
        lsh_candidate_pairs,
        minhash_bands,
    )

    # 40 exact copies of one template (every band bucket size 40)
    # plus 2 distinct docs forming no candidate pair.
    rows = [(i, "the same boilerplate template text repeated") for i in range(40)]
    rows += [(100, "a completely different document body one"),
             (101, "another unrelated document body number two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bands = minhash_bands(df, F.col("text"), "doc_id")

    # cap below the cluster: every band bucket of the template drops.
    # The result is completely EMPTY, which trips the documented Spark
    # 4.1 AQEPropagateEmptyRelation/CollectMetrics bug — exclude the
    # rule exactly as the lsh_candidate_pairs docstring prescribes.
    rule_key = "spark.sql.adaptive.optimizer.excludedRules"
    prev = spark.conf.get(rule_key, None)
    spark.conf.set(
        rule_key,
        "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation",
    )
    try:
        obs = Observation("lsh_cap")
        pairs = lsh_candidate_pairs(bands, bucket_cap=16, observation=obs)
        assert pairs.count() == 0
        m = obs.get
        assert m["band_rows"] == 42 * BANDS
        assert m["dropped_rows"] == 40 * BANDS
        assert m["dropped_buckets"] >= 1
    finally:
        if prev is None:
            spark.conf.unset(rule_key)
        else:
            spark.conf.set(rule_key, prev)

    # cap above the cluster: full 40-choose-2 candidate set survives
    pairs2 = lsh_candidate_pairs(bands, bucket_cap=512)
    assert pairs2.count() == 40 * 39 // 2


def test_minhash_bucket_cap_never_binds_on_sf_data(spark, sf_dir):
    """On the driver testdata the 512 default must be far above every
    bucket (the oracle pairs assume NO truncation at sf<=0.1)."""
    from pyspark.sql import Observation

    from nbody6_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bands = minhash_bands(docs, F.col("text"), "doc_id")
    obs = Observation("lsh_cap_sf")
    lsh_candidate_pairs(bands, observation=obs).count()
    m = obs.get
    assert m["dropped_rows"] == 0
    assert m["dropped_buckets"] == 0
