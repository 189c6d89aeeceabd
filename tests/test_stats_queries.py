"""Unit tests for the analytical-statistics queries (queries_stats.py):
skyline dominance verified against a brute-force all-pairs check,
CUSUM against an independent Python recomputation, Gini against a
numpy-free exact formula replay, and the bigram LM against hand
probability arithmetic — all independent of the DuckDB oracle gate.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.queries_stats import (
    q_doc_lm_perplexity,
    q_events_cusum_changepoint,
    q_events_gini_concentration,
    q_part_skyline_pareto,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier
# ---------------------------------------------------------------------------


def test_skyline_matches_bruteforce(spark):
    pts = [
        (r.price, r.size)
        for r in spark.read.parquet(f"{SF}/part.parquet")
        .filter(F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull())
        .select(
            F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
        )
        .collect()
    ]
    dominated = set()
    distinct = set(pts)
    for p in distinct:
        for q in distinct:
            if (
                q[0] <= p[0]
                and q[1] >= p[1]
                and (q[0] < p[0] or q[1] > p[1])
            ):
                dominated.add(p)
                break
    want = {
        (p, s): sum(1 for x in pts if x == (p, s))
        for (p, s) in distinct - dominated
    }
    got = {
        (r.price, r.size): r.n_parts
        for r in q_part_skyline_pareto(spark, SF).collect()
    }
    assert got == want


def test_skyline_points_mutually_nondominating(spark):
    rows = q_part_skyline_pareto(spark, SF).collect()
    # ordered by price: sizes must be strictly increasing (otherwise a
    # cheaper point with >= size would dominate)
    prices = [r.price for r in rows]
    sizes = [r.size for r in rows]
    assert prices == sorted(prices)
    assert all(b > a for a, b in zip(sizes, sizes[1:]))


# ---------------------------------------------------------------------------
# CUSUM changepoint
# ---------------------------------------------------------------------------


def test_cusum_matches_python_recompute(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("ts").isNotNull()
    )
    from nbody6_data_pipeline_spark.queries import event_us

    hrs = [
        (r.hr, r.c)
        for r in ev.select(
            F.floor(event_us(ev) / F.lit(3600000000.0)).cast("long").alias("hr")
        )
        .groupBy("hr")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("hr")
        .collect()
    ]
    m = len(hrs)
    tm = sum(c for _, c in hrs)
    best = None
    tk = 0
    for k, (hr, c) in enumerate(hrs, start=1):
        tk += c
        if k >= m:
            break
        d = abs(m * tk - k * tm)
        # argmax, ties broken by smaller hour (scan order)
        if best is None or d > best[0]:
            best = (d, hr, k, tk)
    row = q_events_cusum_changepoint(spark, SF).collect()[0]
    assert row.n_bins == m
    assert row.change_hr == best[1]
    assert row.cusum_stat == best[0] / (m * tm)
    assert row.pre_mean == best[3] / best[2]
    assert row.post_mean == (tm - best[3]) / (m - best[2])


def test_cusum_detects_planted_shift(spark):
    # 20 quiet hours then 10 loud hours: the argmax must land on the
    # boundary
    rows = [(h, i) for h in range(20) for i in range(5)] + [
        (h, i) for h in range(20, 30) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "hr: long, i: long")
    bins = df.groupBy("hr").agg(F.count(F.lit(1)).alias("c")).collect()
    m = len(bins)
    tm = sum(r.c for r in bins)
    tk, best = 0, None
    for k, r in enumerate(sorted(bins, key=lambda r: r.hr), start=1):
        tk += r.c
        if k >= m:
            break
        d = abs(m * tk - k * tm)
        if best is None or d > best[0]:
            best = (d, r.hr)
    assert best[1] == 19  # last quiet hour = changepoint


# ---------------------------------------------------------------------------
# Gini concentration
# ---------------------------------------------------------------------------


def test_gini_matches_exact_formula(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    per_user = (
        ev.groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(30,6)")).alias("x"))
        .collect()
    )
    xs = sorted(
        (int(r.x * 1_000_000), r.user_id) for r in per_user
    )  # micro-units, user tiebreak
    n = len(xs)
    sx = sum(x for x, _ in xs)
    sxi = sum(i * x for i, (x, _) in enumerate(xs, start=1))
    want = (2 * sxi - (n + 1) * sx) / (n * sx)
    row = q_events_gini_concentration(spark, SF).collect()[0]
    assert row.n_users == n
    assert row.gini == want
    assert abs(row.total_value - sx / 1e6) < 1e-6


def test_gini_bounds_uniform_and_concentrated(spark):
    # equal masses -> G ~ 0; one user owns everything -> G -> 1-1/n
    eq = spark.createDataFrame(
        [(u, 10.0) for u in range(50)], "user_id: long, value: double"
    )
    conc = spark.createDataFrame(
        [(0, 1000.0)] + [(u, 0.001) for u in range(1, 50)],
        "user_id: long, value: double",
    )

    def gini(df):
        rows = sorted(
            (float(r.v), r.user_id)
            for r in df.groupBy("user_id")
            .agg(F.sum("value").alias("v"))
            .collect()
        )
        n = len(rows)
        sx = sum(x for x, _ in rows)
        sxi = sum(i * x for i, (x, _) in enumerate(rows, start=1))
        return (2 * sxi - (n + 1) * sx) / (n * sx)

    assert abs(gini(eq)) < 1e-12
    assert gini(conc) > 0.95


# ---------------------------------------------------------------------------
# Bigram LM perplexity
# ---------------------------------------------------------------------------


def test_lm_nll_hand_arithmetic(spark):
    # A corpus small enough to hand-score: train on src1's single doc,
    # score a doc made entirely of unseen bigrams vs a doc that
    # replays the training text.
    docs = spark.createDataFrame(
        [
            (1, "a b a b a c", "src1"),
            (2, "a b a b a c", "src9"),  # in-domain replay
            (3, "z q z q z q", "src9"),  # fully out-of-domain
        ],
        "doc_id: long, text: string, source: string",
    )
    docs.write.mode("overwrite").parquet("/tmp/lm_toy/documents.parquet")
    out = {
        r.source: r
        for r in q_doc_lm_perplexity(spark, "/tmp/lm_toy").collect()
    }
    # train bigrams: (a,b)x2 (b,a)x2 (a,c)x1; unigram starts: a=3 b=2;
    # V=2
    def lp(c2, c1, v=2):
        return math.floor(math.log((c2 + 1) / (c1 + v)) * 1e6 + 0.5)

    nll_replay = -(2 * lp(2, 3) + 2 * lp(2, 2) + lp(1, 3))
    nll_oov = -5 * lp(0, 0)
    assert out["src1"].corpus_avg_nll == nll_replay / (5 * 1e6)
    src9 = out["src9"]
    assert src9.n_docs == 2
    assert src9.corpus_avg_nll == (nll_replay + nll_oov) / (10 * 1e6)
    # flag rule replayed by hand: avg NLL > 8.0 <=> nll_q6 > 8e6 * n.
    # With V=2 the Laplace floor is ln(1/2) ~ 0.69/bigram, so neither
    # doc flags here (the threshold targets real vocabularies); the
    # flag column itself is exercised against real data by the oracle
    # gate.
    assert src9.n_flagged == sum(
        1 for nll, n in ((nll_replay, 5), (nll_oov, 5)) if nll > 8_000_000 * n
    )
    assert out["src1"].n_flagged == (1 if nll_replay > 8_000_000 * 5 else 0)
    # and the OOV doc is strictly worse than the in-domain replay
    assert nll_oov > nll_replay


def test_lm_out_of_domain_scores_worse(spark):
    rows = q_doc_lm_perplexity(spark, SF).collect()
    by_src = {r.source: r for r in rows}
    # the training slice scores itself no worse than the corpus mean
    train_nll = [
        by_src[s].corpus_avg_nll
        for s in ("src1", "src2", "src3")
        if s in by_src
    ]
    others = [
        r.corpus_avg_nll
        for r in rows
        if r.source not in ("src1", "src2", "src3")
    ]
    assert train_nll and others
    assert min(train_nll) < max(others)
    # every NLL is positive and finite
    assert all(r.corpus_avg_nll > 0 and math.isfinite(r.corpus_avg_nll) for r in rows)


# ---------------------------------------------------------------------------
# RRF hybrid retrieval
# ---------------------------------------------------------------------------


def test_rrf_fusion_arithmetic_and_ordering(spark):
    from nbody6_data_pipeline_spark.queries_stats import (
        RRF_K,
        RRF_L,
        RRF_SCALE,
        RRF_TOPK,
        q_doc_rrf_hybrid_retrieval,
    )

    rows = q_doc_rrf_hybrid_retrieval(spark, SF).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        # the fused score IS the integer RRF of the two leg ranks
        want = 0
        if r.bm25_rank is not None:
            assert 1 <= r.bm25_rank <= RRF_L
            want += RRF_SCALE // (RRF_K + r.bm25_rank)
        if r.cos_rank is not None:
            assert 1 <= r.cos_rank <= RRF_L
            want += RRF_SCALE // (RRF_K + r.cos_rank)
        assert r.rrf == want
        assert r.bm25_rank is not None or r.cos_rank is not None
    for q, lst in by_q.items():
        lst.sort(key=lambda r: r.fused_rank)
        assert len(lst) <= RRF_TOPK
        assert [r.fused_rank for r in lst] == list(range(1, len(lst) + 1))
        # fused_rank respects (rrf desc, doc_id) total order
        keys = [(-r.rrf, r.doc_id) for r in lst]
        assert keys == sorted(keys)


def test_rrf_deterministic_across_runs(spark):
    from nbody6_data_pipeline_spark.queries_stats import (
        q_doc_rrf_hybrid_retrieval,
    )

    a = [tuple(r) for r in q_doc_rrf_hybrid_retrieval(spark, SF).collect()]
    b = [tuple(r) for r in q_doc_rrf_hybrid_retrieval(spark, SF).collect()]
    assert a == b


# ---------------------------------------------------------------------------
# Decile lift
# ---------------------------------------------------------------------------


def test_decile_lift_invariants(spark):
    from nbody6_data_pipeline_spark.queries_stats import (
        _LIFT_N,
        q_lineitem_decile_lift,
    )

    rows = sorted(
        q_lineitem_decile_lift(spark, SF).collect(), key=lambda r: r.bin
    )
    assert [r.bin for r in rows] == list(range(1, _LIFT_N + 1))
    tot = sum(r.n for r in rows)
    # NTILE splits sizes within 1 of each other
    assert max(r.n for r in rows) - min(r.n for r in rows) <= 1
    # cumulative capture from the top decile down: bin 1 (last added)
    # covers everything exactly
    assert rows[0].cum_capture == 1.0
    assert rows[0].cum_lift == 1.0
    # capture decreases as bins are excluded (revenue is positive)
    caps = [r.cum_capture for r in rows]
    assert all(a > b for a, b in zip(caps, caps[1:]))
    # per-decile revenue (exact e4 integers) reconciles with the
    # cumulative total
    total_rev = sum(r.revenue_e4 for r in rows)
    assert total_rev == round(rows[0].cum_capture * total_rev)
    assert tot > 0


def test_decile_lift_stable_under_duplicate_keys(spark):
    # rows tied on every sort column carry equal revenue, so per-bin
    # sums are invariant however the engine orders the tied rows
    from nbody6_data_pipeline_spark.queries_stats import (
        q_lineitem_decile_lift,
    )

    a = [tuple(r) for r in q_lineitem_decile_lift(spark, SF).collect()]
    b = [tuple(r) for r in q_lineitem_decile_lift(spark, SF).collect()]
    assert a == b


# ---------------------------------------------------------------------------
# A/B test
# ---------------------------------------------------------------------------


def test_ab_test_matches_python_recompute(spark):
    import hashlib

    from nbody6_data_pipeline_spark.queries_stats import (
        _AB_CONV_THRESH,
        q_events_ab_test,
    )
    from decimal import Decimal

    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("user_id").isNotNull()
    )
    per_user = {}
    for r in ev.select("user_id", "event_type", "value").collect():
        v = per_user.setdefault(r.user_id, Decimal(0))
        if r.event_type == "purchase" and r.value is not None:
            per_user[r.user_id] = v + Decimal(str(round(r.value, 6)))
    n = {0: 0, 1: 0}
    conv = {0: 0, 1: 0}
    for uid, pv in per_user.items():
        h = hashlib.md5(str(uid).encode()).hexdigest()[:15]
        arm = int(h, 16) % 2
        n[arm] += 1
        conv[arm] += 1 if pv > _AB_CONV_THRESH else 0
    rows = q_events_ab_test(spark, SF).collect()
    assert len(rows) == 1
    row = rows[0]
    assert (row.n_a, row.n_b) == (n[0], n[1])
    assert (row.conv_a, row.conv_b) == (conv[0], conv[1])
    pa, pb = conv[0] / n[0], conv[1] / n[1]
    pp = (conv[0] + conv[1]) / (n[0] + n[1])
    import math

    z = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / n[0] + 1.0 / n[1]))
    assert row.p_a == pa and row.p_b == pb
    assert abs(row.z_score - z) < 1e-12
    assert abs(row.rel_lift - (pb - pa) / pa) < 1e-12


def test_ab_test_interior_rates(spark):
    from nbody6_data_pipeline_spark.queries_stats import q_events_ab_test

    row = q_events_ab_test(spark, SF).collect()[0]
    # the threshold metric must not saturate (the degenerate case the
    # guard excludes entirely)
    assert 0 < row.conv_a < row.n_a or 0 < row.conv_b < row.n_b


# ---------------------------------------------------------------------------
# Kaplan-Meier survival
# ---------------------------------------------------------------------------


def test_km_matches_python_product_limit(spark):
    from nbody6_data_pipeline_spark.queries import event_us
    from nbody6_data_pipeline_spark.queries_stats import (
        _KM_CHURN_GAP_DAYS,
        _KM_DAY_US,
        q_events_km_survival,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    per_user = (
        ev.select("user_id", event_us(ev).alias("us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("f"), F.max("us").alias("l"))
        .collect()
    )
    end = max(r.l for r in per_user)
    lts = [
        (
            (r.l - r.f) // _KM_DAY_US,
            1 if (end - r.l) > _KM_CHURN_GAP_DAYS * _KM_DAY_US else 0,
        )
        for r in per_user
    ]
    days = sorted({t for t, _ in lts})
    rows = {r.t_day: r for r in q_events_km_survival(spark, SF).collect()}
    assert sorted(rows) == days
    at_risk = len(lts)
    log_q6 = 0
    dead = False
    for t in days:
        d = sum(1 for lt, ch in lts if lt == t and ch == 1)
        c = sum(1 for lt, ch in lts if lt == t and ch == 0)
        r = rows[t]
        assert (r.n_risk, r.n_churn, r.n_censor) == (at_risk, d, c)
        if d >= at_risk:
            dead = True
        elif d > 0:
            log_q6 += math.floor(math.log(1.0 - d / at_risk) * 1e6 + 0.5)
        want = (
            0 if dead else math.floor(math.exp(log_q6 / 1e6) * 1e6 + 0.5)
        )
        assert r.survival_q6 == want
        at_risk -= d + c
    # survival is monotone non-increasing and starts <= 1
    ordered_s = [rows[t].survival_q6 for t in days]
    assert all(a >= b for a, b in zip(ordered_s, ordered_s[1:]))
    assert ordered_s[0] <= 1_000_000


# ---------------------------------------------------------------------------
# First-touch attribution
# ---------------------------------------------------------------------------


def test_attribution_matches_python_recompute(spark):
    from decimal import Decimal

    from nbody6_data_pipeline_spark.queries import event_us
    from nbody6_data_pipeline_spark.queries_stats import (
        q_events_first_touch_attribution,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    recs = ev.select(
        "user_id", "event_id", "event_type", "value",
        event_us(ev).alias("us"),
    ).collect()
    first = {}
    pv = {}
    for r in recs:
        key = (r.us, r.event_id if r.event_id is not None else float("inf"))
        if r.user_id not in first or key < first[r.user_id][0]:
            first[r.user_id] = (key, r.event_type)
        if r.event_type == "purchase":
            pv[r.user_id] = pv.get(r.user_id, Decimal(0)) + Decimal(
                str(round(r.value, 6)) if r.value is not None else "0"
            )
    chan = {}
    for uid, (_, ch) in first.items():
        n, conv, val = chan.get(ch, (0, 0, Decimal(0)))
        v = pv.get(uid, Decimal(0))
        chan[ch] = (n + 1, conv + (1 if v > 0 else 0), val + v)
    rows = q_events_first_touch_attribution(spark, SF).collect()
    total = sum(v for _, _, v in chan.values())
    assert {r.channel for r in rows} == set(chan)
    for r in rows:
        n, conv, val = chan[r.channel]
        assert (r.n_users, r.n_converted) == (n, conv)
        assert abs(r.attributed_value - float(val)) < 1e-6
        assert abs(r.value_share - float(val) / float(total)) < 1e-12
    assert abs(sum(r.value_share for r in rows) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# Seasonal index
# ---------------------------------------------------------------------------


def test_seasonal_index_recompute(spark):
    from decimal import Decimal

    from nbody6_data_pipeline_spark.queries_stats import (
        q_orders_seasonal_index,
    )

    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(
            F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            (F.dayofweek("o_orderdate") - 1).alias("dow"), "o_totalprice"
        )
        .collect()
    )
    per = {}
    for r in o:
        n, v = per.get(r.dow, (0, Decimal(0)))
        per[r.dow] = (n + 1, v + Decimal(str(round(r.o_totalprice, 6))))
    tot_n = sum(n for n, _ in per.values())
    tot_v = sum(v for _, v in per.values())
    rows = q_orders_seasonal_index(spark, SF).collect()
    assert {r.dow for r in rows} == set(per)
    for r in rows:
        n, v = per[r.dow]
        assert r.n_orders == n
        assert abs(r.revenue - float(v)) < 1e-6
        want = (float(v) / n) / (float(tot_v) / tot_n)
        assert abs(r.seasonal_index - want) < 1e-9
    # indexes average ~1 when weighted by order count
    wavg = sum(r.seasonal_index * r.n_orders for r in rows) / tot_n
    assert abs(wavg - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# A/B power analysis
# ---------------------------------------------------------------------------


def test_ab_power_formula(spark):
    import math

    from nbody6_data_pipeline_spark.queries_stats import (
        q_events_ab_power,
        q_events_ab_test,
    )

    rows = q_events_ab_power(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    # baseline rate reconciles with the A/B test's own arm totals
    ab = q_events_ab_test(spark, SF).collect()[0]
    assert r.n_users == ab.n_a + ab.n_b
    assert r.n_conv == ab.conv_a + ab.conv_b
    # formula replay: alpha=0.05 two-sided, power=0.80, MDE=0.02
    za, zb, mde = 1.959963984540054, 0.8416212335729143, 0.02
    p0 = r.n_conv / r.n_users
    p1 = p0 + mde
    want = math.ceil(
        ((za + zb) * (za + zb))
        * (p0 * (1.0 - p0) + p1 * (1.0 - p1))
        / (mde * mde)
    )
    assert r.required_n_per_arm == want
    assert r.currently_powered == (1 if want <= r.n_users / 2 else 0)
    # sanity: a 2-point MDE at interior rates needs thousands per arm
    assert r.required_n_per_arm > 1000


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------


def test_rfm_segments_partition_customers(spark):
    from nbody6_data_pipeline_spark.queries_stats import (
        _RFM_N,
        q_orders_rfm_segmentation,
    )

    rows = q_orders_rfm_segmentation(spark, SF).collect()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(
            F.col("o_custkey").isNotNull()
            & F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        seg = r.segment
        rq, fq, mq = seg // 100, (seg // 10) % 10, seg % 10
        assert 1 <= rq <= _RFM_N and 1 <= fq <= _RFM_N and 1 <= mq <= _RFM_N
        assert abs(r.avg_monetary - r.total_monetary / r.n_customers) < 1e-9


def test_rfm_monetary_quintile_ordering(spark):
    # customers in a higher m-quintile have, in aggregate, higher
    # average monetary value than those in a lower one
    from nbody6_data_pipeline_spark.queries_stats import (
        q_orders_rfm_segmentation,
    )

    rows = q_orders_rfm_segmentation(spark, SF).collect()
    by_m = {}
    for r in rows:
        m = r.segment % 10
        tot, n = by_m.get(m, (0.0, 0))
        by_m[m] = (tot + r.total_monetary, n + r.n_customers)
    avgs = {m: t / n for m, (t, n) in by_m.items()}
    ms = sorted(avgs)
    assert all(avgs[a] < avgs[b] for a, b in zip(ms, ms[1:]))


# ---------------------------------------------------------------------------
# Simpson diversity
# ---------------------------------------------------------------------------


def test_simpson_matches_python_recompute(spark):
    import re
    from collections import Counter

    from nbody6_data_pipeline_spark.queries_stats import (
        q_doc_simpson_diversity,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("source", "text")
        .collect()
    )
    per = {}
    for r in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t]
        per.setdefault(r.source, Counter()).update(toks)
    rows = q_doc_simpson_diversity(spark, SF).collect()
    assert {r.source for r in rows} == {
        s for s, c in per.items() if sum(c.values()) > 0
    }
    for r in rows:
        c = per[r.source]
        n = sum(c.values())
        sum_c2 = sum(v * v for v in c.values())
        assert r.n_tokens == n
        assert r.vocab_size == len(c)
        assert r.simpson == sum_c2 / (float(n) * float(n))
        assert r.effective_vocab == (float(n) * float(n)) / sum_c2
        # bounds: 1/vocab <= simpson <= 1; effective <= vocab
        assert 1.0 / len(c) <= r.simpson <= 1.0
        assert r.effective_vocab <= r.vocab_size + 1e-9


# ---------------------------------------------------------------------------
# Zipf fit
# ---------------------------------------------------------------------------


def test_zipf_matches_python_ols(spark):
    import re
    from collections import Counter

    from nbody6_data_pipeline_spark.queries_stats import (
        _ZIPF_K,
        q_doc_zipf_fit,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("text")
        .collect()
    )
    c = Counter()
    for r in docs:
        c.update(t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t)
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_K]
    pts = [
        (
            math.floor(math.log(rk) * 1e6 + 0.5),
            math.floor(math.log(cnt) * 1e6 + 0.5),
        )
        for rk, (_, cnt) in enumerate(top, start=1)
    ]
    n = float(len(pts))
    sx = sum(x for x, _ in pts) / 1e6
    sy = sum(y for _, y in pts) / 1e6
    sxx = sum(x * x for x, _ in pts) / 1e12
    syy = sum(y * y for _, y in pts) / 1e12
    sxy = sum(x * y for x, y in pts) / 1e12
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    row = q_doc_zipf_fit(spark, SF).collect()[0]
    assert row.n_terms == len(pts)
    assert row.slope_q6 == math.floor(slope * 1e6 + 0.5)
    assert row.r2_q6 == math.floor(r2 * 1e6 + 0.5)
    # a frequency-ranked distribution always slopes down; the
    # synthetic word-salad corpus is deliberately NON-Zipfian
    # (near-uniform token draws), so the fit explains little variance
    # — exactly the signal the telemetry exists to surface
    assert row.slope_q6 < 0
    assert 0 <= row.r2_q6 <= 1_000_000


# ---------------------------------------------------------------------------
# Benford audit
# ---------------------------------------------------------------------------


def test_benford_digits_and_terms(spark):
    from nbody6_data_pipeline_spark.queries_stats import (
        _BENFORD_P,
        q_lineitem_benford_check,
    )

    rows = q_lineitem_benford_check(spark, SF).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(
            F.col("l_extendedprice").isNotNull()
            & (F.col("l_extendedprice") >= 1)
        )
        .select("l_extendedprice")
        .collect()
    )
    from collections import Counter
    from decimal import Decimal

    want = Counter(
        str(
            Decimal(str(round(r.l_extendedprice, 6))).quantize(
                Decimal("0.000001")
            )
        )[0]
        for r in li
    )
    n = sum(want.values())
    for r in rows:
        assert r.n_obs == want.get(str(r.digit), 0)
        p = float(_BENFORD_P[r.digit])
        assert r.benford_p == p
        term = (r.n_obs - n * p) ** 2 / (n * p)
        assert r.chisq_term_q6 == math.floor(term * 1e6 + 0.5)
    # probabilities are a complete distribution
    assert abs(sum(float(v) for v in _BENFORD_P.values()) - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# Mann-Whitney U drift
# ---------------------------------------------------------------------------


def test_mannwhitney_matches_python_recompute(spark):
    """Full independent recomputation: tie-averaged ranks, U statistic
    and tie-corrected z from the raw rows, compared to the query's
    exact-integer formulation (doubled ranks / 128-bit sums)."""
    from nbody6_data_pipeline_spark.queries_stats import (
        _MW_SPLIT_US,
        q_lineitem_mannwhitney_drift,
    )

    rows = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(
            F.col("l_quantity").isNotNull() & F.col("l_shipdate").isNotNull()
        )
        .select(
            F.col("l_quantity").cast("bigint").alias("q"),
            (
                F.unix_micros(
                    F.col("l_shipdate").cast("timestamp")
                ) < _MW_SPLIT_US
            ).alias("early"),
        )
        .collect()
    )
    early = sorted(r.q for r in rows if r.early)
    late = sorted(r.q for r in rows if not r.early)
    n1, n2 = len(early), len(late)
    allv = sorted(early + late)
    # tie-averaged ranks (1-based)
    from collections import Counter

    cnt = Counter(allv)
    rank_of = {}
    pos = 0
    tie_term = 0
    for v in sorted(cnt):
        t = cnt[v]
        rank_of[v] = pos + (t + 1) / 2.0
        tie_term += t**3 - t
        pos += t
    nn = n1 + n2
    r1 = sum(rank_of[v] for v in early)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    var = (n1 * n2 / 12.0) * ((nn + 1) - tie_term / (nn * (nn - 1.0)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)

    got = q_lineitem_mannwhitney_drift(spark, SF).collect()[0]
    assert got["n_early"] == n1 and got["n_late"] == n2
    assert got["u2_early"] == 2 * u1
    assert got["z_q6"] == math.floor(z * 1_000_000 + 0.5)


def test_mannwhitney_detects_planted_shift(spark):
    """A constructed table whose late sample is stochastically larger
    must produce a large-magnitude negative z (early ranks lower)."""
    import tempfile

    from nbody6_data_pipeline_spark.queries_stats import (
        _MW_SPLIT_US,
        q_lineitem_mannwhitney_drift,
    )

    early_day = (_MW_SPLIT_US - 86_400_000_000) // 86_400_000_000
    late_day = (_MW_SPLIT_US + 86_400_000_000) // 86_400_000_000
    rows = [(float(1 + i % 5), int(early_day)) for i in range(400)]
    rows += [(float(30 + i % 5), int(late_day)) for i in range(400)]
    df = spark.createDataFrame(rows, "l_quantity double, d long").select(
        "l_quantity",
        F.date_from_unix_date(F.col("d").cast("int"))
        .cast("timestamp")
        .alias("l_shipdate"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        for t in ("lineitem",):
            df.write.mode("overwrite").parquet(f"{tmp}/{t}.parquet")
        got = q_lineitem_mannwhitney_drift(spark, tmp).collect()[0]
    assert got["n_early"] == 400 and got["n_late"] == 400
    # complete separation: z ~ -26 for 400v400
    assert got["z_q6"] < -20_000_000


# ---------------------------------------------------------------------------
# Kendall tau-b
# ---------------------------------------------------------------------------


def test_kendall_tau_matches_python_recompute(spark):
    """Brute-force all-pairs concordance recount vs the query's
    bounded-cell formulation (sf0.001 rows are few enough to pair)."""
    from nbody6_data_pipeline_spark.queries_stats import (
        q_lineitem_kendall_tau,
    )

    rows = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(
            F.col("l_quantity").isNotNull() & F.col("l_discount").isNotNull()
        )
        .selectExpr(
            "CAST(l_quantity AS BIGINT) AS x",
            "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y",
        )
        .collect()
    )
    pts = [(r.x, r.y) for r in rows]
    n = len(pts)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    from collections import Counter

    n0 = n * (n - 1) // 2
    t1 = sum(v * (v - 1) // 2 for v in Counter(p[0] for p in pts).values())
    t2 = sum(v * (v - 1) // 2 for v in Counter(p[1] for p in pts).values())
    tau = (c - d) / (math.sqrt(n0 - t1) * math.sqrt(n0 - t2))

    got = q_lineitem_kendall_tau(spark, SF).collect()[0]
    assert got["n_pairs"] == n0
    assert got["concordant"] == c
    assert got["discordant"] == d
    assert got["tau_b_q6"] == math.floor(tau * 1_000_000 + 0.5)


def test_kendall_tau_sign_on_constructed_monotone(spark):
    """Perfectly monotone pairs give tau_b = 1 exactly; reversed give
    -1 (the closed form's normalization check)."""
    import tempfile

    from nbody6_data_pipeline_spark.queries_stats import (
        q_lineitem_kendall_tau,
    )

    up = [(float(i % 10 + 1), (i % 10) / 100.0) for i in range(100)]
    down = [(float(i % 10 + 1), (9 - i % 10) / 100.0) for i in range(100)]
    for data, want in ((up, 1_000_000), (down, -1_000_000)):
        df = spark.createDataFrame(
            data, "l_quantity double, l_discount double"
        )
        with tempfile.TemporaryDirectory() as tmp:
            df.write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
            got = q_lineitem_kendall_tau(spark, tmp).collect()[0]
        assert got["tau_b_q6"] == want, got
