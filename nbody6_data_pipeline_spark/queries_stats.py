"""Analytical-statistics queries: skyline/Pareto dominance, sequential
changepoint detection, inequality/concentration measurement, and
n-gram language-model quality scoring.

These complete the statistics surface around the drift family
(PSI / KS / chi-square in queries_scale.py) and the corpus-quality
family (quality score / repetition / winsorize in queries_text.py /
queries_training.py):

- part_skyline_pareto: the classic skyline operator (Borzsony et al.,
  ICDE 2001) — Pareto-optimal points under (minimize price, maximize
  size). The Spark plan is the distributed two-phase shape: a bounded
  grid-prefilter eliminates coarsely-dominated points with ONE
  bucket-summary broadcast, then the exact dominance test runs as a
  window over the tiny survivor set. The DuckDB oracle derives the
  same frontier through a completely different algorithm (per-price
  group maxima + running max), so agreement is genuine cross-checking.
- events_cusum_changepoint: CUSUM mean-shift detection over hourly
  event counts — max_k |m*T_k - k*T_m| in exact 128-bit integer
  arithmetic (the cross-multiplied form of max |T_k/k-ish CDF gap|,
  same exactness recipe as the KS query). Completes the drift family
  with a TEMPORAL (when did it change) test next to the
  distributional (did it change) tests.
- events_gini_concentration: Gini coefficient of per-user activity
  mass — the standard rank-weighted formula
  G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending x.
  All sums ride exact integer micro-units in DECIMAL(38,0); the final
  value is ONE double division of identical exact operands.
- doc_lm_perplexity: bigram language-model quality scoring — the
  CCNet / Gopher-style "perplexity under a reference-corpus LM"
  filter. Laplace-smoothed bigram log-probs trained on a curated
  source slice score every document; per-term ln() is absorbed into
  q6 fixed point (the BM25/PSI idiom) so all aggregation is exact
  integer arithmetic.
- doc_rrf_hybrid_retrieval: reciprocal-rank fusion of the BM25 and
  dense-cosine rankings — pure-integer fused scores over a
  constant-size join of the two top-L lists.
- lineitem_decile_lift: cumulative-gains/lift table over exact
  deciles (the distributed exact-NTILE operator — no global sort).
- events_ab_test: two-proportion z-test on a deterministic md5 50/50
  user split — exact integer counts, correctly-rounded IEEE z chain.
- events_km_survival: Kaplan-Meier product-limit retention curve
  with right-censoring; hazard log-terms in q6, exact BIGINT
  log-survival cumsum, bounded day-table windows.
- events_first_touch_attribution: per-channel credit assignment from
  each user's first event, exact-decimal value shares.

No reference analogue (the reference is a single-node pandas
pipeline); these extend the drift/quality/retrieval/experimentation
north-star families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.queries import _t, event_us, ordered, register

# ---------------------------------------------------------------------------
# Skyline / Pareto frontier: minimize p_retailprice, maximize p_size
# ---------------------------------------------------------------------------


def _skyline_oracle() -> str:
    # Independent algorithm on the oracle side: one row per distinct
    # price keeps only its max size (anything less is dominated at
    # equal price), then a running max over ascending prices marks a
    # point dominated iff some strictly-cheaper price already reached
    # its size. No grid, no prefilter — a genuinely different route
    # to the same frontier.
    return """
    WITH pts AS (
      SELECT p_retailprice AS price, p_size AS size
      FROM part
      WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
    ),
    pmax AS (
      SELECT price, MAX(size) AS size FROM pts GROUP BY price
    ),
    cm AS (
      SELECT price, size,
        MAX(size) OVER (ORDER BY price
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
      FROM pmax
    ),
    sky AS (SELECT price, size FROM cm WHERE prev IS NULL OR size > prev)
    SELECT s.price, s.size, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM sky s
    JOIN pts p ON p.price = s.price AND p.size = s.size
    GROUP BY s.price, s.size
    ORDER BY s.price
    """


@register("part_skyline_pareto", _skyline_oracle())
def q_part_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of parts under (min price, max size):
    a part is on the skyline iff no other part is at most as expensive
    AND at least as large with one of the two strict.

    100-TB shape — the distributed two-phase skyline:
    1. ONE bounded bucket summary: bucket = floor(price) (bucket count
       is bounded by the VALUE RANGE of the price domain, not by row
       count), per-bucket max size, running max over the ordered
       bucket table (a window over an aggregated, value-bounded
       input).
    2. Broadcast the bucket table back; a point whose size is <= the
       max size of any strictly-lower bucket is provably dominated
       (lower bucket => strictly lower price) and is dropped at the
       scan. Survivors are at most one frontier candidate per bucket
       plus same-bucket contenders — a tiny set independent of table
       size for any non-degenerate price distribution (worst case —
       all rows in one bucket — degrades to the exact pass, never to
       wrong answers).
    3. Exact dominance over survivors: per-price max size (equal-price
       smaller points are dominated), then size > running max of all
       strictly-cheaper survivor prices. Global window, but its input
       has been reduced by the groupBy above it.

    Output: the frontier points with the count of parts sitting
    exactly on each (ties on both dimensions are all Pareto-optimal).
    """
    pts = (
        _t(spark, sf_dir, "part", spread=True)
        .filter(F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull())
        .select(
            F.col("p_retailprice").alias("price"),
            F.col("p_size").alias("size"),
        )
    )
    pts = pts.withColumn("b", F.floor("price"))
    # bounded bucket summary + running max over strictly-lower buckets
    buckets = pts.groupBy("b").agg(F.max("size").alias("bmax"))
    wb = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    buckets = buckets.select(
        "b", F.max("bmax").over(wb).alias("prev_bucket_best")
    )
    # coarse prune: dominated if a strictly-lower bucket reached size
    sur = (
        pts.join(F.broadcast(buckets), "b")
        .filter(
            F.col("prev_bucket_best").isNull()
            | (F.col("size") > F.col("prev_bucket_best"))
        )
        .groupBy("price", "size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )
    # equal-price reduction: only the max size per price can survive
    wp = W.partitionBy("price").orderBy(F.col("size").desc())
    pmax = (
        sur.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    # exact dominance over the reduced survivor set
    ws = W.orderBy("price").rowsBetween(W.unboundedPreceding, -1)
    sky = pmax.withColumn("prev", F.max("size").over(ws)).filter(
        F.col("prev").isNull() | (F.col("size") > F.col("prev"))
    )
    return sky.select("price", "size", "n_parts").transform(ordered, "price")


# ---------------------------------------------------------------------------
# CUSUM changepoint detection over hourly event counts
# ---------------------------------------------------------------------------


def _cusum_oracle() -> str:
    return """
    WITH bins AS (
      SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1
    ),
    cum AS (
      SELECT hr, c,
        CAST(ROW_NUMBER() OVER (ORDER BY hr) AS BIGINT) AS k,
        CAST(SUM(c) OVER (ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS tk
      FROM bins
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(c) AS BIGINT) AS tm
      FROM bins
    ),
    d AS (
      SELECT hr, k, tk, m, tm,
        abs(CAST(m AS DECIMAL(38,0)) * tk
            - CAST(k AS DECIMAL(38,0)) * tm) AS dk
      FROM cum, tot
      WHERE k < m
    ),
    best AS (
      SELECT * FROM d ORDER BY dk DESC, hr LIMIT 1
    )
    SELECT m AS n_bins,
           hr AS change_hr,
           CAST(dk AS DOUBLE) / (CAST(m AS DOUBLE) * CAST(tm AS DOUBLE))
             AS cusum_stat,
           CAST(tk AS DOUBLE) / CAST(k AS DOUBLE) AS pre_mean,
           CAST(tm - tk AS DOUBLE) / CAST(m - k AS DOUBLE) AS post_mean
    FROM best
    ORDER BY change_hr
    """


@register("events_cusum_changepoint", _cusum_oracle())
def q_events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift changepoint over the hourly event-count
    series: the split hour k* maximizing |T_k - (k/m) T_m| — reported
    with the pre/post means it separates. The temporal complement of
    the PSI / KS / chi-square drift tests (WHEN did the stream's rate
    change, not just whether two snapshots differ).

    Exactness: the statistic is evaluated in its cross-multiplied
    integer form |m*T_k - k*T_m| (DECIMAL(38,0)/HUGEINT 128-bit, the
    KS recipe — exact past 3e9 rows per bin series), argmax
    tie-broken on the hour, and every reported double is ONE division
    of identical exact integers. The windows run over the HOURLY BIN
    table — |bins| is bounded by the stream's time span (hours), not
    by its row count, so the single-partition sort holds at any scale.
    """
    ev = _t(spark, sf_dir, "events", spread=True).filter(
        F.col("ts").isNotNull()
    )
    bins = (
        ev.select(
            F.floor(event_us(ev) / F.lit(3600000000.0))
            .cast("long")
            .alias("hr")
        )
        .groupBy("hr")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # |bins| is time-span-bounded: global windows over this table are
    # safe at any data scale (same invariant as the KS/PSI queries).
    wo = W.orderBy("hr")
    cum = bins.select(
        "hr",
        F.row_number().over(wo).cast("long").alias("k"),
        F.sum("c")
        .over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("tk"),
    )
    tot = bins.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("c").cast("long").alias("tm"),
    )
    d = (
        cum.join(F.broadcast(tot))
        .filter(F.col("k") < F.col("m"))
        .withColumn(
            "dk",
            F.abs(
                F.col("m").cast("decimal(38,0)") * F.col("tk")
                - F.col("k").cast("decimal(38,0)") * F.col("tm")
            ),
        )
    )
    best = (
        ordered(d, F.col("dk").desc(), "hr")
        .limit(1)
        .select(
            F.col("m").alias("n_bins"),
            F.col("hr").alias("change_hr"),
            (
                F.col("dk").cast("double")
                / (F.col("m").cast("double") * F.col("tm").cast("double"))
            ).alias("cusum_stat"),
            (F.col("tk").cast("double") / F.col("k").cast("double")).alias(
                "pre_mean"
            ),
            (
                (F.col("tm") - F.col("tk")).cast("double")
                / (F.col("m") - F.col("k")).cast("double")
            ).alias("post_mean"),
        )
    )
    return best.transform(ordered, "change_hr")


# ---------------------------------------------------------------------------
# Gini concentration of per-user activity mass
# ---------------------------------------------------------------------------


def _gini_oracle() -> str:
    return """
    WITH ux AS (
      SELECT user_id,
        CAST(SUM(CAST(value AS DECIMAL(30,6))) * 1000000
             AS DECIMAL(38,0)) AS xq
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
      GROUP BY user_id
    ),
    rk AS (
      SELECT xq,
        CAST(ROW_NUMBER() OVER (ORDER BY xq, user_id) AS DECIMAL(38,0))
          AS i
      FROM ux
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(i * xq) AS DECIMAL(38,0)) AS sxi
      FROM rk
    )
    SELECT n AS n_users,
           CAST(sx AS DOUBLE) / 1000000.0 AS total_value,
           CAST(2 * sxi - (n + 1) * sx AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) AS gini
    FROM s
    WHERE n > 0 AND sx <> 0
    ORDER BY n_users
    """


@register("events_gini_concentration", _gini_oracle())
def q_events_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user total event value — the standard
    concentration audit for a training-data source mix (is 1% of
    users/domains contributing 90% of the mass?). Rank-weighted form:
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)), x ascending.

    Exactness: per-user mass is an exact decimal sum converted to
    integer MICRO-UNITS (x * 1e6 is exact on DECIMAL(30,6)); ranks and
    all three moments ride DECIMAL(38,0) 128-bit integers (i*x_i at
    1e9 users x 1e12-micro masses fits with ~1e17 headroom); the Gini
    itself is ONE double division of identical exact operands. Ties in
    x_i are rank-order-independent for sum(i*x_i) (equal x), and the
    (x, user_id) tiebreak makes the rank itself deterministic anyway.
    The ranking window runs over the per-user AGGREGATE (one row per
    user). At 100 TB this is the one data-sized sort in the plan —
    the same shape as any exact percentile; swap in the mergeable
    grid-histogram Lorenz approximation (lineitem_grid_quantiles
    recipe) when user cardinality outgrows a sort."""
    ux = (
        _t(spark, sf_dir, "events", spread=True)
        .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            (F.sum(F.col("value").cast("decimal(30,6)")) * 1000000)
            .cast("decimal(38,0)")
            .alias("xq")
        )
    )
    wo = W.orderBy("xq", "user_id")
    rk = ux.select(
        "xq", F.row_number().over(wo).cast("decimal(38,0)").alias("i")
    )
    s = rk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("i") * F.col("xq")).cast("decimal(38,0)").alias("sxi"),
    )
    out = s.filter((F.col("n") > 0) & (F.col("sx") != 0)).select(
        F.col("n").alias("n_users"),
        (F.col("sx").cast("double") / 1000000.0).alias("total_value"),
        (
            (2 * F.col("sxi") - (F.col("n") + 1) * F.col("sx")).cast("double")
            / (F.col("n").cast("double") * F.col("sx").cast("double"))
        ).alias("gini"),
    )
    return out.transform(ordered, "n_users")


# ---------------------------------------------------------------------------
# Bigram language-model perplexity quality scoring (CCNet-style)
# ---------------------------------------------------------------------------

_LM_TRAIN_SRC = "('src1', 'src2', 'src3')"  # curated reference slice
_LM_FLAG_Q6 = 8_000_000  # avg-NLL flag threshold, q6 fixed point (8.0)
# Laplace-smoothed bigram log-prob, quantized to q6 fixed point the
# moment ln() produces it — everything downstream is exact integers.
# Empty-model guard (no training bigrams at all: c1 + v = 0): ANSI
# Spark throws DIVIDE_BY_ZERO where DuckDB yields NULL, so the SHARED
# template emits NULL — "no model" scores as NULL, flags as 0 — in
# both engines (one-row twin sweep).
_LM_LP_Q6 = (
    "CASE WHEN CAST({c1} AS DOUBLE) + CAST({v} AS DOUBLE) = 0 THEN NULL "
    "ELSE CAST(floor(ln((CAST({c2} AS DOUBLE) + 1.0) / "
    "(CAST({c1} AS DOUBLE) + CAST({v} AS DOUBLE))) * 1000000 + 0.5) "
    "AS BIGINT) END"
)


def _lm_oracle() -> str:
    lp = _LM_LP_Q6.format(c2="COALESCE(t2.c2, 0)", c1="COALESCE(t1.c1, 0)", v="v.v")
    return f"""
    WITH toks AS (
      SELECT doc_id, source,
        list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9]+'),
                    x -> x != '') AS w
      FROM documents
      WHERE text IS NOT NULL
    ),
    big AS (
      -- zipped parallel unnests over the two shifted slices: DuckDB
      -- expands equal-length unnests positionally, yielding the
      -- (w_i, w_i+1) bigram stream
      SELECT doc_id, source,
        unnest(w[1:len(w) - 1]) AS w1,
        unnest(w[2:len(w)]) AS w2
      FROM toks
      WHERE len(w) >= 2
    ),
    tr2 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM big
      WHERE source IN {_LM_TRAIN_SRC} GROUP BY w1, w2
    ),
    tr1 AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM big
      WHERE source IN {_LM_TRAIN_SRC} GROUP BY w1
    ),
    vocab AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v FROM tr1
    ),
    scored AS (
      SELECT b.doc_id, b.source,
        CAST(COUNT(*) AS BIGINT) AS n_big,
        CAST(SUM(-{lp}) AS BIGINT) AS nll_q6
      FROM big b
      LEFT JOIN tr2 t2 ON t2.w1 = b.w1 AND t2.w2 = b.w2
      LEFT JOIN tr1 t1 ON t1.w1 = b.w1
      CROSS JOIN vocab v
      GROUP BY b.doc_id, b.source
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN CAST(nll_q6 AS DECIMAL(38,0))
                 > {_LM_FLAG_Q6} * CAST(n_big AS DECIMAL(38,0))
               THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      CAST(SUM(nll_q6) AS DOUBLE)
        / (CAST(SUM(n_big) AS DOUBLE) * 1000000.0) AS corpus_avg_nll
    FROM scored
    GROUP BY source
    ORDER BY source NULLS LAST
    """


@register("doc_lm_perplexity", _lm_oracle())
def q_doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality scoring — the CCNet / Gopher
    recipe: train Laplace-smoothed bigram statistics on a curated
    reference slice (sources src1-src3), score EVERY document's
    average negative log-likelihood under that model, and flag
    high-perplexity (low-quality / out-of-domain) documents per
    source. This is the perplexity-filter stage of an LLM data
    pipeline, expressed entirely as joins + aggregations.

    Exactness: the per-bigram log-prob is quantized to q6 fixed point
    the moment ln() produces it (BM25/PSI idiom — ln is the ONE
    libm-sensitive op; its operands are identical exact-integer-built
    doubles in both engines), so per-doc and per-source rollups are
    exact BIGINT sums; flag thresholds compare cross-multiplied
    integers (no division); the reported corpus NLL is one double
    division of identical exact integers.

    100-TB shape: bigram extraction is a per-doc array transform (no
    window, no shuffle); model tables are vocabulary-bounded
    aggregates; scoring is two vocabulary-keyed equi-joins that AQE
    can broadcast when the trained model is small; per-doc and
    per-source rollups are map-side-combinable hash aggregations.
    """
    docs = (
        _t(spark, sf_dir, "documents", spread=True)
        .filter(F.col("text").isNotNull())
        .selectExpr(
            "doc_id",
            "source",
            "filter(split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9]+'), x -> x != '') AS w",
        )
    )
    big = (
        docs.filter(F.size("w") >= 2)
        .selectExpr(
            "doc_id",
            "source",
            "explode(transform(sequence(1, size(w) - 1), "
            "i -> struct(element_at(w, i) AS w1, "
            "element_at(w, i + 1) AS w2))) AS bg",
        )
        .select("doc_id", "source", "bg.w1", "bg.w2")
    )
    train = big.filter(F.expr(f"source IN {_LM_TRAIN_SRC}"))
    tr2 = train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c2")
    )
    tr1 = train.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    vocab = tr1.agg(F.count(F.lit(1)).cast("long").alias("v"))
    lp = _LM_LP_Q6.format(c2="COALESCE(c2, 0)", c1="COALESCE(c1, 0)", v="v")
    scored = (
        big.join(tr2, ["w1", "w2"], "left")
        .join(tr1, ["w1"], "left")
        .join(F.broadcast(vocab))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_big"),
            F.expr(f"CAST(SUM(-{lp}) AS BIGINT)").alias("nll_q6"),
        )
    )
    out = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(
                F.col("nll_q6").cast("decimal(38,0)")
                > F.lit(_LM_FLAG_Q6) * F.col("n_big").cast("decimal(38,0)"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_flagged"),
        (
            F.sum("nll_q6").cast("double")
            / (F.sum("n_big").cast("double") * 1000000.0)
        ).alias("corpus_avg_nll"),
    )
    return out.transform(ordered, "source")


# ---------------------------------------------------------------------------
# Reciprocal-rank-fusion hybrid retrieval (BM25 + dense cosine)
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard RRF damping constant (Cormack et al. 2009)
RRF_L = 20  # per-leg candidate list length
RRF_TOPK = 10
RRF_SCALE = 1_000_000_000  # integer RRF: floor(1e9 / (K + rank))


def _rrf_oracle() -> str:
    from nbody6_data_pipeline_spark.queries_scale import (
        BM25_B,
        BM25_K1,
        BM25_NQ,
        _BM25_TERM_SCORE,
    )

    score = _BM25_TERM_SCORE.format(
        N="n.n_docs",
        df="dfs.df",
        tf="tf.tf",
        dl="dl.dl",
        avgdl="(n.sdl / n.n_docs)",
        k1=BM25_K1,
        b=BM25_B,
    )
    return f"""
    WITH d AS (SELECT doc_id, text FROM documents
               WHERE doc_id IS NOT NULL),
    toks AS (
      SELECT doc_id, unnest(list_filter(
        regexp_split_to_array(text, '\\s+'), x -> x != '')) AS token
      FROM d
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs,
                 CAST(SUM(CAST(dl AS DECIMAL(30,4))) AS DOUBLE) AS sdl
          FROM dl),
    dfs AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
    tot AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS cnt
            FROM tf GROUP BY 1),
    top6 AS (
      SELECT token, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rn
      FROM tot QUALIFY rn <= {2 * BM25_NQ}
    ),
    qt AS (SELECT (rn - 1) % {BM25_NQ} AS query_id, token FROM top6),
    sc AS (
      SELECT qt.query_id, tf.doc_id, {score} AS s
      FROM qt
      JOIN tf USING (token)
      JOIN dfs USING (token)
      JOIN dl ON tf.doc_id = dl.doc_id, n
    ),
    agg AS (SELECT query_id, doc_id, SUM(s) AS score
            FROM sc GROUP BY 1, 2),
    bm AS (
      SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY CAST(floor(score * 1000000 + 0.5) AS BIGINT) DESC,
                        doc_id) AS rnk
      FROM agg
      QUALIFY rnk <= {RRF_L}
    ),
    qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {BM25_NQ}),
    v AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
          FROM embeddings),
    cosr AS (
      SELECT query_id, cand_id,
        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
          list_reduce(list_transform(range(1, 65), i -> qv[i] * cv[i]),
                      (acc, x) -> acc + x)
          / (sqrt(list_reduce(list_transform(range(1, 65),
               i -> qv[i] * qv[i]), (acc, x) -> acc + x))
             * sqrt(list_reduce(list_transform(range(1, 65),
                 i -> cv[i] * cv[i]), (acc, x) -> acc + x)))
          DESC, cand_id) AS rnk
      FROM v, qv
      WHERE v.cand_id != qv.query_id
      QUALIFY rnk <= {RRF_L}
    ),
    fused AS (
      SELECT COALESCE(b.query_id, c.query_id) AS query_id,
             COALESCE(b.doc_id, c.cand_id) AS doc_id,
             COALESCE({RRF_SCALE} // (CAST({RRF_K} AS BIGINT) + b.rnk), 0)
             + COALESCE({RRF_SCALE} // (CAST({RRF_K} AS BIGINT) + c.rnk), 0)
               AS rrf,
             b.rnk AS bm25_rank, c.rnk AS cos_rank
      FROM bm b
      FULL OUTER JOIN cosr c
        ON b.query_id = c.query_id AND b.doc_id = c.cand_id
    ),
    ranked AS (
      SELECT query_id, doc_id, CAST(rrf AS BIGINT) AS rrf,
             CAST(bm25_rank AS BIGINT) AS bm25_rank,
             CAST(cos_rank AS BIGINT) AS cos_rank,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY rrf DESC, doc_id) AS fused_rank
      FROM fused
      QUALIFY fused_rank <= {RRF_TOPK}
    )
    SELECT query_id, CAST(fused_rank AS BIGINT) AS fused_rank, doc_id,
           rrf, bm25_rank, cos_rank
    FROM ranked
    ORDER BY query_id, fused_rank
    """


@register("doc_rrf_hybrid_retrieval", _rrf_oracle())
def q_doc_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.,
    SIGIR 2009) — the standard way an LLM data stack combines a
    lexical (BM25) ranking with a dense (embedding-cosine) ranking:
    score(d) = sum over legs of 1/(60 + rank_leg(d)) over the union of
    the two top-L lists, re-ranked.

    Query derivation is deterministic: lexical query i is the BM25
    query construction from doc_bm25_topk (top-6 corpus terms paired
    into three two-term queries); dense query i is embedding vec_id i
    — a synthetic lexical<->dense pairing that exercises the real
    fusion machinery end-to-end.

    Exactness: the fused score is PURE INTEGER arithmetic —
    floor(1e9 / (60 + rank)) per leg (integer division: DuckDB `//`,
    Spark `div` — the per-dialect spelling of the same exact op),
    summed over exactly two legs; ranks come from the already
    oracle-proven BM25 q6 scores and the shared left-to-right cosine
    fold. No new float ops are introduced by the fusion itself.

    100-TB shape: each leg is its proven retrieval plan (postings
    join bounded by |queries| x df; dense leg broadcasts ONLY the
    query set); the fusion joins two (|queries| x L)-row lists — a
    constant-size full-outer join regardless of corpus size."""
    from nbody6_data_pipeline_spark.operators.similarity import cosine_topk
    from nbody6_data_pipeline_spark.operators.text import token_array
    from nbody6_data_pipeline_spark.queries_scale import (
        BM25_B,
        BM25_K1,
        BM25_NQ,
        _BM25_TERM_SCORE,
    )

    d = (
        _t(spark, sf_dir, "documents", spread=True)
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", "text")
    )
    toks = d.select(
        "doc_id", F.explode(token_array(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("long").alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    n = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("dl").cast("decimal(30,4)")).cast("double").alias("sdl"),
    )
    tot = tf.groupBy("token").agg(F.sum("tf").cast("long").alias("cnt"))
    wtop = W.orderBy(F.col("cnt").desc(), "token")
    qt = (
        tot.orderBy(F.col("cnt").desc(), "token")
        .limit(2 * BM25_NQ)
        .select("token", F.row_number().over(wtop).alias("rn"))
        .select(
            ((F.col("rn") - 1) % BM25_NQ).cast("long").alias("query_id"),
            "token",
        )
    )
    dfs = (
        tf.join(F.broadcast(qt.select("token")), "token")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("df"))
    )
    score = _BM25_TERM_SCORE.format(
        N="n_docs",
        df="df",
        tf="tf",
        dl="dl",
        avgdl="(sdl / n_docs)",
        k1=BM25_K1,
        b=BM25_B,
    )
    sc = (
        tf.join(F.broadcast(qt), "token")
        .join(F.broadcast(dfs), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .selectExpr("query_id", "doc_id", f"{score} AS s")
    )
    agg = sc.groupBy("query_id", "doc_id").agg(F.sum("s").alias("score"))
    wrnk = W.partitionBy("query_id").orderBy(
        F.expr("CAST(floor(score * 1000000 + 0.5) AS BIGINT)").desc(),
        "doc_id",
    )
    bm = (
        agg.select(
            "query_id", "doc_id", F.row_number().over(wrnk).alias("rnk")
        )
        .filter(F.col("rnk") <= RRF_L)
    )
    e = _t(spark, sf_dir, "embeddings")
    cosr = cosine_topk(
        e, e.filter(F.col("vec_id") < BM25_NQ), k=RRF_L
    ).select("query_id", F.col("cand_id"), F.col("rank").alias("crnk"))
    fused = (
        bm.join(
            cosr,
            (bm.query_id == cosr.query_id) & (bm.doc_id == cosr.cand_id),
            "full_outer",
        )
        .select(
            F.coalesce(bm.query_id, cosr.query_id).alias("query_id"),
            F.coalesce(bm.doc_id, cosr.cand_id).alias("doc_id"),
            (
                F.coalesce(
                    F.expr(f"{RRF_SCALE} div (CAST({RRF_K} AS BIGINT) + rnk)"),
                    F.lit(0),
                )
                + F.coalesce(
                    F.expr(
                        f"{RRF_SCALE} div (CAST({RRF_K} AS BIGINT) + crnk)"
                    ),
                    F.lit(0),
                )
            )
            .cast("long")
            .alias("rrf"),
            F.col("rnk").cast("long").alias("bm25_rank"),
            F.col("crnk").cast("long").alias("cos_rank"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("fused_rank") <= RRF_TOPK)
        .select(
            "query_id", "fused_rank", "doc_id", "rrf",
            "bm25_rank", "cos_rank",
        )
        .transform(ordered, "query_id", "fused_rank")
    )


# ---------------------------------------------------------------------------
# Decile lift / cumulative-gains table
# ---------------------------------------------------------------------------

_LIFT_N = 10  # deciles


def _lift_oracle() -> str:
    return f"""
    WITH li AS (
      SELECT l_discount, l_orderkey, l_linenumber, l_extendedprice,
        CAST(l_extendedprice AS DECIMAL(30,6))
          * (1 - CAST(l_discount AS DECIMAL(12,6))) AS rev
      FROM lineitem
      WHERE l_discount IS NOT NULL
        AND l_extendedprice IS NOT NULL
        AND l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
    ),
    binned AS (
      -- (l_orderkey, l_linenumber) is NOT unique in the synthetic
      -- feed: l_extendedprice joins the sort key so any rows still
      -- tied carry EQUAL revenue, making per-bin sums well-defined
      -- even though NTILE may order the tied rows differently
      SELECT rev,
        NTILE({_LIFT_N}) OVER (
          ORDER BY l_discount, l_orderkey, l_linenumber,
                   l_extendedprice) AS bin
      FROM li
    ),
    per AS (
      -- rev is EXACTLY 4 decimal places (2dp price x 2dp discount),
      -- so rev * 10000 is an exact int64 (sf ~3000 before overflow):
      -- int64 -> double is a single correctly-rounded hardware
      -- conversion in BOTH engines, unlike DuckDB's scaled-decimal ->
      -- double (two roundings, 1 ulp off past 2^53 — the sf1 lesson)
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) * 10000 AS BIGINT) AS rev_e4
      FROM binned GROUP BY bin
    ),
    cum AS (
      SELECT bin, n, rev_e4,
        CAST(SUM(n) OVER (ORDER BY bin DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_n,
        CAST(SUM(rev_e4) OVER (ORDER BY bin DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_rev_e4,
        CAST(SUM(n) OVER () AS BIGINT) AS tot_n,
        CAST(SUM(rev_e4) OVER () AS BIGINT) AS tot_rev_e4
      FROM per
    )
    SELECT bin, n, rev_e4 AS revenue_e4,
      CAST(cum_rev_e4 AS DOUBLE) / CAST(tot_rev_e4 AS DOUBLE)
        AS cum_capture,
      (CAST(cum_rev_e4 AS DOUBLE) / cum_n)
        / (CAST(tot_rev_e4 AS DOUBLE) / tot_n) AS cum_lift
    FROM cum
    ORDER BY bin
    """


@register("lineitem_decile_lift", _lift_oracle())
def q_lineitem_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / cumulative-gains table — the standard model-eval
    summary: rank rows by a score (here l_discount as the propensity
    proxy, deterministic key tiebreaks), split into exact deciles,
    and report each decile's revenue plus the cumulative capture and
    lift when targeting from the top decile down.

    NTILE stays only in the oracle SQL: the Spark plan uses the
    distributed exact-ntile operator (fixed monotone numeric range
    buckets -> per-bucket row_number + broadcast offsets -> closed
    form assignment, operators/ranking.py) — identical bins, no
    global sort. The cumulative windows then run over the 10-row
    decile table (|deciles| rows regardless of data size).

    Exactness: revenue rides DECIMAL into an exact e4 BIGINT (rev has
    exactly 4 decimal places); capture and lift are short chains of
    correctly-rounded double ops on identical exact int64 operands
    with token-identical expression text in both engines — int64 ->
    double is hardware-correct rounding in both, where DuckDB's
    scaled-decimal -> double is 1 ulp off past 2^53 (sf1 lesson)."""
    from nbody6_data_pipeline_spark.operators.ranking import with_exact_ntile

    li = (
        _t(spark, sf_dir, "lineitem", spread=True)
        .filter(
            F.col("l_discount").isNotNull()
            & F.col("l_extendedprice").isNotNull()
            & F.col("l_orderkey").isNotNull()
            & F.col("l_linenumber").isNotNull()
        )
        .select(
            "l_discount",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            (
                F.col("l_extendedprice").cast("decimal(30,6)")
                * (1 - F.col("l_discount").cast("decimal(12,6)"))
            ).alias("rev"),
        )
    )
    # l_extendedprice in the sort key: (l_orderkey, l_linenumber) is
    # not unique in the feed, and rows tied on all four sort columns
    # have equal rev, so per-bin revenue is well-defined (see oracle)
    binned = with_exact_ntile(
        li,
        ["l_discount", "l_orderkey", "l_linenumber", "l_extendedprice"],
        _LIFT_N,
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # exact e4 integer (see oracle comment): rev has exactly 4
        # decimal places, so this BIGINT is exact and its -> double
        # conversion is a single hardware-correct rounding
        (F.sum("rev") * 10000).cast("bigint").alias("rev_e4"),
    )
    # cumulative-from-top over the |deciles|-row aggregate — bounded
    # input, safe single-partition window at any scale
    wd = W.orderBy(F.col("bin").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = W.orderBy("bin").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = per.select(
        "bin",
        "n",
        "rev_e4",
        F.sum("n").over(wd).cast("long").alias("cum_n"),
        F.sum("rev_e4").over(wd).cast("long").alias("cum_rev_e4"),
        F.sum("n").over(wall).cast("long").alias("tot_n"),
        F.sum("rev_e4").over(wall).cast("long").alias("tot_rev_e4"),
    )
    return cum.selectExpr(
        "bin",
        "n",
        "rev_e4 AS revenue_e4",
        "CAST(cum_rev_e4 AS DOUBLE) / CAST(tot_rev_e4 AS DOUBLE)"
        " AS cum_capture",
        "(CAST(cum_rev_e4 AS DOUBLE) / cum_n)"
        " / (CAST(tot_rev_e4 AS DOUBLE) / tot_n) AS cum_lift",
    ).transform(ordered, "bin")


# ---------------------------------------------------------------------------
# A/B experiment analysis: two-proportion z-test
# ---------------------------------------------------------------------------

# deterministic 50/50 assignment from the user's content hash (the
# engine's established md5->long idiom; only the hex-to-int spelling
# differs per dialect)
_AB_MD5 = "substring(md5(CAST(user_id AS STRING)), 1, 15)"
# conversion = the user's total purchase value crossed this threshold
# (a binary has-purchase metric saturates at 100% on the synthetic
# feed — every user purchases — which degenerates the pooled z)
_AB_CONV_THRESH = 600
_AB_Z = (
    "(({pa}) - ({pb}))"
    " / sqrt(({pp}) * (1.0 - ({pp})) * (1.0 / {na} + 1.0 / {nb}))"
)


def _ab_oracle() -> str:
    z = _AB_Z.format(
        pa="CAST(conv_a AS DOUBLE) / n_a",
        pb="CAST(conv_b AS DOUBLE) / n_b",
        pp="CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)",
        na="n_a",
        nb="n_b",
    )
    return f"""
    WITH u AS (
      SELECT user_id,
        CAST(('0x' || {_AB_MD5}) AS BIGINT) % 2 AS arm,
        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(COALESCE(value, 0) AS DECIMAL(30,6))
                     ELSE CAST(0 AS DECIMAL(30,6)) END) > {_AB_CONV_THRESH}
             THEN 1 ELSE 0 END AS converted
      FROM events
      WHERE user_id IS NOT NULL
      GROUP BY user_id
    ),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
          AS conv_a,
        CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
          AS conv_b
      FROM u
    )
    SELECT n_a, n_b, conv_a, conv_b,
      CAST(conv_a AS DOUBLE) / n_a AS p_a,
      CAST(conv_b AS DOUBLE) / n_b AS p_b,
      (CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
        / (CAST(conv_a AS DOUBLE) / n_a) AS rel_lift,
      {z} AS z_score
    FROM s
    WHERE n_a > 0 AND n_b > 0 AND conv_a > 0
      AND conv_a + conv_b < n_a + n_b
    ORDER BY n_a
    """


@register("events_ab_test", _ab_oracle())
def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment analysis — two-proportion z-test on a
    deterministic 50/50 hash split of users, conversion = the user's
    total purchase value crossed a fixed threshold (an interior-rate
    metric; see _AB_CONV_THRESH). The experimentation-platform
    primitive: arm sizes, conversion counts, relative lift, and the
    pooled z statistic.

    Exactness: counts are exact integers off ONE per-user aggregation;
    every reported double is a short chain of correctly-rounded IEEE
    ops (divide / subtract / multiply / sqrt — sqrt IS correctly
    rounded per IEEE 754) on identical exact operands with
    token-identical expression text in both engines, so no
    quantization is needed. Assignment reuses the engine's md5->long
    idiom (the '0x' cast vs conv(..,16,10) spelling is the one
    per-dialect difference).

    100-TB shape: one user-keyed hash aggregation (map-side
    combinable) then a 4-counter global reduce — the minimal possible
    shuffle for a user-grained experiment metric."""
    ev = _t(spark, sf_dir, "events", spread=True).filter(
        F.col("user_id").isNotNull()
    )
    u = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.coalesce(F.col("value"), F.lit(0)).cast(
                        "decimal(30,6)"
                    ),
                ).otherwise(F.lit(0).cast("decimal(30,6)"))
            )
            > _AB_CONV_THRESH,
            1,
        )
        .otherwise(0)
        .alias("converted")
    )
    u = u.withColumn(
        "arm", F.expr(f"CAST(conv({_AB_MD5}, 16, 10) AS BIGINT) % 2")
    )
    s = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    z = _AB_Z.format(
        pa="CAST(conv_a AS DOUBLE) / n_a",
        pb="CAST(conv_b AS DOUBLE) / n_b",
        pp="CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)",
        na="n_a",
        nb="n_b",
    )
    return (
        s.filter(
            (F.col("n_a") > 0)
            & (F.col("n_b") > 0)
            & (F.col("conv_a") > 0)
            # a saturated pooled rate (everyone converted) makes the z
            # denominator 0: Spark double/0 -> error-or-NULL vs DuckDB
            # inf — excluded identically in both engines
            & (F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b"))
        )
        .selectExpr(
            "n_a",
            "n_b",
            "conv_a",
            "conv_b",
            "CAST(conv_a AS DOUBLE) / n_a AS p_a",
            "CAST(conv_b AS DOUBLE) / n_b AS p_b",
            "(CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)"
            " / (CAST(conv_a AS DOUBLE) / n_a) AS rel_lift",
            f"{z} AS z_score",
        )
        .transform(ordered, "n_a")
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival (user churn / retention curve)
# ---------------------------------------------------------------------------

_KM_DAY_US = 86_400_000_000
_KM_CHURN_GAP_DAYS = 7  # inactive this long before feed end => churned


def _km_oracle() -> str:
    return f"""
    WITH u AS (
      SELECT user_id,
        MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id
    ),
    g AS (SELECT MAX(last_us) AS end_us FROM u),
    lt AS (
      SELECT (last_us - first_us) // {_KM_DAY_US} AS t_day,
        CASE WHEN (end_us - last_us) > {_KM_CHURN_GAP_DAYS} * {_KM_DAY_US}
             THEN 1 ELSE 0 END AS churned
      FROM u, g
    ),
    days AS (
      SELECT t_day,
        CAST(SUM(churned) AS BIGINT) AS d,
        CAST(SUM(1 - churned) AS BIGINT) AS c
      FROM lt GROUP BY t_day
    ),
    risk AS (
      SELECT t_day, d, c,
        CAST(SUM(d + c) OVER () -
             COALESCE(SUM(d + c) OVER (ORDER BY t_day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS n_risk
      FROM days
    ),
    terms AS (
      SELECT t_day, d, c, n_risk,
        CASE WHEN d = 0 THEN 0
             WHEN d >= n_risk THEN NULL
             ELSE CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                             * 1000000 + 0.5) AS BIGINT) END AS term_q6
      FROM risk
    ),
    cum AS (
      SELECT t_day, d AS n_churn, c AS n_censor, n_risk,
        CAST(SUM(COALESCE(term_q6, 0)) OVER (ORDER BY t_day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS log_surv_q6,
        MAX(CASE WHEN term_q6 IS NULL THEN 1 ELSE 0 END)
          OVER (ORDER BY t_day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
      FROM terms
    )
    SELECT t_day, n_risk, n_churn, n_censor,
      CASE WHEN dead = 1 THEN 0
           ELSE CAST(floor(exp(CAST(log_surv_q6 AS DOUBLE) / 1000000.0)
                           * 1000000 + 0.5) AS BIGINT) END AS survival_q6
    FROM cum
    ORDER BY t_day
    """


@register("events_km_survival", _km_oracle())
def q_events_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes — the product-
    limit retention estimator with right-censoring: users still active
    within {_KM_CHURN_GAP_DAYS} days of the feed's end are CENSORED at
    their observed lifetime (they leave the risk set without counting
    as churn), everyone else churns at lifetime = last - first (whole
    days). S(t) = prod over days s<=t of (1 - d_s / n_s).

    Exactness: death/censor/at-risk counts are exact integers on the
    BOUNDED day table (|days| = feed time span); the per-day hazard
    log-term rides the q6 fixed-point absorber (the LM/BM25 idiom —
    ln on identical exact-integer-built operands), the log-survival
    cumsum is exact BIGINT, and the final exp() is one libm op on an
    identical q6 operand, re-absorbed into q6. A day where the whole
    risk set churns (d = n) sends S to exactly 0 via an explicit
    flag, not via ln(0).

    100-TB shape: one user-keyed aggregation (map-side combinable),
    then everything runs on the day table — windows included."""
    ev = _t(spark, sf_dir, "events", spread=True).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    us = event_us(ev)
    u = ev.select("user_id", us.alias("us")).groupBy("user_id").agg(
        F.min("us").alias("first_us"), F.max("us").alias("last_us")
    )
    g = u.agg(F.max("last_us").alias("end_us"))
    lt = u.join(F.broadcast(g)).select(
        # exact integer division (`div`) mirrors the oracle's `//`;
        # double division can round a quotient up once lifetimes
        # exceed ~1e5 days (exact-integer discipline, ADVICE r7)
        F.expr(f"(last_us - first_us) div {_KM_DAY_US}").alias("t_day"),
        F.when(
            (F.col("end_us") - F.col("last_us"))
            > _KM_CHURN_GAP_DAYS * _KM_DAY_US,
            1,
        )
        .otherwise(0)
        .alias("churned"),
    )
    days = lt.groupBy("t_day").agg(
        F.sum("churned").cast("long").alias("d"),
        F.sum(1 - F.col("churned")).cast("long").alias("c"),
    )
    # |days| is bounded by the feed's time span: the global windows
    # below run over this aggregated table, never over raw events
    wall = W.orderBy("t_day").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    wprev = W.orderBy("t_day").rowsBetween(W.unboundedPreceding, -1)
    wcum = W.orderBy("t_day").rowsBetween(W.unboundedPreceding, W.currentRow)
    risk = days.select(
        "t_day",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(wall)
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_risk"),
    )
    terms = risk.selectExpr(
        "t_day",
        "d",
        "c",
        "n_risk",
        "CASE WHEN d = 0 THEN 0"
        " WHEN d >= n_risk THEN NULL"
        " ELSE CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / n_risk)"
        " * 1000000 + 0.5) AS BIGINT) END AS term_q6",
    )
    cum = terms.select(
        F.col("t_day"),
        F.col("d").alias("n_churn"),
        F.col("c").alias("n_censor"),
        "n_risk",
        F.sum(F.coalesce(F.col("term_q6"), F.lit(0)))
        .over(wcum)
        .cast("long")
        .alias("log_surv_q6"),
        F.max(F.when(F.col("term_q6").isNull(), 1).otherwise(0))
        .over(wcum)
        .alias("dead"),
    )
    return cum.selectExpr(
        "t_day",
        "n_risk",
        "n_churn",
        "n_censor",
        "CASE WHEN dead = 1 THEN 0"
        " ELSE CAST(floor(exp(CAST(log_surv_q6 AS DOUBLE) / 1000000.0)"
        " * 1000000 + 0.5) AS BIGINT) END AS survival_q6",
    ).transform(ordered, "t_day")


# ---------------------------------------------------------------------------
# First-touch attribution
# ---------------------------------------------------------------------------


def _attribution_oracle() -> str:
    return """
    WITH e AS (
      SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    first_touch AS (
      SELECT user_id, event_type AS channel
      FROM (
        SELECT user_id, event_type,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY us, event_id NULLS LAST,
                     event_type NULLS LAST) AS rn
        FROM e
      ) t WHERE rn = 1
    ),
    conv AS (
      SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(COALESCE(value, 0) AS DECIMAL(30,6))
                 ELSE CAST(0 AS DECIMAL(30,6)) END)
             AS DECIMAL(38,6)) AS pv
      FROM e GROUP BY user_id
    ),
    per AS (
      SELECT f.channel,
        CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(SUM(CASE WHEN c.pv > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_converted,
        CAST(SUM(c.pv) AS DECIMAL(38,6)) AS attributed_value
      FROM first_touch f JOIN conv c USING (user_id)
      GROUP BY f.channel
    )
    SELECT channel, n_users, n_converted,
      CAST(attributed_value AS DOUBLE) AS attributed_value,
      CASE WHEN SUM(attributed_value) OVER () = 0 THEN NULL
           ELSE CAST(attributed_value AS DOUBLE)
             / CAST(SUM(attributed_value) OVER () AS DOUBLE)
      END AS value_share
    FROM per
    ORDER BY channel NULLS LAST
    """


@register("events_first_touch_attribution", _attribution_oracle())
def q_events_first_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-touch attribution — marketing analytics' standard credit
    assignment: each user's total purchase value is attributed to the
    channel (event type) of their FIRST event, with per-channel user,
    converter, and value-share rollups.

    Determinism: the first touch is a per-user rank window keyed
    (time, event_id NULLS LAST) — NULLS LAST spelled on both engines
    (Spark windows default nulls-first ascending, DuckDB nulls-last);
    purchase value rides exact decimals; the share is one double
    division of identical exact operands over the |channels|-row
    aggregate.

    100-TB shape: ONE user-keyed shuffle serves both the first-touch
    window and the conversion rollup (same key), then a
    |channels|-bounded aggregate."""
    ev = (
        _t(spark, sf_dir, "events", spread=True)
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    )
    e = ev.select(
        "user_id", "event_id", "event_type", "value",
        event_us(ev).alias("us"),
    )
    # event_type is the final tiebreak so the first-touch choice is
    # total-ordered even under duplicate (us, event_id) pairs — the
    # cross-engine hash match must not be data-dependent (ADVICE r7)
    wu = W.partitionBy("user_id").orderBy(
        F.col("us").asc_nulls_last(),
        F.col("event_id").asc_nulls_last(),
        F.col("event_type").asc_nulls_last(),
    )
    first_touch = (
        e.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("channel"))
    )
    conv = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.coalesce(F.col("value"), F.lit(0)).cast("decimal(30,6)"),
            ).otherwise(F.lit(0).cast("decimal(30,6)"))
        )
        .cast("decimal(38,6)")
        .alias("pv")
    )
    per = (
        first_touch.join(conv, "user_id")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.when(F.col("pv") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_converted"),
            F.sum("pv").cast("decimal(38,6)").alias("av"),
        )
    )
    wall = W.orderBy("channel").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return per.select(
        "channel",
        "n_users",
        "n_converted",
        F.col("av").cast("double").alias("attributed_value"),
        # zero total value (no purchases at all): ANSI Spark throws on
        # the 0 denominator, DuckDB yields NULL — identical CASE in
        # both engines (one-row twin sweep)
        F.when(F.sum("av").over(wall) == 0, F.lit(None))
        .otherwise(
            F.col("av").cast("double")
            / F.sum("av").over(wall).cast("double")
        )
        .alias("value_share"),
    ).transform(ordered, "channel")


# ---------------------------------------------------------------------------
# Weekday seasonal index
# ---------------------------------------------------------------------------


def _seasonal_oracle() -> str:
    return """
    WITH o AS (
      SELECT CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
        CAST(o_totalprice AS DECIMAL(30,6)) AS rev
      FROM orders
      WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    ),
    per AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(rev) AS DECIMAL(38,6)) AS rev
      FROM o GROUP BY dow
    )
    SELECT dow, n_orders, CAST(rev AS DOUBLE) AS revenue,
      (CAST(rev AS DOUBLE) / n_orders)
        / (CAST(SUM(rev) OVER () AS DOUBLE) / SUM(n_orders) OVER ())
        AS seasonal_index
    FROM per
    ORDER BY dow
    """


@register("orders_seasonal_index", _seasonal_oracle())
def q_orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal index — classical-decomposition's seasonal
    component for order revenue: per-weekday average order value
    relative to the overall average. Index > 1 marks hot weekdays.

    Exactness: revenue rides exact decimals; the index is a short
    chain of correctly-rounded double divisions on identical exact
    operands, token-identical in both engines. DuckDB's dayofweek()
    is Sunday=0; Spark's dayofweek() is Sunday=1, so the Spark side
    spells the same 0-based convention as (dayofweek - 1).

    100-TB shape: one 7-group hash aggregation; the normalizing
    window runs over the 7-row weekday table."""
    o = (
        _t(spark, sf_dir, "orders", spread=True)
        .filter(
            F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
            F.col("o_totalprice").cast("decimal(30,6)").alias("rev"),
        )
    )
    per = o.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("rev").cast("decimal(38,6)").alias("rev"),
    )
    wall = W.orderBy("dow").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return per.select(
        "dow",
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
        (
            (F.col("rev").cast("double") / F.col("n_orders"))
            / (
                F.sum("rev").over(wall).cast("double")
                / F.sum("n_orders").over(wall)
            )
        ).alias("seasonal_index"),
    ).transform(ordered, "dow")


# ---------------------------------------------------------------------------
# A/B power analysis (required sample size per arm)
# ---------------------------------------------------------------------------

# Standard-normal quantiles as python-computed literals embedded
# VERBATIM in both engines (the Poisson-bootstrap CDF recipe — no
# inverse-CDF evaluation runs inside either engine):
_Z_ALPHA_2 = "1.959963984540054"  # z_{0.025}: two-sided alpha = 0.05
_Z_BETA = "0.8416212335729143"  # z_{0.20}: power = 0.80
_AB_MDE = "0.02"  # minimum detectable effect (absolute)

# squares spelled as products (not power()) so no libm op runs at all
_POWER_N = (
    "ceil((({za} + {zb}) * ({za} + {zb}))"
    " * (({p1}) * (1.0 - ({p1})) + ({p2}) * (1.0 - ({p2})))"
    " / (({mde}) * ({mde})))"
)


def _power_oracle() -> str:
    n = _POWER_N.format(
        za=_Z_ALPHA_2,
        zb=_Z_BETA,
        p1="p0",
        p2=f"(p0 + {_AB_MDE})",
        mde=_AB_MDE,
    )
    return f"""
    WITH u AS (
      SELECT user_id,
        CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(COALESCE(value, 0) AS DECIMAL(30,6))
                     ELSE CAST(0 AS DECIMAL(30,6)) END) > {_AB_CONV_THRESH}
             THEN 1 ELSE 0 END AS converted
      FROM events
      WHERE user_id IS NOT NULL
      GROUP BY user_id
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_conv
      FROM u
    ),
    base AS (
      SELECT n_users, n_conv,
             CAST(n_conv AS DOUBLE) / n_users AS p0
      FROM s
      WHERE n_users > 0 AND n_conv > 0 AND n_conv < n_users
    )
    SELECT n_users, n_conv, p0,
      CAST({n} AS BIGINT) AS required_n_per_arm,
      CASE WHEN CAST({n} AS BIGINT) <= n_users / 2
           THEN 1 ELSE 0 END AS currently_powered
    FROM base
    ORDER BY n_users
    """


@register("events_ab_power", _power_oracle())
def q_events_ab_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B power analysis — the experiment-design complement of
    events_ab_test: from the measured baseline conversion rate,
    compute the required sample size per arm to detect a fixed
    absolute lift (MDE) at alpha = 0.05 two-sided with 80% power:
    n = (z_a/2 + z_b)^2 * (p1 q1 + p2 q2) / MDE^2.

    Exactness: the normal quantiles are PYTHON-computed literals
    embedded verbatim in both engines (the Poisson-bootstrap recipe —
    no inverse-CDF runs inside either engine); the baseline rate is
    one double division of exact integers; the sample-size formula is
    a token-identical chain of correctly-rounded double ops; ceil on
    identical doubles is exact. The powered-today verdict compares
    integers.

    100-TB shape: one user-keyed aggregation then a two-counter
    global reduce — same minimal shuffle as events_ab_test."""
    ev = _t(spark, sf_dir, "events", spread=True).filter(
        F.col("user_id").isNotNull()
    )
    u = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.coalesce(F.col("value"), F.lit(0)).cast(
                        "decimal(30,6)"
                    ),
                ).otherwise(F.lit(0).cast("decimal(30,6)"))
            )
            > _AB_CONV_THRESH,
            1,
        )
        .otherwise(0)
        .alias("converted")
    )
    s = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_conv"),
    )
    n = _POWER_N.format(
        za=_Z_ALPHA_2,
        zb=_Z_BETA,
        p1="p0",
        p2=f"(p0 + {_AB_MDE})",
        mde=_AB_MDE,
    )
    return (
        s.filter(
            (F.col("n_users") > 0)
            & (F.col("n_conv") > 0)
            & (F.col("n_conv") < F.col("n_users"))
        )
        .selectExpr(
            "n_users",
            "n_conv",
            "CAST(n_conv AS DOUBLE) / n_users AS p0",
        )
        .selectExpr(
            "n_users",
            "n_conv",
            "p0",
            f"CAST({n} AS BIGINT) AS required_n_per_arm",
            f"CASE WHEN CAST({n} AS BIGINT) <= n_users / 2"
            " THEN 1 ELSE 0 END AS currently_powered",
        )
        .transform(ordered, "n_users")
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------

_RFM_N = 5  # quintiles per dimension


def _rfm_oracle() -> str:
    return f"""
    WITH c AS (
      SELECT o_custkey AS custkey,
        CAST(MAX(epoch_us(o_orderdate)) // 86400000000 AS BIGINT)
          AS recency_day,
        CAST(COUNT(*) AS BIGINT) AS frequency,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DECIMAL(38,6))
          AS monetary
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        AND o_totalprice IS NOT NULL
      GROUP BY o_custkey
    ),
    binned AS (
      SELECT custkey, monetary,
        NTILE({_RFM_N}) OVER (ORDER BY recency_day, custkey) AS r,
        NTILE({_RFM_N}) OVER (ORDER BY frequency, custkey) AS f,
        NTILE({_RFM_N}) OVER (ORDER BY CAST(monetary AS DOUBLE), custkey)
          AS m
      FROM c
    )
    SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS segment,
      CAST(COUNT(*) AS BIGINT) AS n_customers,
      CAST(SUM(monetary) AS DOUBLE) AS total_monetary,
      CAST(SUM(monetary) AS DOUBLE) / COUNT(*) AS avg_monetary
    FROM binned
    GROUP BY r, f, m
    ORDER BY segment
    """


@register("orders_rfm_segmentation", _rfm_oracle())
def q_orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the marketing-analytics classic: quintile each dimension, label
    customers with the 3-digit segment code, roll up value per
    segment. Composes the distributed exact-NTILE operator THREE
    times over the same per-customer aggregate (each is range buckets
    + broadcast offsets — no global sort anywhere; NTILE lives only
    in the oracle SQL).

    Determinism: every quintile order has the unique custkey
    tiebreak; the monetary quintile sorts on the DOUBLE cast in BOTH
    engines (decimal->double is order-preserving, and the engines'
    decimal renderings differ only in scale, not value); monetary
    itself rides exact decimals to the final single-division average.
    """
    from nbody6_data_pipeline_spark.operators.ranking import (
        with_exact_ntile,
    )

    o = _t(spark, sf_dir, "orders", spread=True).filter(
        F.col("o_custkey").isNotNull()
        & F.col("o_orderdate").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
    c = (
        o.select(
            F.col("o_custkey").alias("custkey"),
            event_us(o, "o_orderdate").alias("us"),
            F.col("o_totalprice").cast("decimal(30,6)").alias("price"),
        )
        .groupBy("custkey")
        .agg(
            F.expr("CAST(MAX(us) div 86400000000 AS BIGINT)").alias(
                "recency_day"
            ),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum("price").cast("decimal(38,6)").alias("monetary"),
        )
        .withColumn("m_dbl", F.col("monetary").cast("double"))
    )
    # Each exact-NTILE pass reads its input TWICE (range-bucket count
    # aggregate + the offsets join), so the unpersisted 3-pass chain
    # re-executed the per-customer aggregate up to 2^3 times (16
    # orders scans in the before plan — guide §2.4). Persisting each
    # stage caps every pass at ONE execution; values are unchanged
    # (persist is plan-transparent).
    c = c.persist()
    binned = with_exact_ntile(
        c, ["recency_day", "custkey"], _RFM_N, "r"
    ).persist()
    binned = with_exact_ntile(
        binned, ["frequency", "custkey"], _RFM_N, "f"
    ).persist()
    binned = with_exact_ntile(binned, ["m_dbl", "custkey"], _RFM_N, "m")
    return (
        binned.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("monetary").cast("double").alias("total_monetary"),
            (
                F.sum("monetary").cast("double") / F.count(F.lit(1))
            ).alias("avg_monetary"),
        )
        .select(
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
            .cast("long")
            .alias("segment"),
            "n_customers",
            "total_monetary",
            "avg_monetary",
        )
        .transform(ordered, "segment")
    )


# ---------------------------------------------------------------------------
# Simpson diversity / effective vocabulary size
# ---------------------------------------------------------------------------


def _simpson_oracle() -> str:
    return """
    WITH toks AS (
      SELECT source, unnest(list_filter(
        regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9]+'), x -> x != ''))
        AS token
      FROM documents
      WHERE text IS NOT NULL
    ),
    tf AS (
      SELECT source, token, CAST(COUNT(*) AS DECIMAL(38,0)) AS c
      FROM toks GROUP BY source, token
    ),
    s AS (
      SELECT source,
        CAST(SUM(c) AS BIGINT) AS n_tokens,
        CAST(COUNT(*) AS BIGINT) AS vocab_size,
        CAST(SUM(c * c) AS DECIMAL(38,0)) AS sum_c2
      FROM tf GROUP BY source
    )
    SELECT source, n_tokens, vocab_size,
      CAST(sum_c2 AS DOUBLE)
        / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
        AS simpson,
      (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
        / CAST(sum_c2 AS DOUBLE) AS effective_vocab
    FROM s
    WHERE n_tokens > 0
    ORDER BY source NULLS LAST
    """


@register("doc_simpson_diversity", _simpson_oracle())
def q_doc_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity index per source — the corpus-mix telemetry
    complement of the Gini query: simpson = sum(c_i^2) / N^2 is the
    probability two random tokens coincide, and its inverse is the
    'effective vocabulary size' (how many equally-common tokens would
    look this diverse). Low effective vocab flags templated /
    boilerplate-heavy sources before they skew a training mix.

    Exactness: token counts and sum(c^2) ride DECIMAL(38,0) 128-bit
    integers (c^2 overflows BIGINT past ~3e9 tokens per term); both
    reported ratios are short chains of correctly-rounded double ops
    on identical exact operands. No sampling, no sketch — and at
    100 TB the same two hash aggregations (term counts, then per-
    source moments) are exactly how you'd compute it, map-side
    combinable end to end."""
    toks = (
        _t(spark, sf_dir, "documents", spread=True)
        .filter(F.col("text").isNotNull())
        .selectExpr(
            "source",
            "explode(filter(split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9]+'),"
            " x -> x != '')) AS token",
        )
    )
    tf = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    s = tf.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum(F.col("c") * F.col("c")).cast("decimal(38,0)").alias("sum_c2"),
    )
    return (
        s.filter(F.col("n_tokens") > 0)
        .selectExpr(
            "source",
            "n_tokens",
            "vocab_size",
            "CAST(sum_c2 AS DOUBLE)"
            " / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))"
            " AS simpson",
            "(CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))"
            " / CAST(sum_c2 AS DOUBLE) AS effective_vocab",
        )
        .transform(ordered, "source")
    )


# ---------------------------------------------------------------------------
# Zipf-law fit of the token frequency distribution
# ---------------------------------------------------------------------------

_ZIPF_K = 100  # top-K terms entering the log-log fit
# OLS closed forms on exact-integer-derived doubles (the
# lineitem_ols_fit templates, reused verbatim)
_ZIPF_SLOPE = "((n * sxy - sx * sy) / (n * sxx - sx * sx))"
_ZIPF_R2 = (
    "((n * sxy - sx * sy) * (n * sxy - sx * sy) / "
    "((n * sxx - sx * sx) * (n * syy - sy * sy)))"
)
# degenerate corpus guard (ADVICE r7): if all top-K counts are equal
# the y-variance is 0 and r2 is 0/0 — DuckDB errors on CAST(NaN),
# non-ANSI Spark silently casts NaN to 0. Both engines emit NULL via
# this identical CASE instead.
_ZIPF_R2_Q6 = (
    "CASE WHEN (n * syy - sy * sy) = 0 THEN NULL"
    f" ELSE CAST(floor({_ZIPF_R2} * 1000000 + 0.5) AS BIGINT) END"
)
# q6 log coordinates: ln(rank), ln(count) quantized the moment libm
# produces them; every moment sum below is then exact integer
_ZIPF_XY = (
    "CAST(floor(ln(CAST({v} AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
)


def _zipf_oracle() -> str:
    x = _ZIPF_XY.format(v="rnk")
    y = _ZIPF_XY.format(v="cnt")
    return f"""
    WITH toks AS (
      SELECT unnest(list_filter(
        regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9]+'), x -> x != ''))
        AS token
      FROM documents
      WHERE text IS NOT NULL
    ),
    tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM toks GROUP BY token),
    top AS (
      SELECT cnt,
        CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT)
          AS rnk
      FROM tf
      QUALIFY rnk <= {_ZIPF_K}
    ),
    pts AS (SELECT rnk, cnt, {x} AS xq, {y} AS yq FROM top),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
        CAST(SUM(xq) AS BIGINT) AS sxq,
        CAST(SUM(yq) AS BIGINT) AS syq,
        CAST(SUM(xq * xq) AS BIGINT) AS sxxq,
        CAST(SUM(yq * yq) AS BIGINT) AS syyq,
        CAST(SUM(xq * yq) AS BIGINT) AS sxyq
      FROM pts
    ),
    d AS (
      SELECT n_terms,
        CAST(n_terms AS DOUBLE) AS n,
        CAST(sxq AS DOUBLE) / 1000000.0 AS sx,
        CAST(syq AS DOUBLE) / 1000000.0 AS sy,
        CAST(sxxq AS DOUBLE) / 1000000000000.0 AS sxx,
        CAST(syyq AS DOUBLE) / 1000000000000.0 AS syy,
        CAST(sxyq AS DOUBLE) / 1000000000000.0 AS sxy
      FROM mom WHERE n_terms >= 3
    )
    SELECT n_terms,
      CAST(floor({_ZIPF_SLOPE} * 1000000 + 0.5) AS BIGINT) AS slope_q6,
      {_ZIPF_R2_Q6} AS r2_q6
    FROM d
    ORDER BY n_terms
    """


@register("doc_zipf_fit", _zipf_oracle())
def q_doc_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus token distribution: OLS of
    ln(count) on ln(rank) over the top-{_ZIPF_K} terms. Natural text
    sits near slope -1; a flat slope flags templated/synthetic text
    and a too-steep one flags token-collapse — corpus-quality
    telemetry at vocabulary cost.

    Exactness: ln(rank)/ln(count) are q6-quantized the moment libm
    produces them (exact-integer operands in both engines), all five
    moment sums are exact BIGINTs over the K-row table, the closed
    forms are the lineitem_ols_fit templates on identical doubles,
    and the outputs land in q6. Top-K selection is the BM25 idiom:
    distributed take-ordered + a window over K rows — no
    vocabulary-sized sort."""
    toks = (
        _t(spark, sf_dir, "documents", spread=True)
        .filter(F.col("text").isNotNull())
        .selectExpr(
            "explode(filter(split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9]+'),"
            " x -> x != '')) AS token"
        )
    )
    tf = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wtop = W.orderBy(F.col("cnt").desc(), "token")
    top = (
        tf.orderBy(F.col("cnt").desc(), "token")
        .limit(_ZIPF_K)
        .select("token", "cnt", F.row_number().over(wtop).cast("long").alias("rnk"))
    )
    x = _ZIPF_XY.format(v="rnk")
    y = _ZIPF_XY.format(v="cnt")
    pts = top.selectExpr("rnk", "cnt", f"{x} AS xq", f"{y} AS yq")
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("xq").cast("long").alias("sxq"),
        F.sum("yq").cast("long").alias("syq"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxxq"),
        F.sum(F.col("yq") * F.col("yq")).cast("long").alias("syyq"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxyq"),
    )
    d = mom.filter(F.col("n_terms") >= 3).selectExpr(
        "n_terms",
        "CAST(n_terms AS DOUBLE) AS n",
        "CAST(sxq AS DOUBLE) / 1000000.0 AS sx",
        "CAST(syq AS DOUBLE) / 1000000.0 AS sy",
        "CAST(sxxq AS DOUBLE) / 1000000000000.0 AS sxx",
        "CAST(syyq AS DOUBLE) / 1000000000000.0 AS syy",
        "CAST(sxyq AS DOUBLE) / 1000000000000.0 AS sxy",
    )
    return d.selectExpr(
        "n_terms",
        f"CAST(floor({_ZIPF_SLOPE} * 1000000 + 0.5) AS BIGINT)"
        " AS slope_q6",
        f"{_ZIPF_R2_Q6} AS r2_q6",
    ).transform(ordered, "n_terms")


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

# log10(1 + 1/d), python-computed literals embedded verbatim in both
# engines (the bootstrap/power-analysis recipe)
_BENFORD_P = {
    1: "0.3010299956639812", 2: "0.17609125905568124",
    3: "0.12493873660829992", 4: "0.09691001300805642",
    5: "0.07918124604762482", 6: "0.06694678963061322",
    7: "0.05799194697768673", 8: "0.05115252244738129",
    9: "0.04575749056067514",
}
_BENFORD_CASE = (
    "CASE d "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_P.items())
    + " END"
)


def _benford_oracle() -> str:
    return f"""
    WITH v AS (
      SELECT CAST(substr(CAST(CAST(l_extendedprice AS DECIMAL(30,6))
               AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_extendedprice >= 1
    ),
    digits AS (
      SELECT CAST(i.i AS BIGINT) AS d FROM range(1, 10) i(i)
    ),
    obs AS (
      SELECT digits.d, CAST(COUNT(v.d) AS BIGINT) AS n_obs
      FROM digits LEFT JOIN v ON v.d = digits.d
      GROUP BY digits.d
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs)
    SELECT d AS digit, n_obs,
      CAST({_BENFORD_CASE} AS DOUBLE) AS benford_p,
      CAST(floor(
        (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_CASE}))
        * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_CASE}))
        / (CAST(n AS DOUBLE) * ({_BENFORD_CASE}))
        * 1000000 + 0.5) AS BIGINT) AS chisq_term_q6
    FROM obs, tot
    WHERE n > 0
    ORDER BY digit
    """


@register("lineitem_benford_check", _benford_oracle())
def q_lineitem_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit — the classic anomaly/fraud screen
    for amount columns: observed first-significant-digit counts vs
    Benford's log10(1 + 1/d) expectation, with a per-digit chi-square
    contribution (sum of the 9 q6 terms is the test statistic at
    8 degrees of freedom).

    Exactness: the first digit comes from the DECIMAL's string
    rendering (values >= 1, so the first character IS the leading
    significant digit in both engines — no log10/pow boundary risk);
    Benford probabilities are python-computed literals embedded
    verbatim; each chi-square term is a token-identical double chain
    on exact operands, landed in q6. All nine digits are emitted even
    at zero count (LEFT JOIN against the digit table) so the
    statistic's degrees of freedom never silently change.

    100-TB shape: a 9-group hash aggregation — the cheapest possible
    full-column audit."""
    v = (
        _t(spark, sf_dir, "lineitem", spread=True)
        .filter(
            F.col("l_extendedprice").isNotNull()
            & (F.col("l_extendedprice") >= 1)
        )
        .selectExpr(
            "CAST(substr(CAST(CAST(l_extendedprice AS DECIMAL(30,6))"
            " AS STRING), 1, 1) AS BIGINT) AS d"
        )
    )
    digits = (
        v.sparkSession.range(1, 10).select(F.col("id").alias("d"))
    )
    obs = (
        digits.join(v.groupBy("d").agg(F.count(F.lit(1)).alias("c")), "d", "left")
        .select("d", F.coalesce("c", F.lit(0)).cast("long").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    return (
        obs.join(F.broadcast(tot))
        .filter(F.col("n") > 0)
        .selectExpr(
            "d AS digit",
            "n_obs",
            f"CAST({_BENFORD_CASE} AS DOUBLE) AS benford_p",
            "CAST(floor("
            f"(CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_CASE}))"
            f" * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_CASE}))"
            f" / (CAST(n AS DOUBLE) * ({_BENFORD_CASE}))"
            " * 1000000 + 0.5) AS BIGINT) AS chisq_term_q6",
        )
        .transform(ordered, "digit")
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U drift test (rank-based two-sample complement of KS/PSI)
# ---------------------------------------------------------------------------

_MW_SPLIT_US = 883_612_800_000_000  # 1998-01-01 UTC (the KS/PSI split)

# z from exact integer operands; doubled-rank arithmetic keeps every
# tie-averaged rank an integer (avg rank of a tie block is the .5
# midpoint, so TWICE it is exact). Degenerate guards (N < 2, or one
# giant tie block making the variance 0) emit NULL in the identical
# CASE on both engines — ANSI Spark throws on the 0 denominator where
# DuckDB yields NULL (one-row twin lesson).
_MW_Z_Q6 = (
    "CASE WHEN n1 = 0 OR n2 = 0 OR nn < 2"
    # exact-integer all-one-tie-block guard: tie = nn^3 - nn exactly
    # when every row shares one value; the double bracket below can
    # miss this past 2^53 pair products, so compare in DECIMAL(38,0)
    # (HUGEINT in DuckDB coerces losslessly) before touching doubles.
    " OR tie >= CAST(nn AS DECIMAL(38,0)) * nn * nn - nn OR"
    " (CAST(nn AS DOUBLE) + 1.0) - CAST(tie AS DOUBLE)"
    " / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)) <= 0"
    " THEN NULL"
    " ELSE CAST(floor((CAST(u2 AS DOUBLE) - CAST(m2 AS DOUBLE))"
    " / (2.0 * sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)"
    " * ((CAST(nn AS DOUBLE) + 1.0) - CAST(tie AS DOUBLE)"
    " / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))))"
    " * 1000000 + 0.5) AS BIGINT) END"
)


def _mannwhitney_oracle() -> str:
    return f"""
    WITH b AS (
      SELECT CAST(l_quantity AS BIGINT) AS qty,
             epoch_us(l_shipdate) < {_MW_SPLIT_US} AS early
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_shipdate IS NOT NULL
    ),
    g AS (
      SELECT qty,
        CAST(COUNT(*) FILTER (WHERE early) AS BIGINT) AS c_early,
        CAST(COUNT(*) FILTER (WHERE NOT early) AS BIGINT) AS c_late
      FROM b GROUP BY qty
    ),
    r AS (
      SELECT qty, c_early, c_late,
        c_early + c_late AS t,
        COALESCE(SUM(c_early + c_late) OVER (ORDER BY qty
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      FROM g
    ),
    s AS (
      SELECT
        CAST(SUM(c_early) AS BIGINT) AS n1,
        CAST(SUM(c_late) AS BIGINT) AS n2,
        CAST(SUM(c_early + c_late) AS BIGINT) AS nn,
        -- 2*R1 and the tie term in 128-bit integers (the KS recipe:
        -- rank sums are bounded by n1*N, past int64 at ~3e9 rows)
        CAST(SUM(CAST(c_early AS HUGEINT)
                 * (2 * CAST(cumb AS HUGEINT) + t + 1)) AS HUGEINT) AS r2,
        CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS tie
      FROM r
    ),
    u AS (
      SELECT n1, n2, nn, tie,
        r2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u2,
        CAST(n1 AS HUGEINT) * n2 AS m2
      FROM s
    )
    SELECT n1 AS n_early, n2 AS n_late,
      CAST(u2 AS DOUBLE) AS u2_early,
      {_MW_Z_Q6} AS z_q6
    FROM u
    """


@register("lineitem_mannwhitney_drift", _mannwhitney_oracle())
def q_lineitem_mannwhitney_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann-Whitney U two-sample drift test between pre/post-1998
    quantity distributions — the RANK-based member of the drift
    family (KS = worst CDF gap, PSI = per-bin decomposition, MW =
    stochastic-dominance shift, robust to outliers that KS's supremum
    and a mean test both chase).

    Exactness: quantity has a BOUNDED integer domain, so ranks come
    from the per-value count table — doubled average ranks
    (2*cum_before + t + 1) make every tie-averaged rank an exact
    integer, 2R1/2U1 ride 128-bit integers (DECIMAL(38,0) / HUGEINT),
    the tie-correction term sum(t^3 - t) is exact, and z is one
    double chain over identical exact operands, quantized q6. The
    degenerate guards (empty side, all-ties variance 0) emit NULL via
    an identical CASE in both engines.

    100-TB shape: ONE conditional-aggregation scan to the per-value
    table (bounded by the value DOMAIN, not the row count — the
    window below touches ~50 rows at any scale), exactly like the KS
    query; the statistic itself is driver-free arithmetic."""
    li = _t(spark, sf_dir, "lineitem", spread=True)
    b = (
        li.filter(
            F.col("l_quantity").isNotNull() & F.col("l_shipdate").isNotNull()
        )
        .select(
            F.col("l_quantity").cast("bigint").alias("qty"),
            (event_us(li, "l_shipdate") < _MW_SPLIT_US).alias("early"),
        )
    )
    g = b.groupBy("qty").agg(
        F.count(F.when(F.col("early"), 1)).cast("long").alias("c_early"),
        F.count(F.when(~F.col("early"), 1)).cast("long").alias("c_late"),
    )
    # bounded-domain window: one row per distinct quantity value
    wb = W.orderBy("qty").rowsBetween(W.unboundedPreceding, -1)
    r = g.select(
        "qty", "c_early", "c_late",
        (F.col("c_early") + F.col("c_late")).alias("t"),
        F.coalesce(
            F.sum(F.col("c_early") + F.col("c_late")).over(wb), F.lit(0)
        ).alias("cumb"),
    )
    s = r.agg(
        F.sum("c_early").cast("long").alias("n1"),
        F.sum("c_late").cast("long").alias("n2"),
        F.sum(F.col("c_early") + F.col("c_late")).cast("long").alias("nn"),
        F.sum(
            F.col("c_early").cast("decimal(38,0)")
            * (2 * F.col("cumb").cast("decimal(38,0)") + F.col("t") + 1)
        ).cast("decimal(38,0)").alias("r2"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        ).cast("decimal(38,0)").alias("tie"),
    )
    u = s.select(
        "n1", "n2", "nn", "tie",
        (
            F.col("r2")
            - F.col("n1").cast("decimal(38,0)") * (F.col("n1") + 1)
        ).alias("u2"),
        (F.col("n1").cast("decimal(38,0)") * F.col("n2")).alias("m2"),
    )
    return u.selectExpr(
        "n1 AS n_early",
        "n2 AS n_late",
        "CAST(u2 AS DOUBLE) AS u2_early",
        f"{_MW_Z_Q6} AS z_q6",
    )


# ---------------------------------------------------------------------------
# Kendall tau-b rank correlation (bounded-domain exact form)
# ---------------------------------------------------------------------------

# tau_b = (C - D) / (sqrt(n0 - t1) * sqrt(n0 - t2)); every count is an
# exact 128-bit integer, the two sqrt calls are correctly-rounded IEEE
# ops on identical exact operands (bit-equal cross-engine), and the
# degenerate single-value guards emit NULL identically (ANSI Spark
# would throw on the 0 denominator; DuckDB yields NULL).
_KT_TAU_Q6 = (
    "CASE WHEN n0 - t1 <= 0 OR n0 - t2 <= 0 THEN NULL"
    " ELSE CAST(floor((CAST(c AS DOUBLE) - CAST(d AS DOUBLE))"
    " / (sqrt(CAST(n0 - t1 AS DOUBLE)) * sqrt(CAST(n0 - t2 AS DOUBLE)))"
    " * 1000000 + 0.5) AS BIGINT) END"
)


def _kendall_oracle() -> str:
    return f"""
    WITH b AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    ),
    cells AS (
      SELECT x, y, CAST(COUNT(*) AS HUGEINT) AS cnt
      FROM b GROUP BY x, y
    ),
    -- concordant/discordant from the BOUNDED cell table: the pair
    -- join is |cells|^2 (~500^2) regardless of row count
    pairs AS (
      SELECT
        CAST(SUM(CASE WHEN a.x < o.x AND a.y < o.y
                 THEN a.cnt * o.cnt ELSE 0 END) AS HUGEINT) AS c,
        CAST(SUM(CASE WHEN a.x < o.x AND a.y > o.y
                 THEN a.cnt * o.cnt ELSE 0 END) AS HUGEINT) AS d
      FROM cells a JOIN cells o ON a.x < o.x
    ),
    -- DuckDB '/' on integers is FLOAT division; '//' keeps every
    -- term HUGEINT end-to-end (the /2 operands are always even), so
    -- the documented 128-bit exactness survives past 2^53 pairs.
    m AS (
      SELECT CAST(SUM(cnt) AS HUGEINT) AS n,
        CAST(SUM(cnt * (cnt - 1)) AS HUGEINT) // 2 AS txy
      FROM cells
    ),
    tx AS (
      SELECT CAST(SUM(s * (s - 1)) AS HUGEINT) // 2 AS t1 FROM
        (SELECT CAST(SUM(cnt) AS HUGEINT) AS s FROM cells GROUP BY x)
    ),
    ty AS (
      SELECT CAST(SUM(s * (s - 1)) AS HUGEINT) // 2 AS t2 FROM
        (SELECT CAST(SUM(cnt) AS HUGEINT) AS s FROM cells GROUP BY y)
    ),
    f AS (
      SELECT (n * (n - 1)) // 2 AS n0, t1, t2, c, d
      FROM m, tx, ty, pairs
    )
    SELECT CAST(n0 AS DOUBLE) AS n_pairs,
      CAST(c AS DOUBLE) AS concordant,
      CAST(d AS DOUBLE) AS discordant,
      {_KT_TAU_Q6} AS tau_b_q6
    FROM f
    """


@register("lineitem_kendall_tau", _kendall_oracle())
def q_lineitem_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between quantity and discount —
    the distribution-free monotone-association member of the
    correlation family (Pearson = linear on values, tau = agreement
    of orderings, robust to any monotone transform and to outliers).

    Exactness + 100-TB shape: both columns have BOUNDED integer
    domains (quantity 1..50, discount in cents 0..10), so ONE
    map-side-combinable scan reduces the data to a <=550-cell joint
    count table and the concordant/discordant sums come from a
    |cells|^2 self-join that is CONSTANT-size at any row count —
    the O(n log n) merge-sort formulations are pointless here. All
    pair counts ride 128-bit integers (n0 ~ n^2/2 passes int64 at
    ~6e9 rows); tau is a short double chain over exact operands in
    q6; single-value degeneracy emits NULL identically in both
    engines."""
    li = _t(spark, sf_dir, "lineitem", spread=True)
    b = li.filter(
        F.col("l_quantity").isNotNull() & F.col("l_discount").isNotNull()
    ).selectExpr(
        "CAST(l_quantity AS BIGINT) AS x",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y",
    )
    cells = b.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt")
    )
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.col("cnt").alias("acnt"),
    )
    o = cells.select(
        F.col("x").alias("ox"), F.col("y").alias("oy"),
        F.col("cnt").alias("ocnt"),
    )
    pairs = (
        a.join(F.broadcast(o), F.col("ax") < F.col("ox"))
        .agg(
            F.sum(
                F.when(
                    F.col("ay") < F.col("oy"),
                    F.col("acnt") * F.col("ocnt"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).cast("decimal(38,0)").alias("c"),
            F.sum(
                F.when(
                    F.col("ay") > F.col("oy"),
                    F.col("acnt") * F.col("ocnt"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).cast("decimal(38,0)").alias("d"),
        )
    )
    m = cells.agg(
        F.sum("cnt").cast("decimal(38,0)").alias("n"),
    )
    tx = (
        cells.groupBy("x")
        .agg(F.sum("cnt").cast("decimal(38,0)").alias("s"))
        .agg(
            (F.sum(F.col("s") * (F.col("s") - 1)) / 2)
            .cast("decimal(38,0)")
            .alias("t1")
        )
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("cnt").cast("decimal(38,0)").alias("s"))
        .agg(
            (F.sum(F.col("s") * (F.col("s") - 1)) / 2)
            .cast("decimal(38,0)")
            .alias("t2")
        )
    )
    f = (
        m.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .crossJoin(F.broadcast(pairs))
        .selectExpr(
            "CAST(n * (n - 1) / 2 AS DECIMAL(38,0)) AS n0",
            "t1", "t2", "c", "d",
        )
    )
    return f.selectExpr(
        "CAST(n0 AS DOUBLE) AS n_pairs",
        "CAST(c AS DOUBLE) AS concordant",
        "CAST(d AS DOUBLE) AS discordant",
        f"{_KT_TAU_Q6} AS tau_b_q6",
    )
