"""Training-data-pipeline queries over documents/events (BASELINE.json
north-star ops beyond the reference's own surface).

The operations a large-scale LLM training-data pipeline runs between
raw corpus and training shards: deterministic sampling, fixed-size
chunking with overlap, TF-IDF term extraction, repetition-based
quality filtering, and rolling event-time feature windows. All are
native column expressions / window functions (no UDFs); hashes are
portable md5 constructions and transcendental-derived scores use the
q6 fixed-point idiom (queries.py) so the DuckDB oracles match
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.text import ascii_lower, token_array
from nbody6_data_pipeline_spark.queries import _t, event_us, md5_bucket, ordered, q6, register

# ---- deterministic sampling ----

SAMPLE_PCT = 20  # keep 20% of each stratum


@register(
    "doc_deterministic_sample",
    f"""
    WITH b AS (
      SELECT doc_id, lang,
        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, lang, bucket FROM b
    WHERE bucket < {SAMPLE_PCT}
    ORDER BY doc_id
    """,
)
def q_doc_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed sampling: a document is kept iff
    md5(doc_id) lands in the first SAMPLE_PCT of 100 hash buckets.
    Unlike rand()-based sampling this is reproducible across engines,
    retries, and partitionings — the property a training-data pipeline
    needs so a resampled corpus is the SAME corpus. Per-row projection
    + filter: no shuffle, scales embarrassingly. Stratification is
    free: the hash is independent of lang/source, so each stratum is
    sampled at the same rate (test_training.py asserts per-lang rates
    concentrate around SAMPLE_PCT)."""
    d = _t(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id"))
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .filter(F.col("bucket") < SAMPLE_PCT)
        .transform(ordered, "doc_id")
    )


# ---- fixed-size chunking with overlap ----

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


@register(
    "doc_chunk_overlap",
    f"""
    WITH t AS (
      SELECT doc_id,
        list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, toks, len(toks) AS n,
        unnest(range(0, len(toks), {CHUNK_STRIDE})) AS start
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id,
      CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
      CAST(least(n - start, {CHUNK_TOKENS}) AS BIGINT) AS n_chunk_tokens,
      array_to_string(
        list_slice(toks, CAST(start + 1 AS BIGINT),
                   CAST(least(start + {CHUNK_TOKENS}, n) AS BIGINT)),
        ' ') AS chunk_text
    FROM s
    ORDER BY doc_id, chunk_idx
    """,
)
def q_doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (training-shard prep):
    every document becomes windows of CHUNK_TOKENS whitespace tokens
    at stride CHUNK_STRIDE (final partial window kept). Expressed as
    sequence + explode + slice — per-row array ops, no shuffle, and
    the chunk fan-out stays inside the scan stage at scale."""
    d = _t(spark, sf_dir, "documents")
    toks = token_array(F.col("text"))
    base = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    n = F.size("toks")
    starts = F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
    return (
        base.select("doc_id", "toks", n.alias("n"), F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.least(F.col("n") - F.col("start"), F.lit(CHUNK_TOKENS))
            .cast("long")
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, F.lit(CHUNK_TOKENS)),
                " ",
            ).alias("chunk_text"),
        )
        .transform(ordered, "doc_id", "chunk_idx")
    )


# ---- TF-IDF top terms ----

TFIDF_TOPK = 3


@register(
    "doc_tfidf_topterms",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(
        regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+'), x -> x != '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
    scored AS (
      SELECT tf.doc_id, tf.term,
        CAST(floor(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0)
                   * 1000000 + 0.5) AS BIGINT) AS tfidf_q6
      FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, tfidf_q6, rank FROM (
      SELECT doc_id, term, tfidf_q6,
        ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY tfidf_q6 DESC, term ASC) AS rank
      FROM scored)
    WHERE rank <= {TFIDF_TOPK}
    ORDER BY doc_id, rank
    """,
)
def q_doc_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-{TFIDF_TOPK} terms per document (smoothed idf:
    ln((N+1)/(df+1)) + 1). The classic two-aggregation pipeline:
    explode terms -> (doc, term) counts (map-side combinable) ->
    document frequencies (second hash-agg on the much smaller term
    dimension) -> broadcast df back. Ranking happens on the
    q6-quantized score so the cross-engine ln() ulp difference cannot
    flip an ordering the oracle sees."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(token_array(ascii_lower(F.col("text")))).alias("term"),
    )
    # No persist: df/n/main are branches of ONE plan, so ReuseExchange
    # shares the (doc_id, term) shuffle across them — a persist here
    # would leak cached blocks for the life of the shared session.
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus size flows through a broadcast 1-row aggregate — no
    # driver-side count action in the query's construction
    n = tf.agg(F.count_distinct("doc_id").alias("n_docs"))
    tfidf = F.col("tf") * (
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("tfidf_q6").desc(), F.col("term").asc()
    )
    # No broadcast hint on df: the distinct-term table grows with the
    # corpus (Heaps' law) — at 100 TB it is billions of rows. Both
    # sides are already keyed by `term`; let AQE pick the strategy.
    out = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", q6(tfidf).alias("tfidf_q6"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOPK)
        .select("doc_id", "term", "tfidf_q6", "rank")
        .transform(ordered, "doc_id", "rank")
    )
    return out


# ---- repetition-based quality filter ----

REPETITION_MAX = 0.2


@register(
    "doc_repetition_filter",
    f"""
    WITH t AS (
      SELECT doc_id,
        list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+'), x -> x != '')
          AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id, len(toks) - 1 AS n_bigrams,
        unnest(list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t WHERE len(toks) >= 2
    ),
    cnt AS (
      SELECT doc_id, n_bigrams, bigram, COUNT(*) AS c
      FROM bg GROUP BY doc_id, n_bigrams, bigram
    ),
    top AS (
      SELECT doc_id, n_bigrams, MAX(c) AS top_count FROM cnt
      GROUP BY doc_id, n_bigrams
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      CAST(top_count AS BIGINT) AS top_count,
      CAST(top_count AS DOUBLE) / n_bigrams AS repetition_ratio,
      CAST(top_count AS DOUBLE) / n_bigrams <= {REPETITION_MAX}
        AS passes_repetition
    FROM top
    ORDER BY doc_id NULLS LAST, n_bigrams, top_count
    """,
)
def q_doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality gate (C4/Gopher-style): the most
    frequent bigram's share of all bigrams; documents above
    REPETITION_MAX are machine-generated-looking boilerplate. The
    ratio is an exact integer division (deterministic cross-engine).
    One explode + one map-side-combinable count + one max — linear,
    keyed by doc_id throughout, so at scale it partitions cleanly."""
    d = _t(spark, sf_dir, "documents")
    toks = token_array(ascii_lower(F.col("text")))
    base = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    n = F.size("toks")
    bigrams = F.zip_with(
        F.slice(F.col("toks"), 1, n - 1),
        F.slice(F.col("toks"), 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    ratio = F.col("top_count").cast("double") / F.col("n_bigrams")
    return (
        base.select(
            "doc_id",
            (n - 1).cast("long").alias("n_bigrams"),
            F.explode(bigrams).alias("bigram"),
        )
        .groupBy("doc_id", "n_bigrams", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n_bigrams")
        .agg(F.max("c").cast("long").alias("top_count"))
        .select(
            "doc_id",
            "n_bigrams",
            "top_count",
            ratio.alias("repetition_ratio"),
            (ratio <= REPETITION_MAX).alias("passes_repetition"),
        )
        # doc_id alone is no total order on NULL-id docs: every such
        # doc shares key NULL — the per-doc stats break the tie (rows
        # agreeing on all three are bitwise-identical rows)
        .transform(ordered, "doc_id", "n_bigrams", "top_count")
    )


# ---- rolling event-time window features ----

ROLL_US = 3_600_000_000  # 1 hour


@register(
    "events_rolling_1h",
    f"""
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
    SELECT event_id, user_id, us,
      COUNT(*) OVER w AS n_1h,
      CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS sum_value_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN {ROLL_US} PRECEDING AND CURRENT ROW)
    ORDER BY user_id, us, event_id
    """,
)
def q_events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour event-time features per user (the feature-store
    pattern: activity counts/sums as-of each event). A RANGE-framed
    window over integer epoch-us — Spark's rangeBetween and DuckDB's
    RANGE BETWEEN have identical peer semantics on the integer key,
    and the sum uses the exact-decimal idiom so frame-order float
    accumulation can't diverge."""
    from nbody6_data_pipeline_spark.queries import ensure_confs

    ensure_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.select(
        "event_id", "user_id", event_us(ev).alias("us"), "value"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-ROLL_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "us",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        .alias("sum_value_1h"),
    ).transform(ordered, "user_id", "us", "event_id")


# ---- token-level sequence packing ----

SEQ_LEN = 128


@register(
    "doc_pack_sequences",
    f"""
    WITH t AS (
      SELECT source, doc_id,
        len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))
          AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tokens,
        SUM(n_tokens) OVER (PARTITION BY source
                            ORDER BY doc_id NULLS LAST, n_tokens
                            ROWS UNBOUNDED PRECEDING) AS cum_end
      FROM t
    ),
    spans AS (
      SELECT source, doc_id, n_tokens,
        cum_end - n_tokens AS cum_start, cum_end,
        unnest(range(CAST((cum_end - n_tokens) // {SEQ_LEN} AS BIGINT),
                     CAST((cum_end - 1) // {SEQ_LEN} + 1 AS BIGINT)))
          AS pack_id
      FROM c WHERE n_tokens > 0
    )
    SELECT source, doc_id, CAST(pack_id AS BIGINT) AS pack_id,
      CAST(least(cum_end, (pack_id + 1) * {SEQ_LEN})
           - greatest(cum_start, pack_id * {SEQ_LEN}) AS BIGINT)
        AS n_tokens_in_pack
    FROM spans
    ORDER BY source, doc_id NULLS LAST, pack_id, n_tokens_in_pack
    """,
)
def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level sequence packing (training-shard prep): per source
    shard, documents in doc_id order are conceptually concatenated and
    cut into fixed SEQ_LEN-token sequences; a document spanning a cut
    contributes to both packs. One row per (doc, pack) intersection
    with the token count it contributes — exactly the bookkeeping a
    sharded pretraining tokenizer emits.

    Pure integer window arithmetic: a per-shard prefix sum + a range
    explode. Partitioning by source is the scale design — each shard
    packs independently, so the window never needs a global sort."""
    d = _t(spark, sf_dir, "documents")
    n = F.size(token_array(F.col("text")))
    # NULLS LAST to match the oracle's window (Spark defaults a NULL
    # doc_id to FIRST, which would shift every later doc's prefix sum
    # and pack boundary); n_tokens tiebreak makes the prefix sum
    # deterministic when several NULL-id docs share a source — docs
    # agreeing on both keys contribute identical rows either way.
    w = (
        W.partitionBy("source")
        .orderBy(F.col("doc_id").asc_nulls_last(), "n_tokens")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = (
        d.select("source", "doc_id", n.alias("n_tokens"))
        .withColumn("cum_end", F.sum("n_tokens").over(w))
        .withColumn("cum_start", F.col("cum_end") - F.col("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    pack = F.col("pack_id")
    return (
        c.select(
            "source",
            "doc_id",
            "cum_start",
            "cum_end",
            F.explode(
                F.sequence(
                    (F.col("cum_start") / SEQ_LEN).cast("long"),
                    ((F.col("cum_end") - 1) / SEQ_LEN).cast("long"),
                )
            ).alias("pack_id"),
        )
        .select(
            "source",
            "doc_id",
            "pack_id",
            (
                F.least(F.col("cum_end"), (pack + 1) * SEQ_LEN)
                - F.greatest(F.col("cum_start"), pack * SEQ_LEN)
            )
            .cast("long")
            .alias("n_tokens_in_pack"),
        )
        # (source, NULL, pack) collides when several NULL-id docs hit
        # the same pack — the contributed token count breaks the tie
        .transform(ordered, "source", "doc_id", "pack_id", "n_tokens_in_pack")
    )


# ---- benchmark decontamination ----

CONTAM_GRAM = 8
BENCH_MOD = 97  # doc_id % 97 == 0 plays the held-out benchmark set


@register(
    "doc_benchmark_contamination",
    f"""
    WITH t AS (
      SELECT doc_id,
        list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+'), x -> x != '')
          AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, len(toks) - {CONTAM_GRAM - 2}),
        i -> array_to_string(list_slice(toks, i, i + {CONTAM_GRAM - 1}), ' '))))
        AS gram
      FROM t WHERE len(toks) >= {CONTAM_GRAM}
    ),
    bench AS (
      SELECT DISTINCT gram FROM g WHERE doc_id % {BENCH_MOD} = 0
    ),
    hits AS (
      SELECT g.doc_id, COUNT(*) AS n_contaminated_grams
      FROM g JOIN bench USING (gram)
      WHERE g.doc_id % {BENCH_MOD} != 0
      GROUP BY g.doc_id
    )
    SELECT t.doc_id,
      COALESCE(h.n_contaminated_grams, 0) AS n_contaminated_grams,
      COALESCE(h.n_contaminated_grams, 0) > 0 AS contaminated
    FROM t LEFT JOIN hits h USING (doc_id)
    WHERE t.doc_id % {BENCH_MOD} != 0
    ORDER BY t.doc_id
    """,
)
def q_doc_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    CONTAM_GRAM-token shingle with a held-out benchmark set (here:
    doc_id % BENCH_MOD == 0 plays the benchmark). The standard
    pretraining-hygiene pass.

    Scale shape: benchmark sets are tiny relative to the corpus, so
    the distinct benchmark-gram table normally broadcasts and the
    corpus-side gram explode rides the scan. The join strategy is
    deliberately left to AQE rather than a broadcast hint: AQE
    broadcasts when the materialized benchmark side is actually small
    and falls back to a shuffle join when it is not (measured: forcing
    the hint is never faster, and 17x slower when the benchmark side
    grows). Distinct-per-doc grams bound the join fan-out: the
    benchmark side is distinct, so join output <= corpus gram count."""
    d = _t(spark, sf_dir, "documents")
    toks = token_array(ascii_lower(F.col("text")))
    base = d.select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n - (CONTAM_GRAM - 1)),
            lambda i: F.array_join(
                F.slice(F.col("toks"), i, CONTAM_GRAM), " "
            ),
        )
    )
    g = (
        base.filter(n >= CONTAM_GRAM)
        .select("doc_id", F.explode(grams).alias("gram"))
    )
    bench = (
        g.filter(F.col("doc_id") % BENCH_MOD == 0).select("gram").distinct()
    )
    hits = (
        g.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(bench, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        base.filter(F.col("doc_id") % BENCH_MOD != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_contaminated_grams"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
        .transform(ordered, "doc_id")
    )


@register(
    "doc_mixture_sample",
    """
    WITH n AS (SELECT count(*) AS total FROM documents),
    cnt AS (
      SELECT source, count(*) AS n_avail,
             CAST(floor(sqrt(count(*)) * 1000000 + 0.5) AS BIGINT) AS wq
      FROM documents GROUP BY source
    ),
    tw AS (SELECT SUM(wq) AS sum_wq FROM cnt),
    tgt AS (
      SELECT c.source, c.n_avail,
             least(CAST(((n.total * 3) // 5) * c.wq // t.sum_wq AS BIGINT),
                   c.n_avail) AS n_target
      FROM cnt c, tw t, n
    ),
    ranked AS (
      SELECT d.doc_id, d.source,
             row_number() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)) NULLS LAST,
                        d.doc_id NULLS LAST) AS rk
      FROM documents d
    )
    SELECT r.source AS source, r.doc_id AS doc_id
    FROM ranked r JOIN tgt ON r.source = tgt.source
    WHERE r.rk <= tgt.n_target
    ORDER BY r.source, r.doc_id
    """,
)
def q_doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture sampling (the multilingual /
    multi-source LLM recipe): per-source sampling budgets proportional
    to count^alpha with alpha=0.5, upweighting low-resource sources
    relative to proportional sampling, for a target corpus of 60% of
    the input. Selection within a source is deterministic (md5 of the
    doc id — a seeded shuffle both engines replay bit-identically).

    Determinism notes: the sqrt weights are quantized to integers
    (floor(sqrt(n)*1e6 + .5)) BEFORE summing, so the weight total and
    every budget are exact integer arithmetic — a float sum's
    accumulation order could flip a floor() across engines. The
    per-source rank is a window partitioned by source: distributed
    across sources, and bounded by the largest single source — the
    natural partitioning for per-source quotas at any scale.
    """
    d = _t(spark, sf_dir, "documents")
    total = d.groupBy().agg(F.count(F.lit(1)).alias("total"))
    cnt = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_avail"),
        F.floor(
            F.sqrt(F.count(F.lit(1)).cast("double")) * 1_000_000 + 0.5
        ).cast("long").alias("wq"),
    )
    tw = cnt.groupBy().agg(F.sum("wq").alias("sum_wq"))
    # budgets in pure integer arithmetic (Spark `div` == DuckDB `//`):
    # no double rounding anywhere, so engines agree at any magnitude
    tgt = (
        cnt.crossJoin(F.broadcast(tw))
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_avail",
            F.least(
                F.expr("((total * 3) div 5) * wq div sum_wq"),
                F.col("n_avail"),
            ).alias("n_target"),
        )
    )
    from pyspark.sql import Window as W

    # NULLS LAST on the rank keys: md5(NULL) is NULL and Spark's
    # nulls-first default would hand a NULL-id doc rank 1 — inside
    # every quota — while the oracle ranks it last (the
    # doc_stratified_sample fix, applied here too).
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")).asc_nulls_last(),
            F.col("doc_id").asc_nulls_last(),
        )
    )
    ranked = d.select("doc_id", "source", rk.alias("rk"))
    return (
        ranked.join(F.broadcast(tgt), "source")
        .filter(F.col("rk") <= F.col("n_target"))
        .select("source", "doc_id")
        .transform(ordered, "source", "doc_id")
    )


# ---- percentile winsorization (outlier clipping) ----


@register(
    "doc_length_winsorize",
    """
    WITH b AS (
      SELECT ROUND(QUANTILE_CONT(n_chars, 0.05), 6) AS lo,
             ROUND(QUANTILE_CONT(n_chars, 0.95), 6) AS hi
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE n_chars < lo OR n_chars > hi) AS n_clipped,
           CAST(SUM(CAST(LEAST(GREATEST(CAST(n_chars AS DOUBLE), lo), hi)
                         AS DECIMAL(30,6))) AS DOUBLE) AS winsorized_sum
    FROM documents, b
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_doc_length_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip a heavy-tailed feature to its global
    [p5, p95] before aggregation — the robust-statistics step quality
    pipelines apply so a handful of megadocuments don't dominate
    corpus-level means. Two-pass plan: (1) ONE distributed exact
    percentile aggregate produces a 1-row bounds table, (2) broadcast
    it (a literal cross join with a single row) and clip per-row, then
    the per-lang rollup. At 100 TB pass 1 switches to
    percentile_approx (same plan shape, sketch merge instead of exact
    sort) — the clip/aggregate side is unchanged. Bounds are rounded
    to 6 dp on both engines so interpolation ulp noise can't flip a
    clip decision.
    """
    d = _t(spark, sf_dir, "documents")
    bounds = d.agg(
        F.round(F.expr("percentile(n_chars, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 6).alias("hi"),
    )
    nc = F.col("n_chars").cast("double")
    clipped = F.least(F.greatest(nc, F.col("lo")), F.col("hi"))
    return (
        d.crossJoin(F.broadcast(bounds))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(
                F.when((nc < F.col("lo")) | (nc > F.col("hi")), 1)
            ).alias("n_clipped"),
            F.sum(clipped.cast("decimal(30,6)")).cast("double").alias(
                "winsorized_sum"
            ),
        )
        .transform(ordered, "lang")
    )


# ---- exact N-per-stratum deterministic sampling ----

STRATUM_N = 10


@register(
    "doc_stratified_sample",
    f"""
    SELECT lang, doc_id
    FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)) NULLS LAST,
                        doc_id NULLS LAST) AS rk
      FROM documents
    )
    WHERE rk <= {STRATUM_N}
    ORDER BY lang NULLS LAST, doc_id NULLS LAST
    """,
)
def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N-per-stratum sampling: rank documents within each
    stratum by a content-addressed hash and keep the first N — unlike
    fraction-based sampling (doc_deterministic_sample) this guarantees
    the per-stratum COUNT, which eval-set construction needs, while
    staying reproducible across engines, retries, and partitionings.
    One shuffle on the stratum key; the within-stratum sort is
    per-partition. For mega-strata at 100 TB the same early-out
    two-phase trick as grouped top-k applies (local top-N before the
    shuffle).
    """
    d = _t(spark, sf_dir, "documents")
    # NULLS LAST on the window keys too: a NULL doc_id hashes to a
    # NULL rank key, and Spark's nulls-first ascending default would
    # hand it rank 1 while the oracle ranks it last — silently
    # swapping which rows the stratum keeps (round-5 NULL sweep).
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc_nulls_last(),
        F.col("doc_id").asc_nulls_last(),
    )
    return (
        d.select("lang", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= STRATUM_N)
        .select("lang", "doc_id")
        .transform(ordered, "lang", "doc_id")
    )


@register(
    "doc_shuffle_shards",
    """
    WITH h AS (
      SELECT doc_id, n_chars,
             md5(CAST(doc_id AS VARCHAR)) AS hx,
             COALESCE(
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 16, -1) AS shard
      FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(hx) AS first_hash,
           MAX(hx) AS last_hash
    FROM h
    GROUP BY shard
    ORDER BY shard NULLS LAST
    """,
)
def q_doc_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding — the final step of
    every training-data pipeline: order by a content hash (so the
    'shuffle' is reproducible across engines, retries and reruns, the
    property rand() permutations lack) and carve 16 shards by the
    md5-bucket idiom. The manifest row per shard (count, bytes, hash
    range) is what a downstream loader validates before consuming.
    One hash-agg; the shard id is a pure row function, so at 100 TB
    this is a single map + combine-able aggregation — the actual
    shard WRITE is partitionBy('shard') on the same expression."""
    d = _t(spark, sf_dir, "documents")
    hx = F.md5(F.col("doc_id").cast("string"))
    return (
        d.select(
            # NULL doc_id -> sentinel shard -1 (not a NULL group key):
            # keeps the final sort cross-engine-deterministic and gives
            # unsharded rows an auditable bucket in the manifest.
            F.coalesce(md5_bucket(F.col("doc_id"), 16), F.lit(-1)).alias(
                "shard"
            ),
            F.col("n_chars"),
            hx.alias("hx"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("hx").alias("first_hash"),
            F.max("hx").alias("last_hash"),
        )
        .transform(ordered, "shard")
    )


@register(
    "doc_filter_funnel",
    """
    WITH g AS (
      SELECT n_chars >= 120 AS pass_len,
             lang IN ('en', 'de') AS pass_lang,
             length(text) - length(replace(text, ' ', '')) + 1 >= 25
               AS pass_tok
      FROM documents
    )
    SELECT COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE pass_len) AS n_after_len,
           COUNT(*) FILTER (WHERE pass_len AND pass_lang) AS n_after_lang,
           COUNT(*) FILTER (WHERE pass_len AND pass_lang AND pass_tok)
             AS n_after_tok
    FROM g
    """,
)
def q_doc_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel report — the observability artifact every
    corpus pipeline publishes: cumulative survivor counts through the
    gate sequence (length -> language -> token count), so a sudden
    upstream drift shows up as a step change at the gate that caught
    it. ONE pass, conditional aggregates only: adding a gate adds a
    column, not a scan — at 100 TB this is the difference between a
    funnel report and four full-table jobs."""
    d = _t(spark, sf_dir, "documents")
    pass_len = F.col("n_chars") >= 120
    pass_lang = F.col("lang").isin("en", "de")
    n_tok = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    )
    pass_tok = n_tok >= 25
    return d.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(pass_len, 1)).alias("n_after_len"),
        F.count(F.when(pass_len & pass_lang, 1)).alias("n_after_lang"),
        F.count(F.when(pass_len & pass_lang & pass_tok, 1)).alias(
            "n_after_tok"
        ),
    )


# ---------------------------------------------------------------------------
# Weighted priority sampling (Duffield-Lund-Thorup): deterministic
# weight-proportional selection with ZERO transcendentals
# ---------------------------------------------------------------------------

_PRIO_K = 20  # sample size per stratum
_PRIO_SPACE = float(1 << 60)  # the 60-bit md5 hash space

# priority = w / u with u = (hv+1)/2^60 drawn from the doc's content
# hash — i.e. w * 2^60 / (hv+1): one multiply + one divide on exact
# integer-derived operands, bit-identical cross-engine with no q6
# absorber needed (unlike the exponential-jump A-Res key ln(u)/w,
# whose libm ln() would need quantization coarse enough to destroy
# the sample's resolution).
_PRIO_EXPR = (
    "(CAST(n_chars AS DOUBLE) * {space:.1f} / (CAST(hv AS DOUBLE) + 1.0))"
).format(space=_PRIO_SPACE)


def _priority_sample_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT source, doc_id, n_chars,
        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             AS BIGINT) AS hv
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0 AND doc_id IS NOT NULL
    ),
    r AS (
      SELECT source, doc_id, n_chars,
        {_PRIO_EXPR} AS priority,
        ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY {_PRIO_EXPR} DESC, doc_id) AS rnk
      FROM d
    )
    SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars, priority
    FROM r WHERE rnk <= {_PRIO_K}
    ORDER BY source NULLS LAST, rnk
    """


@register("doc_priority_sample", _priority_sample_oracle())
def q_doc_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling for data mixing, as PRIORITY SAMPLING
    (Duffield-Lund-Thorup): per source stratum, keep the k docs with
    the largest priority w/u, where w = n_chars (longer docs
    proportionally likelier) and u is a (0,1] uniform drawn from the
    doc's content hash. Priority sampling gives unbiased
    subset-sum estimators from the retained (priority, weight) pairs
    and — unlike the exponential-race A-Res key ln(u)/w — needs no
    transcendental: one multiply + one divide on identical operands
    is bit-identical cross-engine, so the full float priority column
    hash-checks raw.

    Scale shape: a rank window per stratum that compiles to
    WindowGroupLimit (per-partition top-k BEFORE the shuffle — the
    plan gate asserts this family), so each executor forwards at most
    k rows per stratum however large the corpus; determinism is total
    (content-addressed u), so re-sampling a re-shuffled corpus
    returns byte-identical samples — the reproducibility property a
    training-mix spec needs."""
    from nbody6_data_pipeline_spark.operators.sketch import hll_hash
    from pyspark.sql import Window as W

    d = (
        _t(spark, sf_dir, "documents")
        .filter(
            F.col("n_chars").isNotNull()
            & (F.col("n_chars") > 0)
            & F.col("doc_id").isNotNull()
        )
        .select(
            "source",
            "doc_id",
            "n_chars",
            hll_hash(F.col("doc_id")).alias("hv"),
        )
    )
    wrnk = W.partitionBy("source").orderBy(
        F.expr(_PRIO_EXPR).desc(), "doc_id"
    )
    return (
        d.select(
            "source",
            F.row_number().over(wrnk).cast("long").alias("rnk"),
            "doc_id",
            "n_chars",
            F.expr(_PRIO_EXPR).alias("priority"),
        )
        .filter(F.col("rnk") <= _PRIO_K)
        .transform(ordered, "source", "rnk")
    )
