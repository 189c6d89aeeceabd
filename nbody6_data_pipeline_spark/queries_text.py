"""Text-analysis queries over the documents table.

The large-scale training-data operators (BASELINE.json north star):
language ID, quality scoring, token counting, document
fingerprinting. All are native column expressions — regexes and md5
behave identically in Spark (Java regex) and DuckDB (RE2) for the
portable subset used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from nbody6_data_pipeline_spark.operators.text import (
    ascii_lower,
    language_scores,
    quality_metrics,
    token_array,
)
from nbody6_data_pipeline_spark.queries import _t, dsum, ordered, register


@register(
    "doc_token_stats",
    """
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS n_tokens,
           length(text) AS n_chars_actual,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / NULLIF(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')), 0)
                 AS mean_token_len
    FROM documents
    ORDER BY doc_id
    """,
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) — north-star text operator.
    Pure column expressions: split + filter + size; no UDF, fully
    codegen'd, scales linearly with no shuffle.
    """
    d = _t(spark, sf_dir, "documents")
    toks = token_array(F.col("text"))
    n_tokens = F.size(toks)
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.nullif(n_tokens, F.lit(0))
        ).alias("mean_token_len"),
    ).transform(ordered, "doc_id")


@register(
    "doc_quality_score",
    """
    WITH m AS (
      SELECT doc_id,
        len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS n_tokens,
        length(text) AS n_chars_x,
        len(regexp_extract_all(text, '[0-9]')) AS n_digits,
        len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
        len(list_filter(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_]+'), t -> t IN ('the', 'a', 'an', 'and', 'of', 'to', 'in', 'is'))) AS n_stopwords
      FROM documents
    )
    SELECT doc_id, n_tokens,
      CAST(n_digits AS DOUBLE) / NULLIF(n_chars_x, 0) AS digit_ratio,
      CAST(n_punct AS DOUBLE) / NULLIF(n_chars_x, 0) AS punct_ratio,
      CAST(n_stopwords AS DOUBLE) / NULLIF(n_tokens, 0) AS stopword_ratio,
      (n_tokens >= 5 AND CAST(n_stopwords AS DOUBLE) / NULLIF(n_tokens, 0) > 0.01)
        AS passes_quality
    FROM m
    ORDER BY doc_id
    """,
)
def q_doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring — length / punctuation / digit / stopword
    ratios with a pass/fail gate (Gopher-style heuristics, done as
    native expressions).
    """
    d = _t(spark, sf_dir, "documents")
    m = quality_metrics(d, F.col("text"))
    return m.select(
        "doc_id",
        "n_tokens",
        (F.col("n_digits").cast("double") / F.nullif(F.col("n_chars_x"), F.lit(0))).alias("digit_ratio"),
        (F.col("n_punct").cast("double") / F.nullif(F.col("n_chars_x"), F.lit(0))).alias("punct_ratio"),
        (F.col("n_stopwords").cast("double") / F.nullif(F.col("n_tokens"), F.lit(0))).alias("stopword_ratio"),
        (
            (F.col("n_tokens") >= 5)
            & (
                F.col("n_stopwords").cast("double")
                / F.nullif(F.col("n_tokens"), F.lit(0))
                > 0.01
            )
        ).alias("passes_quality"),
    ).transform(ordered, "doc_id")


@register(
    "doc_language_id",
    """
    WITH scores AS (
      SELECT doc_id, lang,
        len(list_filter(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_]+'), t -> t IN ('the', 'and', 'is', 'of', 'to', 'with', 'for'))) AS s_en,
        len(list_filter(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_]+'), t -> t IN ('le', 'la', 'les', 'et', 'est', 'de', 'un', 'une'))) AS s_fr,
        len(list_filter(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_]+'), t -> t IN ('der', 'die', 'das', 'und', 'ist', 'von', 'ein'))) AS s_de,
        len(list_filter(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_]+'), t -> t IN ('el', 'los', 'las', 'es', 'de', 'un', 'una', 'y'))) AS s_es
      FROM documents
    ),
    pred AS (
      SELECT doc_id, lang,
        CASE
          WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
          WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
          WHEN s_de >= s_es THEN 'de'
          ELSE 'es'
        END AS lang_pred
      FROM scores
    )
    SELECT lang, lang_pred, COUNT(*) AS n_docs
    FROM pred
    GROUP BY lang, lang_pred
    ORDER BY lang, lang_pred
    """,
)
def q_doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID — stopword-hit n-gram heuristic with deterministic
    argmax tie-breaking (en > fr > de > es), reported as a confusion
    table against the labeled lang column.
    """
    d = _t(spark, sf_dir, "documents")
    scored = language_scores(d, F.col("text"))
    pred = scored.select(
        "doc_id",
        "lang",
        F.when(
            (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es")),
            F.lit("en"),
        )
        .when(
            (F.col("s_fr") >= F.col("s_de")) & (F.col("s_fr") >= F.col("s_es")),
            F.lit("fr"),
        )
        .when(F.col("s_de") >= F.col("s_es"), F.lit("de"))
        .otherwise(F.lit("es"))
        .alias("lang_pred"),
    )
    return (
        pred.groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .transform(ordered, "lang", "lang_pred")
    )


@register(
    "doc_fingerprint",
    """
    SELECT md5(translate(trim(regexp_replace(text, '\\s+', ' ', 'g')), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS fingerprint,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY fingerprint
    ORDER BY doc_id NULLS LAST, fingerprint NULLS LAST
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting — md5 over whitespace-normalized,
    lowercased text; the grouping key for exact near-dup clustering.
    md5 hex output is engine-portable (unlike engine-native hash()).
    """
    d = _t(spark, sf_dir, "documents")
    normalized = ascii_lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return (
        d.groupBy(F.md5(normalized).alias("fingerprint"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_docs"))
        # fingerprint tiebreak: all-NULL-id groups share doc_id NULL
        .transform(ordered, "doc_id", "fingerprint")
    )


@register(
    "doc_bpe_tokens",
    """
    SELECT doc_id,
           len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
           len(list_distinct(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+|[0-9]+|[^a-z0-9\\s]')))
             AS n_unique_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def q_doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish tokenization: word/number/punctuation pieces via a
    portable regex (the GPT-2-style pre-tokenizer shape) — the token
    accounting a training-data pipeline runs at corpus scale."""
    d = _t(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all(
        ascii_lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
    )
    return d.select(
        "doc_id",
        F.size(pieces).alias("n_bpe_tokens"),
        F.size(F.array_distinct(pieces)).alias("n_unique_tokens"),
    ).transform(ordered, "doc_id")


@register(
    "doc_rollup_stats",
    """
    SELECT lang, source,
           GROUPING(lang) AS g_lang, GROUPING(source) AS g_source,
           COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY ROLLUP (lang, source)
    ORDER BY g_lang, g_source, lang NULLS LAST, source NULLS LAST
    """,
)
def q_doc_rollup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregation (ROLLUP): corpus stats at (lang,
    source), (lang), and grand-total levels in ONE pass — Spark plans
    a single Expand + hash-aggregate, the multi-level report shape a
    corpus dashboard needs without three separate scans. GROUPING()
    flags disambiguate aggregate-level NULLs from data NULLs."""
    d = _t(spark, sf_dir, "documents")
    # ROLLUP derived from ONE scan: the (lang, source) groups are the
    # finest set; (lang) and () reaggregate that bounded table —
    # integer partial sums reaggregate exactly, and the () set is a
    # global re-aggregate, which SQL defines as one row even over
    # EMPTY input (Spark's rollup() drops it there; the zero-row twin
    # pins the standard behavior — see q_cube_order_stats).
    base = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_chars").cast("long").alias("chars"),
    )

    def shape(df, lang, source, gl: int, gs: int):
        return df.select(
            lang.alias("lang"),
            source.alias("source"),
            F.lit(gl).cast("int").alias("g_lang"),
            F.lit(gs).cast("int").alias("g_source"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_docs"),
            F.col("chars").cast("long").alias("total_chars"),
        )

    fine = shape(base, F.col("lang"), F.col("source"), 0, 0)
    by_lang = shape(
        base.groupBy("lang").agg(
            F.sum("cnt").alias("cnt"), F.sum("chars").alias("chars")
        ),
        F.col("lang"), F.lit(None).cast("string"), 0, 1,
    )
    total = shape(
        base.agg(
            F.sum("cnt").alias("cnt"), F.sum("chars").alias("chars")
        ),
        F.lit(None).cast("string"), F.lit(None).cast("string"), 1, 1,
    )
    return (
        fine.unionByName(by_lang).unionByName(total)
        .transform(ordered, "g_lang", "g_source", "lang", "source")
    )


# ---------------------------------------------------------------------------
# Pattern scrubbing (PII-redaction shape) and per-group top-k curation
# ---------------------------------------------------------------------------

# Stand-in for a PII pattern (emails/phones/ids): the synthetic corpus
# has no digits, so the redaction target is "tokens of >=5 letters" —
# the plumbing (count + global replace + audit metrics) is the real
# operator; the pattern is a config constant.
_SCRUB_RE = "[a-z]{5,}"


@register(
    "doc_pattern_scrub",
    f"""
    WITH r AS (
      SELECT lang,
             len(regexp_extract_all(text, '{_SCRUB_RE}')) AS n_hits,
             length(text) - length(regexp_replace(text, '{_SCRUB_RE}', '#', 'g'))
               AS chars_removed
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE n_hits > 0) AS n_docs_hit,
           CAST(SUM(n_hits) AS BIGINT) AS total_hits,
           CAST(SUM(chars_removed) AS BIGINT) AS total_chars_removed
    FROM r
    GROUP BY lang
    ORDER BY lang NULLS LAST
    """,
)
def q_doc_pattern_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-shaped scrubbing pass: count pattern hits per document,
    globally redact them (each hit collapses to '#'), and report the
    audit metrics a compliance pipeline logs (docs touched, hits,
    characters removed). Pure per-row JVM regex projections + one hash
    aggregate — embarrassingly parallel, no shuffle until the tiny
    per-lang rollup. Spark's regexp_replace is global by default;
    DuckDB needs the explicit 'g' flag — the oracle carries it.
    """
    d = _t(spark, sf_dir, "documents")
    n_hits = F.regexp_count(F.col("text"), F.lit(_SCRUB_RE))
    removed = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), _SCRUB_RE, "#")
    )
    r = d.select("lang", n_hits.alias("n_hits"), removed.alias("chars_removed"))
    return (
        r.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("n_hits") > 0, 1)).alias("n_docs_hit"),
            F.sum("n_hits").alias("total_hits"),
            F.sum("chars_removed").alias("total_chars_removed"),
        )
        .transform(ordered, "lang")
    )


@register(
    "doc_topk_per_source",
    """
    SELECT source, rank, doc_id, n_chars
    FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY n_chars DESC, doc_id NULLS LAST) AS rank
      FROM documents
    )
    WHERE rank <= 3
    ORDER BY source, rank
    """,
)
def q_doc_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k curation: the k best documents per source (here by
    length; in production by quality score) — the per-domain selection
    step of corpus curation. Unlike the global `top_k_orders`
    (TakeOrderedAndProject), this is a window partitioned by source:
    one hash shuffle on source, per-partition sort, early-out at k.
    At scale, low source cardinality with huge groups is the skew
    risk; the two-phase fix (per-partition local top-k before the
    shuffle) is what `operators/ranking.py` provides for the exact
    global case — here source cardinality is the parallelism and each
    group sorts locally.
    """
    d = _t(spark, sf_dir, "documents")
    # tiebreak NULLS LAST: a NULL-id doc tying on n_chars at the k
    # boundary must lose the seat on both engines
    w = W.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc_nulls_last()
    )
    return (
        d.select("source", "doc_id", "n_chars")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("source", "rank", "doc_id", "n_chars")
        .transform(ordered, "source", "rank")
    )


# ---- BPE vocabulary learning (merge-pair training) ----

BPE_K = 6


def _bpe_oracle(k: int) -> str:
    """CTE chain replaying the k greedy merge rounds bit-for-bit:
    w0 = wrapped-word frequencies, then per round r: weighted
    adjacent-pair counts (p{r}) -> deterministic argmax (b{r}) ->
    plain-replace merge applied to every word (w{r}). The
    ``(a)(b)`` symbol encoding makes DuckDB's replace() and Spark's
    replace() perform the identical leftmost non-overlapping merge
    (operators/text.py _wrapped_word)."""
    parts = [r"""
    w0 AS (
      SELECT regexp_replace(w, '(.)', '(\1)', 'g') AS v, COUNT(*) AS f
      FROM (SELECT unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+')) AS w
            FROM documents) t
      GROUP BY w
    )"""]
    for r in range(1, k + 1):
        parts.append(f"""
    p{r} AS (
      SELECT split_part(pr, ' ', 1) AS lhs, split_part(pr, ' ', 2) AS rhs,
             SUM(f) AS cnt
      FROM (
        SELECT f, unnest(list_transform(range(1, len(s)),
                                        i -> s[i] || ' ' || s[i + 1])) AS pr
        FROM (SELECT string_split(substring(v, 2, length(v) - 2), ')(') AS s,
                     f
              FROM w{r - 1}) q
      ) z GROUP BY 1, 2
    ),
    b{r} AS (SELECT lhs, rhs, cnt FROM p{r} ORDER BY cnt DESC, lhs, rhs
             LIMIT 1),
    w{r} AS (
      SELECT CASE WHEN lhs IS NULL THEN v
                  ELSE replace(v, '(' || lhs || ')(' || rhs || ')',
                               '(' || lhs || rhs || ')') END AS v, f
      FROM w{r - 1} LEFT JOIN b{r} ON TRUE
    )""")
    union = "\n      UNION ALL ".join(
        f"SELECT {r} AS merge_rank, lhs, rhs, lhs || rhs AS merged, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, k + 1)
    )
    return (
        "WITH " + ",".join(parts)
        + f"\n    SELECT * FROM ({union}) ORDER BY merge_rank"
    )


@register("doc_bpe_learn", _bpe_oracle(BPE_K))
def q_doc_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary TRAINING over the corpus: the first BPE_K merge
    rules by weighted pair frequency (ties broken lexicographically).
    One corpus-sized pass (word-frequency hash-agg, bounded by the
    language's vocabulary), then k tiny argmax rounds on the
    checkpointed vocab table — operators/text.bpe_learn_merges."""
    from nbody6_data_pipeline_spark.operators.text import bpe_learn_merges

    d = _t(spark, sf_dir, "documents")
    return ordered(
        bpe_learn_merges(d, F.col("text"), k=BPE_K), "merge_rank"
    )


def _bpe_encode_oracle(k: int) -> str:
    """Encode-side oracle: the same k-round CTE chain (with the
    LEFT-JOIN fallback so a corpus that runs dry before k merges still
    encodes with the merges it has), then the subword vocabulary of
    the fully-merged words, frequency-weighted."""
    chain = _bpe_oracle(k)
    chain = chain[: chain.index("\n    SELECT * FROM (")]
    return f"""{chain}
    SELECT token, CAST(SUM(f) AS BIGINT) AS n_tokens FROM (
      SELECT unnest(string_split(substring(v, 2, length(v) - 2), ')('))
               AS token, f
      FROM w{k}
    ) t GROUP BY token ORDER BY token
    """


@register("doc_bpe_encode", _bpe_encode_oracle(BPE_K))
def q_doc_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE APPLY: tokenize the corpus with the BPE_K learned merges
    and return the resulting subword vocabulary with weighted corpus
    frequencies — the tokenizer-fitting round trip (train on the
    corpus, encode the corpus, count the tokens you'd feed a model).
    operators/text.bpe_encode_tokens."""
    from nbody6_data_pipeline_spark.operators.text import bpe_encode_tokens

    d = _t(spark, sf_dir, "documents")
    return ordered(bpe_encode_tokens(d, F.col("text"), k=BPE_K), "token")
