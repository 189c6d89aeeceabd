"""Text-analysis operators: tokenization, quality, language ID.

All expressions stay JVM-side (whole-stage codegen); the regex subset
used is portable between Java regex and RE2 so the same logic can be
oracle-checked in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword lists for the n-gram language-ID heuristic. Deliberately
# tiny: the operator demonstrates the scalable shape (per-language
# regex hit counts + argmax); swap in real frequency tables for
# production use.
LANG_STOPWORDS = {
    "en": ["the", "and", "is", "of", "to", "with", "for"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein"],
    "es": ["el", "los", "las", "es", "de", "un", "una", "y"],
}

QUALITY_STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is"]


def token_array(text: Column) -> Column:
    """Whitespace tokens, empties removed (handles leading/trailing
    whitespace identically to pandas .str.split())."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(token_array(text))


def _hits(text: Column, pattern: str) -> Column:
    """Occurrence count of a regex — via regexp_extract_all + size,
    which is portable to DuckDB (unlike regexp_count)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def quality_metrics(df: DataFrame, text: Column) -> DataFrame:
    """Per-document quality signals: token count, char count, digit /
    punctuation / stopword hit counts. Downstream ratios + gates are
    simple arithmetic over these."""
    stop_re = r"\b(" + "|".join(QUALITY_STOPWORDS) + r")\b"
    return df.select(
        "*",
        token_count(text).alias("n_tokens"),
        F.length(text).alias("n_chars_x"),
        _hits(text, "[0-9]").alias("n_digits"),
        _hits(text, "[.,!?;:]").alias("n_punct"),
        _hits(F.lower(text), stop_re).alias("n_stopwords"),
    )


def language_scores(df: DataFrame, text: Column) -> DataFrame:
    """Per-language stopword-hit scores (s_en, s_fr, ...). The argmax
    over these is the predicted language."""
    cols = ["*"]
    lowered = F.lower(text)
    for lang, words in LANG_STOPWORDS.items():
        pattern = r"\b(" + "|".join(words) + r")\b"
        cols.append(_hits(lowered, pattern).alias(f"s_{lang}"))
    return df.select(*cols)


def fingerprint(text: Column) -> Column:
    """md5 fingerprint over whitespace-normalized lowercase text."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))
