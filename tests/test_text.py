"""BPE vocabulary learning (operators/text.py bpe_learn_merges):
hand-computed merge sequence on a corpus chosen to exercise the
greedy leftmost non-overlapping merge semantics, weighted pair
counts, and the deterministic lexicographic tiebreak."""

from pyspark.sql import functions as F

from nbody6_data_pipeline_spark.operators.text import bpe_learn_merges


def test_bpe_merges_hand_computed(spark):
    # words: aaaa x2, banana x1
    df = spark.createDataFrame(
        [("aaaa AAAA",), ("banana!",)], "text string"
    )
    got = [
        tuple(r)
        for r in bpe_learn_merges(df, F.col("text"), k=6)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == [
        # (a,a) appears 3x per 'aaaa' (greedy pairs), weight 2
        (1, "a", "a", "aa", 6),
        # tie at 2 between (a,n), (n,a), (aa,aa): lhs 'a' < 'aa' < 'n'
        (2, "a", "n", "an", 2),
        (3, "aa", "aa", "aaaa", 2),
        # banana is now (b)(an)(an)(a): the FIRST (an) must NOT merge
        # with the second's leading 'a' — greedy leftmost match of
        # '(an)(a)' lands on the second (an) only
        (4, "an", "a", "ana", 1),
        (5, "an", "ana", "anana", 1),
        (6, "b", "anana", "banana", 1),
    ]


def test_bpe_runs_dry_below_k(spark):
    """A corpus with fewer learnable merges than k stops early with
    however many rules exist (single-char words produce no pairs)."""
    df = spark.createDataFrame([("a b ab",)], "text string")
    rows = [
        tuple(r)
        for r in bpe_learn_merges(df, F.col("text"), k=6).collect()
    ]
    assert rows == [(1, "a", "b", "ab", 1)]


def test_bpe_null_and_nonascii_text(spark):
    """NULL text rows and non-[a-z] content contribute no words; the
    learner still trains on what remains."""
    df = spark.createDataFrame(
        [(None,), ("42 !!!",), ("zz zz",)], "text string"
    )
    rows = [
        tuple(r)
        for r in bpe_learn_merges(df, F.col("text"), k=3).collect()
    ]
    assert rows == [(1, "z", "z", "zz", 2)]
