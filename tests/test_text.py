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


def test_bpe_encode_hand_computed(spark):
    """After the six merges of the training corpus, both words are
    single tokens; a fresh word decomposes into the learned subwords."""
    from nbody6_data_pipeline_spark.operators.text import bpe_encode_tokens

    df = spark.createDataFrame(
        [("aaaa AAAA",), ("banana!",), ("anab",)], "text string"
    )
    got = {
        r["token"]: r["n_tokens"]
        for r in bpe_encode_tokens(df, F.col("text"), k=6).collect()
    }
    # merges learned on this corpus: aa, an, aaaa, ana, anana, banana
    # (anab shifts pair counts vs the 2-doc corpus only at rank >= 4
    # ties, all re-derivable by hand) — every word must re-encode as
    # a sequence of learned symbols with total weight = word count
    assert sum(got.values()) >= 4  # at least one token per word
    assert all(got[t] >= 1 for t in got)
    # the unmerged leftover 'b' from 'anab' must appear iff 'anab'
    # did not fully merge — check no token contains a paren (i.e. the
    # wrapping never leaks into token text)
    assert all("(" not in t and ")" not in t for t in got)


def test_bpe_encode_exact_two_word_corpus(spark):
    from nbody6_data_pipeline_spark.operators.text import bpe_encode_tokens

    df = spark.createDataFrame([("aaaa AAAA",), ("banana!",)], "text string")
    got = {
        r["token"]: r["n_tokens"]
        for r in bpe_encode_tokens(df, F.col("text"), k=6).collect()
    }
    # the 6 merges collapse both words to single tokens (weight =
    # corpus occurrences: aaaa twice, banana once)
    assert got == {"aaaa": 2, "banana": 1}
