"""Bit-packed Bloom filter build + probe as DataFrame operators.

The runtime-filter pattern for selective joins at 100 TB: instead of
shuffling the fact table to join a filtered dimension, compress the
dimension's key set into a Bloom bitset (8 bits/key here — a 3-hash
filter with ~3.1% false-positive rate at ANY key count), broadcast the
bitset, and pre-filter the fact scan with pure bit arithmetic. Rows
that fail the filter are DEFINITELY not in the dimension (no false
negatives: every inserted key set all k of its bits), so the exact
join only has to process survivors. This is the same mechanism behind
Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled` —
implemented here as an explicit, engine-portable operator whose bitset
is a deterministic pure function of the key set:

- positions use the shared 60-bit md5 idiom (operators/sketch.hll_hash
  family), k independent rows via an 'i:key' prefix;
- the filter size nb = bits_per_key * |keys| is computed inside the
  plan (one broadcast-sized aggregate — no driver action, and the
  false-positive rate is scale-invariant by construction);
- bits pack 62 per word (positive signed-64 range) via bit_or over
  `1 << (pos % 62)` — a |words| = ceil(nb/62)-row table, counter-part
  of the contiguous bit array a single-node implementation would use,
  and mergeable across shards by word-wise OR.

No reference analogue (the reference joins eagerly in pandas); this is
a north-star scale extension like the sketch family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_K = 3  # hash functions
BLOOM_BITS_PER_KEY = 8  # nb = 8 * |keys|  ->  fpp ~ (1 - e^(-3/8))^3 ~ 3.1%
_WORD_BITS = 62  # bits packed per signed-64 word (sign-safe shifts)


def _bloom_hash(row_i: int, key: Column) -> Column:
    """Row-i position hash (pre-modulo): 60-bit md5 long over 'i:key'
    — DuckDB twin CAST(('0x' || substring(md5(i || ':' || CAST(key AS
    VARCHAR)), 1, 15)) AS BIGINT)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{row_i}:"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def bloom_build(
    keys: DataFrame,
    key_col: str,
    k: int = BLOOM_K,
    bits_per_key: int = BLOOM_BITS_PER_KEY,
) -> tuple[DataFrame, DataFrame]:
    """Build the bit-packed Bloom filter over ``keys[key_col]``.

    Returns ``(words, nb)``: ``words`` has one row per non-empty
    62-bit word — (word BIGINT, bits BIGINT with bit j set iff some
    key hashed to position word*62+j) — and ``nb`` is a 1-row frame
    carrying the filter size in bits
    (``nb = greatest(bits_per_key * count, 1)`` — see the sizing
    comment below), which the probe side must reuse so both sides
    reduce positions modulo the same size. Both frames are broadcast-sized: |words| <=
    nb/62 regardless of fact-table volume.

    The build is one fan-out projection (k positions per key) plus one
    bit_or aggregation — map-side combinable, shuffle bounded by
    |words| * n_partitions.
    """
    # greatest(.., 1): an empty (or all-NULL) key set otherwise yields
    # nb = 0 and every probe position becomes NULL via `% 0` — Spark
    # happens to degrade that to all-false bloom_pass, but resting on
    # engine-specific modulo-by-zero NULL semantics is fragile. With
    # nb = 1 the single word is simply absent from `words`, so every
    # probe fails the bit test explicitly: same all-false contract,
    # no NULL arithmetic involved.
    nb = keys.agg(
        F.greatest(
            F.count(key_col) * F.lit(bits_per_key), F.lit(1)
        ).cast("long").alias("nb")
    )
    pos = (
        keys.crossJoin(F.broadcast(nb))
        .select(
            F.explode(
                F.array(
                    *[
                        (_bloom_hash(i, F.col(key_col)) % F.col("nb")).alias(
                            f"p{i}"
                        )
                        for i in range(k)
                    ]
                )
            ).alias("pos")
        )
    )
    words = (
        pos.selectExpr(
            f"pos div {_WORD_BITS} AS word",
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))"
            " AS bit",
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").cast("long").alias("bits"))
    )
    return words, nb


def bloom_probe(
    df: DataFrame,
    key_col: str,
    words: DataFrame,
    nb: DataFrame,
    k: int = BLOOM_K,
) -> DataFrame:
    """Append ``bloom_pass`` (boolean) to ``df``: true iff every one
    of the key's k bit positions is set in the filter.

    k broadcast equi-joins on the word index (no shuffle of ``df`` —
    the probe is a narrow pipeline over the fact scan), one bit test
    each. NULL keys fail the probe (NULL positions match no word), the
    same containment semantics as `IN (SELECT ...)` under a WHERE.
    """
    out = df.crossJoin(F.broadcast(nb))
    for i in range(k):
        p = _bloom_hash(i, F.col(key_col)) % F.col("nb")
        out = (
            out.withColumn(f"_p{i}", p)
            .withColumn(
                f"_w{i}", F.expr(f"_p{i} div {_WORD_BITS}")
            )
            .withColumn(f"_b{i}", (F.col(f"_p{i}") % _WORD_BITS).cast("int"))
            .join(
                F.broadcast(
                    words.select(
                        F.col("word").alias(f"_w{i}"),
                        F.col("bits").alias(f"_bits{i}"),
                    )
                ),
                f"_w{i}",
                "left",
            )
        )
    hit = None
    for i in range(k):
        # SQL-form shiftright: the shift amount may be a column
        # (python F.shiftright only takes a literal int)
        t = F.expr(f"(shiftright(_bits{i}, _b{i}) & 1) = 1")
        hit = t if hit is None else (hit & t)
    drop = ["nb"] + [
        c
        for i in range(k)
        for c in (f"_p{i}", f"_w{i}", f"_b{i}", f"_bits{i}")
    ]
    return out.withColumn(
        "bloom_pass", F.coalesce(hit, F.lit(False))
    ).drop(*drop)
