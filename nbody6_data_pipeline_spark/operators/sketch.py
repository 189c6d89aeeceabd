"""Mergeable sketch operators for cardinality and frequency at scale.

Four classic 100 TB primitives, all expressed so the *output is
bit-exact across engines and partitionings* even though the data
structures are "approximate" (KMV, the fourth, is defined at the
bottom of this module):

- HyperLogLog register construction (`hll_registers` /
  `hll_register_stats`): the registers themselves are deterministic
  (max over a content-addressed hash per bucket is order-independent),
  so the sufficient statistics — register sum and empty-register count
  — are integer-exact and oracle-checkable. Only the final cardinality
  ESTIMATE (a harmonic mean of floats) is engine-local; it is derived
  driver-side from the exact stats (`hll_estimate`) and validated by a
  relative-error test, not a hash compare.

- Misra-Gries heavy hitters (`heavy_hitter_candidates` /
  `heavy_hitters`): a per-partition bounded-memory frequent-items
  sketch generates a CANDIDATE superset (MG guarantee: capacity C
  covers every item with global frequency > N/(C+1) — pigeonhole over
  partitions), then one exact recount pass keeps items above the real
  threshold. The sketch bounds memory and shuffle; the recount makes
  the OUTPUT independent of partitioning, batch size, and sketch
  internals. This is the standard two-pass shape for "terms appearing
  in > x% of a 100 TB corpus" where a full token groupBy would shuffle
  the entire long tail.

- Count-min sketch (`cms_counters` / `cms_estimates`): a D x W grid
  of integer counters, each row a different content-addressed hash of
  the key. Counters are plain COUNT(*) groups, so the whole sketch is
  one map-side-combinable aggregation whose shuffle is bounded by
  D * W rows regardless of input size, and two sketches merge by
  counter-wise addition. Point estimates (min over the D counters a
  key hashes to) carry the one-sided CMS guarantee est >= true, with
  overcount <= 2N/W at ~1 - (1/2)^D confidence. Every number is an
  exact BIGINT — the sketch construction is a pure function of the
  multiset, so estimates hash-compare across engines.

No reference analogue (the reference is single-node pandas and counts
exactly); these are north-star scale extensions like the dedup/ANN
family.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# HyperLogLog registers
# ---------------------------------------------------------------------------

HLL_P = 9  # 2^9 = 512 registers; std error ~ 1.04/sqrt(512) = 4.6%
HLL_M = 1 << HLL_P
_HASH_BITS = 60  # 15 md5 hex digits -> fits signed 64-bit exactly
_W_BITS = _HASH_BITS - HLL_P  # 51


def hll_hash(col: Column) -> Column:
    """60-bit content-addressed hash: first 15 md5 hex digits as LONG.
    Same md5 idiom as queries.md5_bucket so the DuckDB twin is
    CAST(('0x' || substring(md5(CAST(x AS VARCHAR)), 1, 15)) AS BIGINT).
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_bucket_rank(key: Column) -> tuple[Column, Column]:
    """(bucket, rank) columns of the HLL construction for one key
    expression — shared by the batch register build and the streaming
    windowed variant (the register table is the same deterministic
    object either way; only the grouping keys differ)."""
    h = hll_hash(key)
    bucket = h % HLL_M
    w = F.shiftright(h, HLL_P)
    bits = F.lpad(F.bin(w), _W_BITS, "0")
    rank = F.when(w == 0, F.lit(_W_BITS + 1)).otherwise(F.instr(bits, "1"))
    return bucket, rank


def hll_registers(df: DataFrame, key: Column, group_cols: list[str]) -> DataFrame:
    """Deterministic HLL register table: one row per (group, bucket)
    with the register value (max leading-zero rank of the suffix).

    bucket = low HLL_P bits, w = high _W_BITS bits, and
    rank = index of the first set bit of w in a fixed-width binary
    rendering (w == 0 -> _W_BITS + 1). max() per bucket is
    order-independent, so the register table is identical however the
    input is partitioned — the property that makes HLL sketches
    MERGEABLE across shards/streams (register-wise max).

    Pure column expressions (conv/bin/lpad/instr) — whole-stage
    codegen, map-side partial max, one shuffle on (group, bucket)
    whose size is bounded by |groups| * 512 regardless of input rows.
    """
    bucket, rank = hll_bucket_rank(key)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("reg"))
    )


def hll_register_stats(
    df: DataFrame, key: Column, group_cols: list[str]
) -> DataFrame:
    """Integer sufficient statistics of the HLL sketch per group:
    used/zero register counts and the register sum. These are exact
    BIGINTs (hash-comparable cross-engine); feed them to
    `hll_estimate` for the float estimate."""
    regs = hll_registers(df, key, group_cols)
    return regs.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("used_registers"),
        (F.lit(HLL_M) - F.count("*")).cast("long").alias("zero_registers"),
        F.sum("reg").cast("long").alias("sum_rank"),
    )


def hll_estimate_from_registers(regs: list[int]) -> float:
    """Textbook HLL estimate (harmonic mean + linear-counting small
    range) from the register list for one group. Driver-side float
    math on <= 512 values — the registers themselves (the distributed
    part) are exact integers."""
    import math

    m = HLL_M
    padded = list(regs) + [0] * (m - len(regs))
    z = sum(2.0 ** -r for r in padded)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / z
    zeros = sum(1 for r in padded if r == 0)
    if est <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return est


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def _mg_partition(capacity: int):
    """Per-partition Misra-Gries sketch over a `token` column.

    Maintains at most `capacity` counters across ALL Arrow batches of
    the partition (mapInPandas hands us the batch iterator, so state
    spans the partition). On overflow, subtracts the post-insert
    MINIMUM from every counter and drops the zeros — each round
    charges the decrement to capacity+1 distinct counters, so total
    decremented mass <= N_p/(capacity+1): every token with partition
    frequency > N_p/(capacity+1) survives (the MG superset guarantee).
    Batch counts are pre-aggregated with value_counts so the dict loop
    runs per distinct-token, not per row.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for pdf in batches:
            vc = pdf["token"].value_counts()
            for tok, c in vc.items():
                if tok in counts:
                    counts[tok] += int(c)
                elif len(counts) < capacity:
                    counts[tok] = int(c)
                else:
                    counts[tok] = int(c)
                    delta = min(counts.values())
                    counts = {
                        t: n - delta for t, n in counts.items() if n > delta
                    }
        yield pd.DataFrame({"token": list(counts.keys())})

    return run


def heavy_hitter_candidates(
    tokens: DataFrame, capacity: int
) -> DataFrame:
    """Candidate superset via per-partition MG sketches. Output is at
    most `capacity` tokens per partition — bounded driver/shuffle
    footprint no matter the corpus size."""
    return tokens.mapInPandas(
        _mg_partition(capacity), schema="token string"
    ).distinct()


def heavy_hitters(
    tokens: DataFrame, inv_threshold: int, capacity: int | None = None
) -> DataFrame:
    """Tokens with exact global frequency > N / inv_threshold.

    Two passes over the token stream:
      1. MG candidate generation (bounded memory, no token shuffle —
         only <= capacity survivors per partition move).
      2. ONE combined recount: every token is counted, but keyed to
         NULL unless it is a (broadcast) candidate — the long tail
         collapses into a single group per partition via map-side
         combine, so the shuffle carries |candidates|+1 groups. The
         same aggregation yields N (sum over all groups), so no third
         scan.

    capacity defaults to 2 * inv_threshold ( > inv_threshold - 1, the
    MG requirement for superset coverage of freq > N/inv_threshold).
    The exact recount makes the result independent of sketch internals
    — bit-identical to the oracle's full groupBy, at a fraction of the
    shuffle.
    """
    if capacity is None:
        capacity = 2 * inv_threshold
    if capacity < inv_threshold:
        raise ValueError(
            "MG capacity must be >= inv_threshold for superset coverage"
        )
    cands = heavy_hitter_candidates(tokens, capacity)
    keyed = tokens.join(
        F.broadcast(cands.withColumn("is_cand", F.lit(True))),
        "token",
        "left",
    ).select(
        F.when(F.col("is_cand"), F.col("token")).alias("ctoken")
    )
    # counts has |candidates|+1 rows — persist is O(capacity * partitions),
    # tiny at any scale; the one driver action reads N off it, then the
    # returned plan re-reads the cached table (no token re-scan).
    counts = keyed.groupBy("ctoken").agg(F.count("*").alias("cnt")).persist()
    # SUM over zero rows is NULL: an empty tokens input means no
    # heavy hitters, not a TypeError at F.lit(int(None)).
    total = counts.agg(F.sum("cnt")).collect()[0][0] or 0
    out = (
        counts.filter(F.col("ctoken").isNotNull())
        .filter(F.col("cnt") * inv_threshold > F.lit(int(total)))
        .select(F.col("ctoken").alias("token"), F.col("cnt"))
    )
    if total == 0:
        counts.unpersist()  # nothing downstream will read the cache
    return out


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows: P(overshoot > 2N/W on all rows) ~ 2^-4
CMS_W = 512  # buckets per row; expected overcount <= N/W per row


def cms_hash(row_i: int, key: Column) -> Column:
    """Row-i CMS hash: the shared 60-bit md5 idiom over 'i:key', so
    the D rows are independent hash functions with one primitive and
    the DuckDB twin is CAST(('0x' || substring(md5(i || ':' || key),
    1, 15)) AS BIGINT)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{row_i}:"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def cms_counters(
    df: DataFrame, key: Column, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Build the D x W count-min counter grid over one key column.

    One narrow projection fans each row out to its D (row_i, bucket)
    cells, then ONE hash aggregation counts cells. Map-side combine
    collapses each partition to <= D * W partial rows, so the shuffle
    is bounded by d * w * n_partitions however many billions of rows
    stream through — the property that makes CMS the standard
    frequency summary at 100 TB. Two grids built over different
    shards merge by summing matching cells (counter-wise addition);
    the result is identical to building one grid over the union,
    which is why the construction is partitioning-independent and
    bit-exact cross-engine.

    NULL keys hash to a NULL bucket and land in one (row_i, NULL)
    cell per row — retained so the grid accounts for every input row,
    and deterministic because both engines group NULLs together.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        (cms_hash(i, key) % w).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("c")
    ).select("c.row_i", "c.bucket")
    return cells.groupBy("row_i", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )


def cms_estimates(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point-frequency estimates for a (small) key set: for each key,
    min over its D counters. The counter grid (<= d * w rows) and the
    key set are both broadcast-sized, so estimation never shuffles
    anything bigger than |keys| * d rows. Output (key, cms_est) is
    integer-exact: est >= true frequency always (every occurrence of
    the key incremented all D of its cells).

    Keys need NOT come from the sketched corpus: the counter grid
    stores only non-empty cells, so each probe LEFT-joins and treats
    a missing cell as count 0 — an unseen key whose d cells are all
    empty correctly estimates 0 instead of being dropped or taking
    min over only its populated (collision) cells."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        (cms_hash(i, F.col(key_col)) % w).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.row_i", "c.bucket")
    return (
        probes.join(F.broadcast(counters), ["row_i", "bucket"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch with set operations
# ---------------------------------------------------------------------------
#
# The distinct sketch that supports SET ALGEBRA, which HLL registers
# cannot: keep the k smallest distinct hash values per set. Union =
# k smallest of the merged sketches; Jaccard = fraction of the
# union-k values present in both input sketches; intersection =
# Jaccard x union estimate. Every retained value is an exact integer
# (a content-addressed hash), so sketch CONTENTS are hash-comparable
# cross-engine; only the final cardinality estimates are floats,
# derived from the integer sufficient statistics.

KMV_K = 128
KMV_HASH_SPACE = 1 << 60  # the md5-long idiom yields 60-bit hashes


def kmv_partition_prune(k: int = KMV_K):
    """mapInPandas stage: per partition, keep the k smallest DISTINCT
    hashes per group — the bounded-memory pre-aggregation that makes a
    KMV build scale (the global k smallest of per-partition k-smallest
    unions IS the global k smallest; duplicates of non-kept values are
    >= the kept maximum and can never enter the global sketch).
    Output is <= |groups| * k rows per partition however many rows
    stream through. Expects columns (grp string, hv long)."""
    import heapq
    from typing import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kept: dict[str, list[int]] = {}  # grp -> max-heap (negated)
        members: dict[str, set[int]] = {}
        for pdf in batches:
            # A NULL in the Arrow batch converts the whole int64
            # column to float64, silently rounding 60-bit hashes
            # (> 2^53) — refuse loudly instead of corrupting the
            # sketch. kmv_sketches filters NULLs upstream, so a
            # float column here means a contract violation.
            if pdf["hv"].dtype.kind == "f":
                raise TypeError(
                    "kmv_partition_prune received a float hv column "
                    "(NULLs upstream?); 60-bit hashes do not survive "
                    "float64 — filter hv IS NOT NULL before the prune"
                )
            for grp, hv in zip(pdf["grp"], pdf["hv"]):
                if hv is None or pd.isna(hv):
                    continue
                hv = int(hv)
                heap = kept.setdefault(grp, [])
                mem = members.setdefault(grp, set())
                if hv in mem:
                    continue
                if len(heap) < k:
                    heapq.heappush(heap, -hv)
                    mem.add(hv)
                elif hv < -heap[0]:
                    out = -heapq.heappushpop(heap, -hv)
                    mem.discard(out)
                    mem.add(hv)
        yield pd.DataFrame(
            {
                "grp": [g for g, hs in kept.items() for _ in hs],
                "hv": [-h for hs in kept.values() for h in hs],
            }
        )

    return run


def kmv_sketches(
    pairs: DataFrame, grp_col: str, hv_col: str, k: int = KMV_K
) -> DataFrame:
    """(grp, hv, rn<=k) sketch rows: the k smallest distinct hashes
    per group. Pipeline: per-partition bounded prune (mapInPandas) ->
    distinct (now <= |groups| * k * n_partitions rows) -> one window
    for the global rank. The big input never shuffles; only pruned
    candidates do."""
    from pyspark.sql import Window as W

    pre = (
        pairs.select(
            F.col(grp_col).cast("string").alias("grp"),
            F.col(hv_col).cast("long").alias("hv"),
        )
        # NULL hashes carry no distinct value AND would flip the Arrow
        # batch to float64 (see kmv_partition_prune) — drop them here
        .filter(F.col("hv").isNotNull())
        .mapInPandas(kmv_partition_prune(k), schema="grp string, hv long")
    )
    wk = W.partitionBy("grp").orderBy("hv")
    return (
        pre.distinct()
        .select("grp", "hv", F.row_number().over(wk).alias("rn"))
        .filter(F.col("rn") <= k)
    )


def kmv_estimate(n_kept: int, kth_hash: int, k: int) -> float:
    """Driver-side distinct-count estimate from the integer stats:
    (k - 1) * HASH_SPACE / kth_hash when the sketch is full, else the
    exact kept count (sketch holds the whole set)."""
    if n_kept < k:
        return float(n_kept)
    return (k - 1) * KMV_HASH_SPACE / kth_hash
