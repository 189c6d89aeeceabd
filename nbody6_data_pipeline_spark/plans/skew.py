"""Salted joins for skewed keys.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) handles
most skew at runtime by splitting oversized shuffle partitions — it is
the engine's first line of defense and needs no code. But AQE can only
split a partition of an ALREADY-SHUFFLED side; it cannot help when

- the skewed side feeds an aggregation-with-join pipeline where one
  hot key (a null-ish default id, a viral document, a degenerate LSH
  bucket) dwarfs every other key by orders of magnitude, or
- the join is a broadcast-ineligible large-dim lookup where one key's
  rows must still fan out across tasks.

``salted_join`` implements the classic explicit remedy: append a
random-ish salt in [0, n_salts) to the skewed (big) side's key, and
EXPLODE the small side once per salt value so every (key, salt)
combination still matches. The big side's hot key now spreads over
``n_salts`` shuffle partitions; the small side grows by a factor of
``n_salts`` (fine — it is the small side by assumption).

The salt is ``pmod(hash(monotonically_increasing_id()), n)`` — spread
is what matters, not randomness, and avoiding ``rand()`` keeps the
plan deterministic for retries/speculative tasks (a re-executed task
re-derives the same salt, so no row is double-counted after a
failure — the documented hazard of rand()-salting).

Verification: tests/test_skew.py asserts exact result parity with the
plain join on a synthetically skewed dataset, and that the salted
shuffle actually spreads the hot key across partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Join ``big`` (skewed on the join key) with ``small``, spreading
    each of ``big``'s keys across ``n_salts`` shuffle partitions.

    ``on`` lists equi-join key column(s) present on both sides. The
    result equals ``big.join(small, on, how)`` exactly (row
    multiplicity included); only the physical distribution differs.
    Supported ``how``: inner / left / left_outer (the shapes where the
    big side's rows survive — for right/full joins salt the other
    side).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    out = big_s.join(small_s, [*keys, "_salt"], how)
    return out.drop("_salt")
