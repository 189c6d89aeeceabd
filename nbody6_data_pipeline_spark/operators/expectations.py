"""Declarative data-quality expectations (dbt-test / Great-Expectations
shape) as ONE aggregation pass per table.

An expectation is (name, violation predicate). `expectation_report`
compiles all of a table's expectations into a single select of
conditional counts — one scan, map-side combined, no per-check jobs —
then unpivots to the (check, n_checked, n_violations) report shape.
Cross-table checks (referential integrity) are LEFT-ANTI join counts.

This is the gate a production pipeline runs before promoting a batch:
at 100 TB each report is one pass over the new partition, and the
unpivoted shape feeds the same alerting tables regardless of which
table was checked. Complements operators/validate.py (hard in-plan
assertions) with a reporting, non-failing surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectation_report(
    df: DataFrame, checks: dict[str, Column], table: str
) -> DataFrame:
    """One-scan expectations report.

    checks: {check_name: violation_predicate (Column<bool>)}.
    Returns DataFrame[table, check_name, n_checked, n_violations]
    with one row per check, all computed in a single aggregate.

    Check names are restricted to [A-Za-z_][A-Za-z0-9_]* because they
    are interpolated into the stack(...) expression as quoted literals
    and backticked identifiers — a quote or backtick in a name would
    otherwise break (or inject into) the generated SQL.
    """
    import re

    if not checks:
        raise ValueError("expectation_report needs at least one check")
    for name in checks:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(f"invalid check name {name!r}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in checks.items():
        # count(when(...)), not sum(when/otherwise): COUNT is 0 over
        # an EMPTY batch where SUM is NULL — an empty promotion batch
        # has zero violations, not unknown (zero-row twin parity)
        aggs.append(F.count(F.when(pred, 1)).cast("long").alias(name))
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{name}', `{name}`" for name in checks)
    return wide.select(
        F.lit(table).alias("table_name"),
        F.expr(
            f"stack({len(checks)}, {stack}) as (check_name, n_violations)"
        ),
        F.col("__n").alias("n_checked"),
    ).select("table_name", "check_name", "n_checked", "n_violations")


def anti_join_count(
    child: DataFrame, parent: DataFrame, on: str, parent_key: str
) -> DataFrame:
    """Referential-integrity violation count: child rows whose key has
    no match in parent (left-anti join, broadcast when parent is
    dimension-sized)."""
    return child.join(
        parent.select(F.col(parent_key).alias(on)).distinct(),
        on,
        "left_anti",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
