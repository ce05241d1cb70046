"""Data-quality constraint checks (dbt-test / expectations style).

Every producer-facing pipeline gates ingestion on declarative
constraints — key uniqueness, non-null, value domains, referential
integrity, numeric ranges. Each check here compiles to ONE aggregation
over the audited table (violations are counted, not materialized, so a
check costs a scan + a 1-row result at any scale); referential checks
broadcast the parent key set when it fits and degrade to a shuffle
semi-join otherwise. ``run_checks`` unions the 1-row results into the
audit report frame.

Counting-not-collecting is the 100 TB posture: the report is bounded by
the number of checks, and a follow-up query can materialize offending
rows for any failed check (same predicate, filter instead of count).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "check_unique",
    "check_not_null",
    "check_in_range",
    "check_accepted_values",
    "check_referential",
    "run_checks",
]


def _report(df: DataFrame, check: str, checked, violations) -> DataFrame:
    return df.agg(
        F.lit(check).alias("check"),
        checked.cast("long").alias("n_checked"),
        violations.cast("long").alias("n_violations"),
    )


def check_unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Violations = rows beyond the first per key (0 iff the key is
    unique). One groupBy on the key."""
    per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n"))
    return _report(
        per_key,
        name or f"unique({', '.join(cols)})",
        F.sum("__n"),
        F.sum(F.col("__n") - 1),
    )


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    return _report(
        df, f"not_null({col})", F.count(F.lit(1)), F.sum(F.col(col).isNull().cast("long"))
    )


def check_in_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    bad = ~F.col(col).between(F.lit(lo), F.lit(hi))
    return _report(
        df,
        f"range({col} in [{lo}, {hi}])",
        F.count(F.lit(1)),
        F.sum(F.coalesce(bad.cast("long"), F.lit(1))),
    )


def check_accepted_values(df: DataFrame, col: str, values: list) -> DataFrame:
    bad = ~F.col(col).isin(values)
    return _report(
        df,
        f"accepted_values({col})",
        F.count(F.lit(1)),
        F.sum(F.coalesce(bad.cast("long"), F.lit(1))),
    )


def check_referential(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Orphaned children: child keys with no matching parent. Anti-join;
    AQE broadcasts the parent key set when it fits."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    n_checked = child.agg(F.count(F.lit(1)).alias("__n"))
    n_bad = orphans.agg(F.count(F.lit(1)).alias("__v"))
    return (
        n_checked.crossJoin(n_bad)
        .select(
            F.lit(f"referential({child_key} -> {parent_key})").alias("check"),
            F.col("__n").cast("long").alias("n_checked"),
            F.col("__v").cast("long").alias("n_violations"),
        )
    )


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union the 1-row check results into the audit report."""
    if not checks:
        raise ValueError("no checks given")
    return reduce(lambda a, b: a.unionByName(b), checks)
