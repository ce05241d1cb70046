"""W8-W10: top-K selection and ordered outputs (SURVEY §2.6).

Reference: sort importances desc, take K
(pipelines_host/pipeline_trainingmodels_host.py:57-97); argsort top-20
(func_aux/func_models.py:252-254); global resorts after unions.

Spark shape: ``orderBy(desc).limit(K)`` — Catalyst turns it into
TakeOrderedAndProject, a per-partition heap + driver merge: no global sort,
no full shuffle, scales to any input size. Per-group top-K uses
row_number over a partitioned window instead (one shuffle by group).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-K (TakeOrderedAndProject — heap, not sort)."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, group_cols: Sequence[str], order: Sequence[Column], k: int
) -> DataFrame:
    win = W.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rank", F.row_number().over(win))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def group_mode(df: DataFrame, key_cols: Sequence[str], value_col: str) -> DataFrame:
    """A5/J4: per-key modal value (most frequent; ties → smallest value,
    matching pandas ``mode()[0]``) — func_aux/func_plot.py:146-153."""
    counted = df.groupBy(*key_cols, value_col).agg(F.count(F.lit(1)).alias("__n"))
    win = W.partitionBy(*key_cols).orderBy(F.desc("__n"), F.asc(value_col))
    return (
        counted.withColumn("__rank", F.row_number().over(win))
        .filter(F.col("__rank") == 1)
        .drop("__rank", "__n")
    )
