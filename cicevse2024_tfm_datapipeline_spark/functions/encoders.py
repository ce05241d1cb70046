"""F10/F11: categorical integer encoding (SURVEY §2.3).

sklearn ``LabelEncoder`` assigns codes by lexicographic class order
(func_aux/func_preproc.py:144-145); pandas ``cat.codes`` likewise sorts
categories. Both are exactly "number of strictly-smaller distinct values"
— computed window-free as a triangle count join over the tiny distinct
frame (|D|² comparisons on a label domain is nothing, and it keeps the
engine's no-unpartitioned-window invariant absolute), then broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lex_codes(distinct_df: DataFrame, col: str, out_col: str) -> DataFrame:
    """code = count of strictly lexicographically smaller distinct values
    (≡ dense_rank() − 1 over the sorted domain, without a window)."""
    b = distinct_df.select(F.col(col).alias("__b"))
    return (
        distinct_df.join(F.broadcast(b), F.col("__b") < F.col(col), "left")
        .groupBy(col)
        .agg(F.count("__b").alias(out_col))
    )


def label_encode(df: DataFrame, col: str, out_col: str = "y") -> DataFrame:
    """Dense-rank label encoding via broadcast join (null-safe: nulls get
    no code, as sklearn would error — callers drop nulls first, P5)."""
    codes = _lex_codes(df.select(col).na.drop(subset=[col]).distinct(), col, out_col)
    return df.join(F.broadcast(codes), col, "left")


def category_codes(df: DataFrame, cols: list[str], suffix: str = "_code") -> DataFrame:
    """pandas ``astype('category').cat.codes`` per object column
    (pipeline_trainingmodels_network.py:399-401): lexicographic codes,
    null → -1."""
    out = df
    for c in cols:
        codes = _lex_codes(df.select(c).na.drop(subset=[c]).distinct(), c, f"{c}{suffix}")
        out = out.join(F.broadcast(codes), c, "left").withColumn(
            f"{c}{suffix}", F.coalesce(F.col(f"{c}{suffix}"), F.lit(-1))
        )
    return out
