"""F10/F11: categorical integer encoding (SURVEY §2.3).

sklearn ``LabelEncoder`` assigns codes by lexicographic class order
(func_aux/func_preproc.py:144-145); pandas ``cat.codes`` likewise sorts
categories. Both are exactly ``dense_rank() - 1`` over the sorted distinct
values — reproduced here either as a window expression (small cardinality)
or as a broadcast join against a ranked distinct frame (the scalable form:
the distinct set is tiny even at 100 TB, so the join broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def label_encode(df: DataFrame, col: str, out_col: str = "y") -> DataFrame:
    """Dense-rank label encoding via broadcast join (null-safe: nulls get
    no code, as sklearn would error — callers drop nulls first, P5)."""
    codes = (
        df.select(col)
        .na.drop(subset=[col])
        .distinct()
        .withColumn(out_col, F.dense_rank().over(W.orderBy(F.col(col))) - F.lit(1))
    )
    return df.join(F.broadcast(codes), col, "left")


def category_codes(df: DataFrame, cols: list[str], suffix: str = "_code") -> DataFrame:
    """pandas ``astype('category').cat.codes`` per object column
    (pipeline_trainingmodels_network.py:399-401): lexicographic codes,
    null → -1."""
    out = df
    for c in cols:
        codes = (
            df.select(c)
            .na.drop(subset=[c])
            .distinct()
            .withColumn(f"{c}{suffix}", F.dense_rank().over(W.orderBy(F.col(c))) - F.lit(1))
        )
        out = out.join(F.broadcast(codes), c, "left").withColumn(
            f"{c}{suffix}", F.coalesce(F.col(f"{c}{suffix}"), F.lit(-1))
        )
    return out
