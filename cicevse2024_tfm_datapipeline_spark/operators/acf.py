"""W7: autocorrelation of a demeaned series (SURVEY §2.6).

Reference (func_aux/func_plot.py:43-54): full ACF of x - mean(x) up to
max_lag, normalized by lag-0 energy.

Spark shape: for a fixed lag set, one pass — ``lag(x, k)`` columns over the
series order, then a single aggregation of the cross products. The demean
uses a scalar subquery-style first agg (tiny job). No self-join needed;
each lag is a window shift, all computed in one shuffle by the series key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def acf(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[str],
    lags: Sequence[int],
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Rows (lag, acf_value) per partition group. lag 0 → 1.0.

    Demeaning is per series: with ``partition_cols`` each group subtracts
    its OWN mean (a frame-less window avg over the same partitioning — no
    extra shuffle, no driver round-trip); without, the reference's single
    global series demeans by the global mean (one tiny scalar job).
    """
    order = [F.col(c).asc() for c in order_cols]
    if partition_cols:
        win = W.partitionBy(*partition_cols).orderBy(*order)
        mean_win = W.partitionBy(*partition_cols)
        x = (F.col(value_col) - F.avg(value_col).over(mean_win)).alias("__x")
    else:
        win = W.orderBy(*order)
        mean_val = df.agg(F.avg(value_col)).collect()[0][0] or 0.0
        x = (F.col(value_col) - F.lit(float(mean_val))).alias("__x")

    demeaned = df.select(*df.columns, x)
    aggs = [F.sum(F.col("__x") * F.col("__x")).alias("__e0")]
    shifted = demeaned
    for k in lags:
        if k == 0:
            continue
        shifted = shifted.withColumn(f"__x_{k}", F.lag("__x", k).over(win))
        aggs.append(F.sum(F.col("__x") * F.col(f"__x_{k}")).alias(f"__e{k}"))
    grouped = shifted.groupBy(*partition_cols) if partition_cols else shifted.groupBy()
    energies = grouped.agg(*aggs)

    pairs = []
    for k in lags:
        val = F.lit(1.0) if k == 0 else F.col(f"__e{k}") / F.col("__e0")
        pairs.append(F.struct(F.lit(k).alias("lag"), val.alias("acf_value")))
    exploded = energies.select(
        *partition_cols, F.explode(F.array(*pairs)).alias("__p")
    )
    return exploded.select(*partition_cols, F.col("__p.lag"), F.col("__p.acf_value"))
