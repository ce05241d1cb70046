"""Deterministic stratified sampling for training-data pipelines.

The reference balances classes with capped class weights
(func_aux/func_models.py:55-62); the data-side counterpart at 100 TB is
downsampling dominant classes BEFORE featurization. Seeded `rand()` is
partitioning-dependent in a distributed engine, so we rank rows within
each class by a salted content hash instead: the sample is a pure
function of (row identity, seed) — identical on any cluster layout,
resumable, and oracle-checkable in SQL.

One shuffle by class (the ranking window); the hash is computed in the
scan stage. Skewed classes are exactly the case this operator exists
for — the dominant class's partition carries the bulk, and AQE's skew
splitting applies to the surrounding stages.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def stratified_sample_n(
    df: DataFrame,
    class_cols: Sequence[str],
    id_col: str,
    n_per_class: int,
    seed: int = 0,
) -> DataFrame:
    """Keep at most ``n_per_class`` rows per class, chosen by md5-hash
    rank of (seed, id) — deterministic, uniform within class, portable
    (md5 is identical across engines, unlike seeded rand())."""
    key = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string")))
    win = W.partitionBy(*class_cols).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__srk", F.row_number().over(win))
        .filter(F.col("__srk") <= n_per_class)
        .drop("__srk")
    )


def stratified_sample_frac(
    df: DataFrame,
    class_cols: Sequence[str],
    id_col: str,
    frac: float,
    seed: int = 0,
) -> DataFrame:
    """Keep ``floor(frac * n_class)`` rows per class (exact allocation,
    same hash-rank order as :func:`stratified_sample_n`)."""
    key = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string")))
    win = W.partitionBy(*class_cols).orderBy(key.asc(), F.col(id_col).asc())
    cnt = W.partitionBy(*class_cols)
    return (
        df.withColumn("__srk", F.row_number().over(win))
        .withColumn("__sn", F.count(F.lit(1)).over(cnt))
        .filter(F.col("__srk") <= F.floor(F.lit(frac) * F.col("__sn")))
        .drop("__srk", "__sn")
    )


def weighted_sample_n(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    n: int,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
    each row gets key ``ln(u) / w`` with ``u`` a deterministic uniform
    derived from md5(seed, id); the ``n`` largest keys are the sample, so
    inclusion probability is proportional to ``weight_col`` (e.g. length
    → uniform over tokens, the token-budget corpus subsample).

    The uniform is the first 8 hex digits of the md5 mapped to (0,1) —
    identical in any engine, partitioning-independent, SQL-reproducible.
    Selection is ``orderBy().limit(n)`` = TakeOrderedAndProject:
    per-partition top-n heaps then a driver merge of n·P candidates — no
    global sort, no unpartitioned window, safe at any corpus size for
    bounded n."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    key = F.log(u) / F.col(weight_col)
    return (
        df.withColumn("__wkey", key)
        .orderBy(F.col("__wkey").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("__wkey")
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    total: int,
    seed: int = 0,
) -> DataFrame:
    """Dataset mixing: draw ``floor(total * w_s)`` rows from each source
    (capped at the source's size), selected by the same deterministic
    hash-rank as :func:`stratified_sample_n`. The weights table is a
    literal broadcast join — the standard way a training run upweights
    curated sources and downweights crawl data. Sources absent from
    ``weights`` contribute nothing."""
    from cicevse2024_tfm_datapipeline_spark.functions.literals import literal_df

    quota = literal_df(
        df.sparkSession,
        [(s, int(total * w)) for s, w in weights.items()],
        schema=f"{source_col} string, __quota int",
    )
    key = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string")))
    win = W.partitionBy(source_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.join(F.broadcast(quota), source_col, "inner")
        .withColumn("__srk", F.row_number().over(win))
        .filter(F.col("__srk") <= F.col("__quota"))
        .drop("__srk", "__quota")
    )
