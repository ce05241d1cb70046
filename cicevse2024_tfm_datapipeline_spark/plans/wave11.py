"""Round-3 wave 11: the hashing trick (signed feature hashing) and
rolling-origin evaluation splits.

Feature hashing is the fixed-width featurizer (sklearn
HashingVectorizer) that needs NO vocabulary pass — the property that
makes it the one-scan featurizer at 100 TB; the sign hash unbiases
collisions in expectation. Rolling-origin splits are the time-series
counterpart of k-fold: each fold trains on everything before a moving
cutoff and tests on the next period, never leaking the future.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register
from cicevse2024_tfm_datapipeline_spark.plans.wave5 import _US
from cicevse2024_tfm_datapipeline_spark.plans.wave7 import _WEEK_US

_N_FEATS = 8

_HASH_SQL = "CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT)"


@register(
    "f_feature_hashing",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> '')) AS term
        FROM documents WHERE doc_id < 200
    ),
    h AS (
        SELECT doc_id,
               {_HASH_SQL} % {_N_FEATS} AS bucket,
               CASE WHEN ({_HASH_SQL} // {_N_FEATS}) % 2 = 0
                    THEN 1 ELSE -1 END AS sign
        FROM tf
    )
    SELECT doc_id,
           {", ".join(
               f"CAST(sum(CASE WHEN bucket = {b} THEN sign ELSE 0 END) AS BIGINT)"
               f" AS f{b}"
               for b in range(_N_FEATS)
           )}
    FROM h GROUP BY doc_id
    """,
    doc="Signed feature hashing (the hashing trick / sklearn "
    "HashingVectorizer): each term maps to one of 8 buckets by an md5 "
    "hash and contributes ±1 by an independent sign bit, producing a "
    "fixed-width integer feature vector with NO vocabulary pass and no "
    "fitted state — the only featurizer whose cost is one scan "
    "regardless of vocabulary size, which is why it is the 100 TB "
    "default. The sign hash makes collision noise zero-mean. One "
    "explode + one groupBy(doc) with conditional integer sums; both "
    "hashes are md5-derived so the exact vectors are engine-portable.",
    tags=("F", "hashing", "featurize"),
)
def f_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tf = docs.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("term"))
    hval = F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long")
    h = tf.select(
        "doc_id",
        (hval % _N_FEATS).alias("bucket"),
        F.when((F.expr(f"cast(conv(substring(md5(term), 1, 8), 16, 10) as bigint) div {_N_FEATS}") % 2) == 0, 1)
        .otherwise(-1)
        .alias("sign"),
    )
    return h.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("bucket") == b, F.col("sign")).otherwise(0))
            .cast("long")
            .alias(f"f{b}")
            for b in range(_N_FEATS)
        ]
    )


@register(
    "sample_rolling_origin_splits",
    oracle=f"""
    WITH wk AS (
        SELECT epoch_us(ts) // {_WEEK_US} AS week, count(*) AS n
        FROM events GROUP BY 1
    ),
    b AS (SELECT min(week) AS w0 FROM wk),
    folds AS (SELECT unnest(range(1, 4)) AS fold)
    SELECT f.fold,
           CAST(b.w0 + f.fold - 1 AS BIGINT) AS train_end_week,
           CAST(sum(CASE WHEN wk.week <= b.w0 + f.fold - 1 THEN wk.n
                         ELSE 0 END) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN wk.week = b.w0 + f.fold THEN wk.n
                         ELSE 0 END) AS BIGINT) AS n_test
    FROM folds f, wk, b
    GROUP BY f.fold, b.w0
    """,
    doc="Rolling-origin (expanding-window) evaluation splits — the "
    "time-series counterpart of k-fold CV: fold k trains on all weeks "
    "up to a moving cutoff and tests on the following week, so the "
    "future never leaks into training (random k-fold does leak for "
    "temporal data; this is the split protocol forecast evaluation "
    "requires). Computed from the tiny per-week count frame crossed "
    "with the 3-row fold spec — the only data-sized work is one "
    "week-bucket aggregation; weeks are integer epoch-weeks.",
    tags=("sample", "cv", "temporal"),
)
def sample_rolling_origin_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    wk = (
        t(spark, sf_dir, "events")
        .groupBy((F.expr(_US) / F.lit(_WEEK_US)).cast("long").alias("week"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    b = wk.agg(F.min("week").alias("w0"))
    fold_df = spark.range(1, 4).select(F.col("id").cast("long").alias("fold"))
    joined = fold_df.crossJoin(F.broadcast(b)).crossJoin(wk)
    return joined.groupBy("fold", "w0").agg(
        F.max(F.col("w0") + F.col("fold") - 1).cast("long").alias("train_end_week"),
        F.sum(
            F.when(F.col("week") <= F.col("w0") + F.col("fold") - 1, F.col("n")).otherwise(0)
        )
        .cast("long")
        .alias("n_train"),
        F.sum(
            F.when(F.col("week") == F.col("w0") + F.col("fold"), F.col("n")).otherwise(0)
        )
        .cast("long")
        .alias("n_test"),
    ).select("fold", "train_end_week", "n_train", "n_test")
