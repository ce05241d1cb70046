"""Skew-salting and bucketing utilities (SCALE.md operational layer)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_salted_sum_count_matches_plain(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.skew import salted_sum_count

    # one hot key (90% of rows) + tail
    rows = [("hot", float(i % 10)) for i in range(900)] + [
        (f"k{i % 7}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    salted = {r["k"]: (r["v_sum"], r["n_rows"]) for r in salted_sum_count(df, ["k"], "v").collect()}
    plain = {
        r["k"]: (r["s"], r["n"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert salted[k][1] == plain[k][1]
        assert abs(salted[k][0] - plain[k][0]) < 1e-6


def test_salted_broadcast_join_matches_plain(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.skew import salted_broadcast_join

    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i % 3}") for i in range(500)], ["rid", "k"]
    )
    dim = spark.createDataFrame([("hot", "H"), ("k0", "A"), ("k1", "B")], ["k", "grp"])
    out = salted_broadcast_join(fact, dim, "k")
    plain = fact.join(dim, "k", "left")
    assert out.count() == plain.count() == 500
    a = {r["rid"]: r["grp"] for r in out.collect()}
    b = {r["rid"]: r["grp"] for r in plain.collect()}
    assert a == b


def test_bucketed_join_has_no_exchange(spark):
    from cicevse2024_tfm_datapipeline_spark.sources.bucketing import bucketed_join, write_bucketed

    left = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
    right = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("y"))
    write_bucketed(left, "t_left_bkt", "k", n_buckets=4)
    write_bucketed(right, "t_right_bkt", "k", n_buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge join (broadcast would hide the bucketing win)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "t_left_bkt", "t_right_bkt", "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
