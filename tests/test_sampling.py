"""Deterministic stratified sampling: allocation arithmetic, determinism,
and partitioning-independence (the distributed-determinism property the
single-process reference gets for free)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.sampling import (
    stratified_sample_frac,
    stratified_sample_n,
)


def _toy(spark, parts=1):
    pdf = pd.DataFrame(
        {
            "cls": ["a"] * 100 + ["b"] * 37 + ["c"] * 3,
            "id": range(140),
        }
    )
    return spark.createDataFrame(pdf).repartition(parts)


def test_sample_n_caps_per_class(spark):
    out = (
        stratified_sample_n(_toy(spark), ["cls"], "id", 10, seed=1)
        .groupBy("cls")
        .count()
        .collect()
    )
    got = {r["cls"]: r["count"] for r in out}
    assert got == {"a": 10, "b": 10, "c": 3}  # small class kept whole


def test_sample_frac_floor_allocation(spark):
    out = (
        stratified_sample_frac(_toy(spark), ["cls"], "id", 0.5, seed=1)
        .groupBy("cls")
        .count()
        .collect()
    )
    got = {r["cls"]: r["count"] for r in out}
    assert got == {"a": 50, "b": 18, "c": 1}  # floor(frac*n) exactly


def test_sample_partitioning_independent(spark):
    a = {r["id"] for r in stratified_sample_n(_toy(spark, 1), ["cls"], "id", 10, seed=3).collect()}
    b = {r["id"] for r in stratified_sample_n(_toy(spark, 7), ["cls"], "id", 10, seed=3).collect()}
    assert a == b


def test_sample_seed_changes_selection(spark):
    a = {r["id"] for r in stratified_sample_n(_toy(spark), ["cls"], "id", 10, seed=3).collect()}
    b = {r["id"] for r in stratified_sample_n(_toy(spark), ["cls"], "id", 10, seed=4).collect()}
    assert a != b  # md5 rank reshuffles with the seed
    # class-c rows (only 3) always survive either way
    assert {137, 138, 139} <= a and {137, 138, 139} <= b


def test_mixture_sample_quotas_and_determinism(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.sampling import mixture_sample

    pdf = pd.DataFrame(
        {
            "src": ["web"] * 60 + ["books"] * 30 + ["code"] * 5 + ["junk"] * 20,
            "id": range(115),
        }
    )
    df = spark.createDataFrame(pdf)
    w = {"web": 0.5, "books": 0.3, "code": 0.2}
    out = mixture_sample(df, "src", "id", w, total=40, seed=2)
    counts = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    # quotas floor(40*w): web 20, books 12; code capped at its 5 rows;
    # junk excluded (no weight)
    assert counts == {"web": 20, "books": 12, "code": 5}

    again = mixture_sample(df.repartition(9), "src", "id", w, total=40, seed=2)
    assert {r["id"] for r in again.collect()} == {r["id"] for r in out.collect()}


def test_weighted_sample_deterministic_and_biased(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.sampling import weighted_sample_n

    pdf = pd.DataFrame(
        {
            "id": range(400),
            # first 200 rows carry 50× the weight of the rest
            "w": [50.0] * 200 + [1.0] * 200,
        }
    )
    df = spark.createDataFrame(pdf)
    kept = weighted_sample_n(df, "w", "id", 80, seed=3)
    rows = kept.collect()
    assert len(rows) == 80
    heavy = sum(1 for r in rows if r["id"] < 200)
    # E[heavy] ≈ 80·(200·50)/(200·51) ≈ 78 — far above the uniform 40
    assert heavy > 60, heavy
    again = {r["id"] for r in weighted_sample_n(df.repartition(7), "w", "id", 80, seed=3).collect()}
    assert again == {r["id"] for r in rows}
