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
