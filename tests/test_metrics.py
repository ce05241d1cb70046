"""A10-A13 metric machinery vs direct reimplementations of the reference
semantics (/root/reference/func_aux/func_test.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_binary_confusion_cells(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.metrics import binary_confusion_rates

    rows = [(1, 1)] * 10 + [(1, 0)] * 5 + [(0, 1)] * 3 + [(0, 0)] * 20
    df = spark.createDataFrame(rows, ["yt", "yp"])
    r = binary_confusion_rates(df, "yt", "yp").collect()[0]
    assert (r["tn"], r["fp"], r["fn"], r["tp"]) == (20, 3, 5, 10)
    assert abs(r["fpr"] - 3 / 23) < 1e-12
    assert abs(r["tpr"] - 10 / (15 + 1e-12)) < 1e-12


def test_threshold_at_fpr_reference_pick(spark):
    """Largest-FPR-≤-target pick with fallback (func_test.py:252-269)."""
    from cicevse2024_tfm_datapipeline_spark.operators.metrics import roc_points, threshold_at_fpr

    # scores: negatives at .1/.2/.3/.4, positives at .35/.45/.5
    rows = [(0, 0.1), (0, 0.2), (0, 0.3), (0, 0.4), (1, 0.35), (1, 0.45), (1, 0.5)]
    df = spark.createDataFrame(rows, ["yt", "s"])
    # target 0.25: candidates fpr ≤ 0.25; the reference picks
    # idx_candidates[-1] = the LAST ascending-fpr candidate = highest tpr
    # → threshold 0.35 (fpr 0.25, tpr 1.0), not 0.4 (fpr 0.25, tpr 2/3)
    r = threshold_at_fpr(df, "yt", "s", 0.25).collect()[0]
    assert abs(r["fpr"] - 0.25) < 1e-12
    assert r["threshold"] == 0.35
    assert abs(r["tpr"] - 1.0) < 1e-12
    # impossible target → nearest |fpr - t|
    r2 = threshold_at_fpr(df, "yt", "s", -0.5).collect()[0]
    assert abs(r2["fpr"] - 0.0) < 1e-12

    pts = {p["threshold"]: (p["fpr"], p["tpr"]) for p in roc_points(df, "yt", "s").collect()}
    assert pts[0.5] == (0.0, 1 / 3)
    assert pts[0.1] == (1.0, 1.0)


def test_roc_auc_matches_hand_computation(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.metrics import roc_auc_trapezoid

    # perfect separation → AUC 1; anti-separation → 0
    perfect = spark.createDataFrame([(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)], ["yt", "s"])
    assert abs(roc_auc_trapezoid(perfect, "yt", "s").collect()[0]["roc_auc"] - 1.0) < 1e-12
    inverted = spark.createDataFrame([(0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1)], ["yt", "s"])
    assert abs(roc_auc_trapezoid(inverted, "yt", "s").collect()[0]["roc_auc"]) < 1e-12


def test_multiclass_accuracy_and_macro(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.metrics import multiclass_point_metrics

    rows = [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a")]
    df = spark.createDataFrame(rows, ["yt", "yp"])
    r = multiclass_point_metrics(df, "yt", "yp").collect()[0]
    assert abs(r["accuracy"] - 3 / 5) < 1e-12
    # recalls: a=1/2, b=1, c=0 → balanced = 0.5
    assert abs(r["balanced_accuracy"] - 0.5) < 1e-12


def test_clopper_pearson_known_values():
    from cicevse2024_tfm_datapipeline_spark.operators.metrics import clopper_pearson_ci

    lo, hi = clopper_pearson_ci(0, 100, alpha=0.05)
    assert lo == 0.0
    assert abs(hi - 0.03621669264) < 1e-6  # 1-(α/2)^(1/n) exact for k=0
    lo2, hi2 = clopper_pearson_ci(5, 100, alpha=0.05)
    assert 0.015 < lo2 < 0.017  # known ≈ 0.0164
    assert 0.112 < hi2 < 0.114  # known ≈ 0.1128
    assert math.isnan(clopper_pearson_ci(0, 0)[0])


def test_sample_size_calculator():
    from cicevse2024_tfm_datapipeline_spark.ml.models import n_required_for_fpr

    # ln(1/0.05)/1e-3 ≈ 2996
    assert n_required_for_fpr(1e-3, 0.05) == 2996
