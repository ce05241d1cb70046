"""M6 batch-inference pandas UDF + M1 gradient-boosting fallback."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_m6_predict_udf_batches(spark):
    from cicevse2024_tfm_datapipeline_spark.ml.models import predict_udf

    def predict_fn(X: np.ndarray) -> np.ndarray:
        # stand-in model: linear score — a Keras/XGB predict drops in here
        return X[:, 0] * 2.0 + X[:, 1]

    df = spark.createDataFrame(
        [(float(i), float(i % 3)) for i in range(100)], ["f1", "f2"]
    )
    apply = predict_udf(predict_fn, ["f1", "f2"])
    out = apply(df, "prediction")
    rows = {r["f1"]: r["prediction"] for r in out.collect()}
    assert rows[10.0] == 10.0 * 2 + (10 % 3)
    assert len(rows) == 100


def test_m1_gradient_boosting_fallback(spark):
    from cicevse2024_tfm_datapipeline_spark.ml.models import fit_gradient_boosting

    # separable binary data; label col must be numeric 0/1
    rows = [(float(i), float(-i), 1 if i > 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, ["f1", "f2", "label"])
    model = fit_gradient_boosting(df, ["f1", "f2"], "label", max_iter=3)
    from cicevse2024_tfm_datapipeline_spark.ml.models import assemble_features

    preds = model.transform(assemble_features(df, ["f1", "f2"])).select("label", "prediction")
    acc = preds.filter(F.col("label") == F.col("prediction")).count() / 100
    assert acc > 0.95


def _strip_uids(rules: str) -> str:
    # toDebugString embeds the per-fit model uid (dtc_<hex>) on its first
    # line; everything after it is the structural rule text
    import re

    return re.sub(r"uid=\w+", "uid=<model>", rules)


def test_m5_surrogate_determinism_and_fidelity(spark):
    """M5 fit contract (r03 verdict item 6): the only piece of the
    surrogate chain outside the oracle gate is the DecisionTree .fit —
    pin it. Same seed + same input → byte-identical rule text and
    importances across reruns; in fidelity mode (labels = base-model
    predictions, func_aux/func_models.py:177-273) the surrogate must
    reproduce the base model on its own training features."""
    from cicevse2024_tfm_datapipeline_spark.ml.models import (
        feature_importances,
        fit_surrogate_tree,
        tree_rules_text,
    )

    # deterministic fixture shaped like the A6 stats frame; base model =
    # an axis-aligned rule a depth-2 tree can represent exactly
    rows = [
        (
            float(i % 17) * 1.3,          # mean
            float((i * 7) % 11) * 0.5,    # std
            float(i % 5),                 # min
            float(i % 13) + 2.0,          # max
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["f_mean", "f_std", "f_min", "f_max"])
    base_pred = F.when(
        (F.col("f_mean") > 10.0) | (F.col("f_std") > 4.0), "attack"
    ).otherwise("benign")
    fixture = df.withColumn("base_pred", base_pred)
    feats = ["f_mean", "f_std", "f_min", "f_max"]

    m1, p1 = fit_surrogate_tree(fixture, feats, "base_pred", max_depth=3)
    m2, p2 = fit_surrogate_tree(fixture, feats, "base_pred", max_depth=3)

    # determinism: identical structure, rules, and importances
    assert _strip_uids(tree_rules_text(m1)) == _strip_uids(tree_rules_text(m2))
    assert feature_importances(m1, feats) == feature_importances(m2, feats)

    # fidelity: surrogate agrees with the base model it explains
    idx_order = sorted(fixture.select("base_pred").distinct().toPandas()["base_pred"])
    agree = p1.withColumn(
        "pred_label",
        F.when(F.col("prediction") == 0.0, idx_order[0]).otherwise(idx_order[1]),
    )
    n = agree.count()
    n_match = agree.filter(F.col("pred_label") == F.col("base_pred")).count()
    assert n == 300
    assert n_match / n >= 0.95, f"fidelity {n_match / n:.3f} below contract"
