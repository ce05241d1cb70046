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
