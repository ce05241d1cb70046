"""evaluate_binary_operational artifact contract + robustness sweep."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

REFERENCE_TEST_KEYS = {
    "TN", "FP", "FN", "TP", "FPR", "TPR", "TNR", "precision", "recall",
    "balanced_accuracy", "ROC_AUC", "PR_AUC", "F1", "F2", "F0_5",
    "FPR_CI_normal", "FPR_CI_clopper_pearson", "FPH_CI_normal",
    "FPH_CI_clopper_pearson", "false_positives_per_hour",
    "average_FP_per_hour", "avg_inference_latency_per_window_sec",
    "TTD_stats", "total_hours_test",
}


def _windows(spark, n=200, seed_shift=0):
    rows = []
    for i in range(n):
        y = 1 if (i // 20) % 2 else 0  # alternating 20-window episodes
        score = round(0.7 * y + 0.3 * ((i * 7 + seed_shift) % 10) / 10.0, 3)
        rows.append((i, y, score, f"ep{i // 20}" if y else "benign"))
    return spark.createDataFrame(rows, ["window_id", "y_true", "score", "episode"])


def test_artifact_keys_match_reference_contract(spark):
    from cicevse2024_tfm_datapipeline_spark.evaluation import evaluate_binary_operational

    val, test = _windows(spark, 200, 0), _windows(spark, 200, 3)
    art = evaluate_binary_operational(
        val, test, "y_true", "score", fpr_target=0.1,
        window_hop_seconds=2.0, episode_col="episode",
    )
    assert set(art) == {"threshold", "fpr_target", "validation", "test", "curves"}
    assert set(art["validation"]) == {"FPR", "TPR", "ROC_AUC"}
    assert set(art["test"]) == REFERENCE_TEST_KEYS
    assert art["test"]["TN"] + art["test"]["FP"] + art["test"]["FN"] + art["test"]["TP"] == 200
    # consistency: FPH = FPR × 3600/hop
    if not math.isnan(art["test"]["FPR"]):
        assert abs(
            art["test"]["false_positives_per_hour"] - art["test"]["FPR"] * 3600 / 2.0
        ) < 1e-6
    assert art["test"]["TTD_stats"]["episodes_total"] == 5
    assert len(art["curves"]["roc_test"]["fpr"]) > 2


def test_robustness_sweep_shape(spark):
    from cicevse2024_tfm_datapipeline_spark.evaluation import robustness_sweep

    rows = [(w, [[float(w + t)] for t in range(4)]) for w in range(10)]
    windows = spark.createDataFrame(rows, "window_id long, matrix array<array<double>>")

    def ev(df):
        s = df.select(F.sum(F.aggregate(F.flatten("matrix"), F.lit(0.0), lambda a, x: a + x))).collect()[0][0]
        return {"metric_sum": float(s)}

    res = robustness_sweep(
        windows, "matrix", "window_id", ev,
        kinds=("packet_loss",), severities=(0.0, 0.5), n_repeats=2,
    )
    assert len(res) == 4  # 1 kind × 2 severities × 2 repeats
    base = [r for r in res if r["severity"] == 0.0]
    degraded = [r for r in res if r["severity"] == 0.5]
    assert all(b["metric_sum"] == base[0]["metric_sum"] for b in base)
    assert all(d["metric_sum"] <= base[0]["metric_sum"] for d in degraded)  # zeroing lowers sum
