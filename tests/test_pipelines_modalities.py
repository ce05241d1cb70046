"""§3.2/§3.3 host and network pipeline drivers + artifact sinks (S4/S8)
and remaining scalar surface (F7 maps, F15)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "modal")


def test_host_pipeline_topk_selection(spark):
    from cicevse2024_tfm_datapipeline_spark.pipelines import PipelineConfig, run_host_pipeline
    from cicevse2024_tfm_datapipeline_spark.plans.common import power_view

    pv = power_view(spark, "/root/testdata/sf0.001")
    # fabricate a wide host-like frame: two candidate features
    host = pv.withColumn("ev_a", F.col("value") * 2).withColumn("ev_b", -F.col("value"))
    importances = [("ev_b", 0.9), ("ev_a", 0.5), ("missing_feature", 1.0)]
    cfg = PipelineConfig(task="binary", seq_len=4, step=2)
    art = run_host_pipeline(spark, host, importances, cfg, top_k=1)
    # top-1 existing feature by importance is ev_b
    assert art["config"]["features"][0] == "ev_b"
    assert art["n_windows"]["train"] > 0


def test_network_pipeline_end_to_end(spark):
    from cicevse2024_tfm_datapipeline_spark.pipelines import PipelineConfig, run_network_pipeline

    d = os.path.join(SCRATCH, "netraw")
    os.makedirs(d, exist_ok=True)
    import random

    rng = random.Random(7)
    files = {
        "EVSE-B-idle-benign.csv": "idle benign",
        "EVSE-B-charging-syn-flood.csv": "charging syn flood",
        "EVSE-A-idle-benign.csv": "ignored (EVSE A)",
    }
    for name in files:
        with open(os.path.join(d, name), "w") as fh:
            fh.write("pkts,bytes,const_col,src_ip\n")
            for _ in range(40):
                fh.write(f"{rng.randint(1, 99)},{rng.randint(100, 999)},1,10.0.0.1\n")
    cfg = PipelineConfig(task="binary", seq_len=3, step=1)
    art = run_network_pipeline(spark, os.path.join(d, "*.csv"), cfg, evse="B")
    assert art["n_windows"]["train"] > 0
    # narrowing dropped the constant and blocklisted columns
    assert "const_col" not in art["config"]["features"]
    assert "src_ip" not in art["config"]["features"]


def test_f7_label_mapping_applied(spark):
    from cicevse2024_tfm_datapipeline_spark.functions.network_maps import (
        ATTACK_TO_SCENARIO,
        LABEL_MAPPING,
        apply_mapping,
    )

    df = spark.createDataFrame(
        [("charging syn flood",), ("idle portscan",), ("unknown label",)], ["raw"]
    )
    out = apply_mapping(df, LABEL_MAPPING, "raw", "attack")
    got = {r["raw"]: r["attack"] for r in out.collect()}
    assert got["charging syn flood"] == "syn-flood"
    assert got["idle portscan"] == "TCP-port-scan"
    assert got["unknown label"] == "unknown label"  # fallback = raw
    out2 = apply_mapping(out, ATTACK_TO_SCENARIO, "attack", "scenario", F.lit("Benign"))
    got2 = {r["raw"]: r["scenario"] for r in out2.collect()}
    assert got2["charging syn flood"] == "DoS"
    assert got2["unknown label"] == "Benign"


def test_s4_csv_sink_roundtrip(spark):
    out = os.path.join(SCRATCH, "csv_sink")
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2.0).alias("v"))
    df.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.csv(out, header=True, inferSchema=True)
    assert back.count() == 10
    assert {r["id"]: r["v"] for r in back.collect()}[3] == 6.0


def test_s8_model_artifact_roundtrip(spark):
    from cicevse2024_tfm_datapipeline_spark.ml.models import fit_surrogate_tree
    from pyspark.ml.classification import DecisionTreeClassificationModel

    df = spark.createDataFrame(
        [(float(i), float(i % 3), "a" if i % 2 else "b") for i in range(30)],
        ["f1", "f2", "lab"],
    )
    model, _ = fit_surrogate_tree(df, ["f1", "f2"], "lab", max_depth=2)
    path = os.path.join(SCRATCH, "tree_model")
    model.write().overwrite().save(path)
    loaded = DecisionTreeClassificationModel.load(path)
    assert loaded.depth == model.depth
    assert "DecisionTree" in model.toDebugString


def test_f15_proba_pair(spark):
    from cicevse2024_tfm_datapipeline_spark.functions.scalars import proba_pair_expr

    df = spark.createDataFrame([(0.3,), (0.9,)], ["p"])
    out = [r["pp"] for r in df.select(proba_pair_expr("p").alias("pp")).collect()]
    assert out[0][0] == 0.7 and abs(out[0][1] - 0.3) < 1e-12
    assert abs(out[1][0] - 0.1) < 1e-12
