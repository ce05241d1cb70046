"""Wave-37 operators: fairness gaps on a planted biased classifier,
Cramér's V extremes (perfect association vs independence), and lexical
diversity identities."""

from __future__ import annotations

import datetime
import math


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_fairness_planted_bias(spark, tmp_path):
    # group 0: always selected; group 1: never; group 2: half.
    # labels: all positive for simplicity -> TPR = selection rate.
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add(uid, sel, n):
        nonlocal eid
        for i in range(n):
            v = 150.0 if (sel == 1 or (sel == 2 and i % 2 == 0)) else 50.0
            rows.append((eid, t0, uid, "purchase", v, ""))
            eid += 1

    add(0, 1, 10)  # grp 0 (0 % 3)
    add(1, 0, 10)  # grp 1
    add(2, 2, 10)  # grp 2
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r["grp"]: r for r in _q("a_fairness_parity_audit").spark(spark, str(tmp_path)).collect()}
    assert abs(out[0]["selection_rate"] - 1.0) < 1e-9
    assert abs(out[1]["selection_rate"] - 0.0) < 1e-9
    assert abs(out[2]["selection_rate"] - 0.5) < 1e-9
    assert abs(out[0]["disparate_impact_ratio"] - 0.0) < 1e-9
    assert abs(out[0]["equal_opportunity_gap"] - 1.0) < 1e-9


def test_cramers_v_extremes(spark, tmp_path):
    # segment determines priority exactly (V = 1); status is uniform
    # within every segment (V = 0 for segment|status).
    d = datetime.date(2024, 1, 1)
    cust, orders = [], []
    ok = 0
    for ck, seg in enumerate(["A", "B"]):
        cust.append((ck, f"c{ck}", 1, 0.0, seg))
        prio = "P1" if seg == "A" else "P2"
        for i in range(10):
            status = "O" if i % 2 == 0 else "F"
            orders.append((ok, ck, status, 1.0, d, prio))
            ok += 1
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r["pair"]: r for r in _q("a_cramers_v_matrix").spark(spark, str(tmp_path)).collect()}
    assert abs(out["segment|priority"]["cramers_v"] - 1.0) < 1e-6
    assert abs(out["segment|status"]["cramers_v"]) < 1e-6
    assert out["segment|priority"]["card_x"] == 2


def test_lexical_diversity_identities(spark, tmp_path):
    # doc A: 4 distinct of 4 -> ttr 1, rttr 4/2 = 2, herdan ln4/ln4 = 1.
    # doc B: 'x x x x' -> ttr 0.25, rttr 0.5, herdan 0.
    docs = [
        (0, "a b c d", "en", "s1", 7),
        (1, "x x x x", "en", "s2", 7),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in _q("text_lexical_diversity").spark(spark, str(tmp_path)).collect()}
    assert abs(out["s1"]["avg_ttr"] - 1.0) < 1e-9
    assert abs(out["s1"]["avg_root_ttr"] - 2.0) < 1e-9
    assert abs(out["s1"]["avg_herdan_c"] - 1.0) < 1e-9
    assert abs(out["s2"]["avg_ttr"] - 0.25) < 1e-9
    assert abs(out["s2"]["avg_root_ttr"] - 0.5) < 1e-9
    assert abs(out["s2"]["avg_herdan_c"] - 0.0) < 1e-9
    assert math.isclose(out["s1"]["n_docs"], 1)
