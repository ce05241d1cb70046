"""Wave-40 operators: association-rule identities on planted baskets,
novelty extremes (verbatim copy vs fresh text), and holdout stability
invariants."""

from __future__ import annotations

import datetime


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_association_rules_planted(spark, tmp_path):
    # 40 baskets contain {B1, B2}; 60 baskets contain only B1 ->
    # rule B2 -> B1 has confidence 1.0, lift = 1.0 / P(B1) = 1.0;
    # rule B1 -> B2 has confidence 0.4, lift = 0.4 / 0.4 = 1.0... make
    # B1 present everywhere so lift(B2->B1)=1; add B3 baskets to make
    # P(B1) < 1 and lift > 1.
    li, part = [], []
    part.append((0, "p0", "B1", "T", 1, 1.0))
    part.append((1, "p1", "B2", "T", 1, 1.0))
    part.append((2, "p2", "B3", "T", 1, 1.0))
    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    oid = 0
    for _ in range(40):  # {B1,B2}
        rows.append((oid, 0, 0, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d0))
        rows.append((oid, 1, 0, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d0))
        oid += 1
    for _ in range(40):  # {B1}
        rows.append((oid, 0, 0, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d0))
        oid += 1
    for _ in range(20):  # {B3}
        rows.append((oid, 2, 0, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d0))
        oid += 1
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        part,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in _q("a_association_rules").spark(spark, str(tmp_path)).collect()
    }
    # B2 -> B1: support 40/100, confidence 40/40 = 1, P(B1) = 80/100 ->
    # lift = 1 / 0.8 = 1.25; conviction 0 (conf = 1 guard).
    r = out[("B2", "B1")]
    assert abs(r["support"] - 0.4) < 1e-9
    assert abs(r["confidence"] - 1.0) < 1e-9
    assert abs(r["lift"] - 1.25) < 1e-9
    assert r["conviction"] == 0.0
    # B1 -> B2: confidence 40/80 = 0.5, lift = 0.5/0.4 = 1.25,
    # conviction = (1 - 0.4)/(1 - 0.5) = 1.2.
    r2 = out[("B1", "B2")]
    assert abs(r2["confidence"] - 0.5) < 1e-9
    assert abs(r2["lift"] - 1.25) < 1e-9
    assert abs(r2["conviction"] - 1.2) < 1e-9


def test_novelty_extremes(spark, tmp_path):
    # eval doc 0 repeats train doc 1 verbatim -> novelty 0.
    # eval doc 5 is entirely fresh vocabulary -> novelty 1.
    docs = [
        (0, "a b c d e f", "en", "s1", 11),   # eval (0 % 5 == 0)
        (1, "a b c d e f", "en", "s1", 11),   # train twin
        (5, "q r s t u v", "en", "s2", 11),   # eval, fresh
        (2, "x y z w k m", "en", "s2", 11),   # train noise
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in _q("text_novelty_vs_train").spark(spark, str(tmp_path)).collect()}
    assert abs(out["s1"]["avg_novelty"] - 0.0) < 1e-9
    assert abs(out["s2"]["avg_novelty"] - 1.0) < 1e-9


def test_holdout_stability_invariants(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, t0, i, "view", 1.0, "") for i in range(500)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = _q("sample_holdout_stability").spark(spark, str(tmp_path)).collect()
    total = sum(r["n_users"] for r in out)
    assert total == 500
    stab = out[0]["overall_stability"]
    assert all(abs(r["overall_stability"] - stab) < 1e-12 for r in out)
    # expected stay fraction ~ 0.8^2 + 0.1^2 + 0.1^2 = 0.66
    assert 0.5 < stab < 0.8
    # fracs sum to ~1
    assert abs(sum(r["frac"] for r in out) - 1.0) < 1e-6
    # marginal of the s1 axis is ~80/10/10
    from collections import defaultdict

    m1 = defaultdict(int)
    for r in out:
        m1[r["split_s1"]] += r["n_users"]
    assert m1["train"] > m1["val"] and m1["train"] > m1["test"]
