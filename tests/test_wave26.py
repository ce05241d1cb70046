"""Wave-26 operators: ranking metrics on a planted perfect-retrieval
geometry, k-anonymity risk accounting on a hand-built release table, and
DoReMi mixture weights on skewed-vocabulary domains."""

from __future__ import annotations

import datetime


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_ranking_metrics_perfect_retrieval(spark, tmp_path):
    # two orthogonal blobs: label 0 lives on axis 0, label 1 on axis 1.
    # Cosine within a blob = 1, across = 0 -> every query's top-10 is
    # all-relevant: ndcg = rr = 1; recall@10 = 10/n_rel.
    rows = []
    for i in range(40):
        lab = i % 2
        v = [0.0] * 8
        v[lab] = 1.0 + (i % 5) * 0.001  # distinct norms, same direction
        rows.append((i, v, lab))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {r["query_id"]: r for r in _q("sim_ranking_metrics").spark(spark, str(tmp_path)).collect()}
    assert len(out) == 20
    for r in out.values():
        assert r["n_rel"] == 19
        assert r["n_rel_top"] == 10
        assert abs(r["ndcg10"] - 1.0) < 1e-9
        assert abs(r["rr10"] - 1.0) < 1e-9
        assert abs(r["recall10"] - 10.0 / 19.0) < 1e-6


def test_k_anonymity_risk_accounting(spark, tmp_path):
    # 1 customer alone in its QI group (k=1) + 3 sharing a group (k=3),
    # all orders in one year; sensitive = priority.
    cust = [
        (1, "a", 10, 1.0, "SEG_A"),  # alone -> group of its 1 order
        (2, "b", 20, 1.0, "SEG_B"),
        (3, "c", 20, 1.0, "SEG_B"),
        (4, "d", 20, 1.0, "SEG_B"),
    ]
    d = datetime.date(2024, 5, 1)
    orders = [
        (100, 1, "O", 1.0, d, "1-URGENT"),
        (101, 2, "O", 1.0, d, "1-URGENT"),
        (102, 3, "O", 1.0, d, "2-HIGH"),
        (103, 4, "O", 1.0, d, "3-MEDIUM"),
    ]
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
    out = {r["k_threshold"]: r for r in _q("p_k_anonymity_audit").spark(spark, str(tmp_path)).collect()}
    # groups: (10, SEG_A, 2024) k=1 l=1; (20, SEG_B, 2024) k=3 l=3
    assert out[2]["n_groups"] == 2
    assert out[2]["groups_failing"] == 1 and out[2]["rows_at_risk"] == 1
    assert out[5]["groups_failing"] == 2 and out[5]["rows_at_risk"] == 4
    assert abs(out[5]["frac_rows_at_risk"] - 1.0) < 1e-9
    assert out[10]["min_k"] == 1 and out[10]["min_l"] == 1
    assert out[10]["groups_l_below_3"] == 1


def test_doremi_upweights_divergent_domain(spark, tmp_path):
    # domain "same" mirrors the global distribution; domain "weird" has a
    # private vocabulary -> higher excess NLL -> larger mixture weight.
    rows = []
    i = 0
    for _ in range(30):
        rows.append((i, "alpha beta gamma delta", "en", "same", 22))
        i += 1
    for _ in range(30):
        rows.append((i, "zork quux blarg frobn", "en", "weird", 21))
        i += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in _q("sample_doremi_weights").spark(spark, str(tmp_path)).collect()}
    assert set(out) == {"same", "weird"}
    w = sum(r["mixture_weight"] for r in out.values())
    assert abs(w - 1.0) < 1e-3
    # both domains diverge symmetrically here; weights must be equal-ish
    assert abs(out["same"]["excess_nll"] - out["weird"]["excess_nll"]) < 1e-6
    # now make one domain match the global mix more closely: add shared docs
    for _ in range(60):
        rows.append((i, "alpha beta zork quux", "en", "same", 22))
        i += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out2 = {r["source"]: r for r in _q("sample_doremi_weights").spark(spark, str(tmp_path)).collect()}
    # "weird" keeps a private, globally-rare vocabulary -> bigger excess
    assert out2["weird"]["excess_nll"] > out2["same"]["excess_nll"]
    assert out2["weird"]["mixture_weight"] > out2["same"]["mixture_weight"]
