"""Wave-36 operators: IV Wald on a planted encouragement design, k-core
peeling on a planted pendant-vs-clique graph, and threshold-curve
monotonicity on planted dup groups."""

from __future__ import annotations

import datetime


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_iv_wald_planted_late(spark, tmp_path):
    # Encouragement z doubles take-up (0.2 -> 0.7); treatment adds
    # exactly +100 to the outcome; baseline differs by z to plant
    # confounding that ITT/first-stage still identifies:
    # here baseline is constant, so LATE must be exactly 100.
    d = datetime.date(2024, 1, 1)
    cust = [(0, "c0", 0, 0.0, "S"), (1, "c1", 1, 0.0, "S")]  # z=0, z=1
    orders = []
    ok = 0

    def add(ck, treated, n):
        nonlocal ok
        for _ in range(n):
            price = 500.0 + (100.0 if treated else 0.0)
            orders.append(
                (ok, ck, "O", price, d, "1-URGENT" if treated else "2-HIGH")
            )
            ok += 1

    add(0, True, 2)
    add(0, False, 8)   # z=0: 20% treated
    add(1, True, 7)
    add(1, False, 3)   # z=1: 70% treated
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
    out = _q("a_iv_wald_estimator").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert abs(r["first_stage"] - 0.5) < 1e-9
    assert abs(r["itt_effect"] - 50.0) < 1e-9
    assert abs(r["wald_late"] - 100.0) < 1e-9


def test_kcore_drops_pendants_keeps_clique(spark, tmp_path):
    # docs 0,1,2 identical -> LSH clique of 3 (each degree 2 = survives
    # k=2); docs 10,11 identical pair -> pendant edge, peeled in round 1.
    docs = []
    for i in (0, 1, 2):
        docs.append((i, "alpha beta gamma delta epsilon", "en", "s", 30))
    for i in (10, 11):
        docs.append((i, "zeta eta theta iota kappa", "en", "s", 25))
    for i in range(20, 40):  # singletons
        docs.append((i, f"unique{i} token{i} word{i} item{i}", "en", "s", 20))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["round"]: r for r in _q("g_kcore_two_rounds").spark(spark, str(tmp_path)).collect()}
    assert out[1]["n_nodes"] == 3 and out[1]["n_edges"] == 3
    # converged: round 2 identical
    assert out[2]["n_nodes"] == 3 and out[2]["n_edges"] == 3


def test_threshold_curve_monotone(spark, tmp_path):
    # 3 identical docs (jaccard 1 pairs) + 2 docs sharing 2 of 3 tokens
    # (jaccard 0.5) -> tau=0.5 fires 4 pairs, tau>=0.6 fires only the
    # 3 identical pairs.
    docs = [
        (0, "a b c", "en", "s", 5),
        (1, "a b c", "en", "s", 5),
        (2, "a b c", "en", "s", 5),
        (3, "x y z", "en", "s", 5),
        (4, "x y w", "en", "s", 5),  # jaccard(3,4) = 2/4 = 0.5
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {round(r["tau"], 1): r for r in _q("text_dedup_threshold_curve").spark(spark, str(tmp_path)).collect()}
    assert out[0.5]["n_pairs"] == 4
    assert out[0.6]["n_pairs"] == 3
    assert out[0.9]["n_pairs"] == 3
    # survivor rule drops ids 1,2 (dups of 0) and 4 at tau 0.5
    assert out[0.5]["n_docs_dropped"] == 3
    assert out[0.6]["n_docs_dropped"] == 2
    prev = None
    for tau in (0.5, 0.6, 0.7, 0.8, 0.9):
        if prev is not None:
            assert out[tau]["n_pairs"] <= prev
        prev = out[tau]["n_pairs"]
