"""Wave-30 operators: WOE/IV on a hand-computed two-bin split, the
blocking audit on planted dup/non-dup pairs, and the ridge solve against
a NumPy Cramer twin on exact synthetic data."""

from __future__ import annotations

import datetime
import math


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_woe_iv_two_bins(spark, tmp_path):
    # bin 0 (balance $0-999): 8 pos, 2 neg; bin 1 ($1000+): 2 pos, 8 neg.
    d = datetime.date(2024, 1, 1)
    cust, orders = [], []
    ok = 0
    for ck, (bal, n_pos, n_neg) in enumerate([(500.0, 8, 2), (1500.0, 2, 8)]):
        cust.append((ck, f"Customer#{ck}", 1, bal, "SEG"))
        for _ in range(n_pos):
            orders.append((ok, ck, "F", 1.0, d, "P"))
            ok += 1
        for _ in range(n_neg):
            orders.append((ok, ck, "O", 1.0, d, "P"))
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
    out = {r["bin"]: r for r in _q("f_binned_woe_iv").spark(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_pos"] == 8 and out[0]["n_neg"] == 2
    # WOE_0 = ln((8.5 * 10) / (2.5 * 10)) = ln(3.4)
    assert abs(out[0]["woe"] - math.log(3.4)) < 1e-5
    assert abs(out[1]["woe"] - math.log(2.5 / 8.5)) < 1e-5
    # iv contribution for bin 0: (0.8 - 0.2) * woe_0
    assert abs(out[0]["iv_contribution"] - 0.6 * math.log(3.4)) < 1e-5
    assert abs(out[0]["total_iv"] - out[1]["total_iv"]) < 1e-12
    assert out[0]["total_iv"] > 0


def test_blocking_audit_planted(spark, tmp_path):
    # 4 docs: 0 and 1 are exact dups in the same block; 2 is a dup of
    # nothing but shares 0's block; 3 is a dup of 0/1 placed in ANOTHER
    # block (different lang) -> truth pairs (0,1),(0,3),(1,3); candidates
    # within blocks: (0,1),(0,2),(1,2). completeness = 1/3.
    docs = [
        (0, "alpha beta gamma", "en", "web", 100),
        (1, "alpha beta gamma", "en", "web", 100),
        (2, "delta epsilon zeta", "en", "web", 110),
        (3, "alpha beta gamma", "fr", "web", 100),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = _q("dedup_blocking_quality_audit").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 4
    assert r["n_all_pairs"] == 6
    assert r["n_cand"] == 3
    assert r["n_truth"] == 3
    assert r["n_cand_truth"] == 1
    assert abs(r["reduction_ratio"] - 0.5) < 1e-9
    assert abs(r["pair_completeness"] - 1.0 / 3.0) < 1e-6
    assert abs(r["pairs_quality"] - 1.0 / 3.0) < 1e-6


def test_ridge_matches_numpy_cramer(spark, tmp_path):
    # exact synthetic: y_cents = 300 + 7 q + 11 d (+ tiny alternating
    # noise) over a grid; verify the engine's betas against the same
    # Cramer arithmetic done in pure python on the same integer moments.
    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    k = 0
    data = []
    for q in range(1, 11):
        for d in range(0, 11):
            noise = 50 if (q + d) % 2 == 0 else -50
            y = 100000 + 700 * q + 1100 * d + noise  # cents
            data.append((q, d, y))
            rows.append(
                (k, k, k, 1, float(q), y / 100.0, d / 100.0, 0.0, "N", "O", d0)
            )
            k += 1
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = _q("ml_ridge_closed_form").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rows"] == len(data)

    lam = 1000.0
    s = {"s00": len(data), "s01": 0, "s02": 0, "s11": 0, "s12": 0, "s22": 0,
         "b0": 0, "b1": 0, "b2": 0}
    for q, d, y in data:
        s["s01"] += q; s["s02"] += d; s["s11"] += q * q
        s["s12"] += q * d; s["s22"] += d * d
        s["b0"] += y; s["b1"] += q * y; s["b2"] += d * y

    def det3(m):
        return (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
                - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
                + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))

    A = [[s["s00"] + lam, s["s01"], s["s02"]],
         [s["s01"], s["s11"] + lam, s["s12"]],
         [s["s02"], s["s12"], s["s22"] + lam]]
    b = [s["b0"], s["b1"], s["b2"]]
    det = det3(A)

    def repl(col):
        m = [row[:] for row in A]
        for i in range(3):
            m[i][col] = b[i]
        return m

    beta = [det3(repl(c)) / det for c in range(3)]
    assert abs(r["intercept"] - beta[0] / 100.0) < 1e-4
    assert abs(r["coef_quantity"] - beta[1] / 100.0) < 1e-4
    assert abs(r["coef_discount_pct"] - beta[2] / 100.0) < 1e-4
    # r2 via the SAME tick formula (floor(resid^2/1e4 + 0.5) sums)
    ybar = s["b0"] / s["s00"]
    sse = sum(
        math.floor((y - (beta[0] + beta[1] * q + beta[2] * d)) ** 2 / 10000.0 + 0.5)
        for q, d, y in data
    )
    sst = sum(math.floor((y - ybar) ** 2 / 10000.0 + 0.5) for q, d, y in data)
    assert abs(r["r2"] - (1.0 - sse / sst)) < 1e-4
