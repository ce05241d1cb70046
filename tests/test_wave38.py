"""Wave-38 operators: VIF extremes on planted correlated features,
Theil–Sen robustness to an outlier day, ANOVA exact decomposition on a
balanced two-factor design."""

from __future__ import annotations

import datetime


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_vif_independent_features_unit(spark, tmp_path):
    # orthogonal-ish planted design: x1 cycles 1..4, x2 cycles 0..2,
    # x3 cycles 0..4 with coprime periods -> correlations ~ 0 -> VIF ~ 1.
    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    for k in range(360):
        q = (k % 4) + 1
        disc = (k % 3) / 100.0
        tax = (k % 5) / 100.0
        rows.append((k, k, k, 1, float(q), 1.0, disc, tax, "N", "O", d0))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r["feature"]: r for r in _q("a_vif_multicollinearity").spark(spark, str(tmp_path)).collect()}
    assert set(out) == {"quantity", "discount", "tax"}
    for r in out.values():
        assert abs(r["vif"] - 1.0) < 1e-6
        assert abs(r["det_corr"] - 1.0) < 1e-6


def test_vif_blows_up_on_collinear(spark, tmp_path):
    # x2 = x1 (perfectly collinear up to tick scale): det -> 0, VIF huge.
    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    for k in range(100):
        q = (k % 7) + 1
        disc = q / 100.0  # discount ticks == quantity
        tax = (k % 3) / 100.0
        rows.append((k, k, k, 1, float(q), 1.0, disc, tax, "N", "O", d0))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r["feature"]: r for r in _q("a_vif_multicollinearity").spark(spark, str(tmp_path)).collect()}
    assert abs(out["quantity"]["det_corr"]) < 1e-6
    assert abs(out["quantity"]["vif"]) > 1e5


def test_theil_sen_ignores_outlier_day(spark, tmp_path):
    # strictly +1.00/day trend with ONE wild outlier day: the median
    # pairwise slope stays 1.00 (OLS would not).
    t0 = datetime.datetime(2024, 3, 1, 12, 0)
    rows = []
    for d in range(15):
        v = 10.0 + d if d != 7 else 500.0
        rows.append((d, t0 + datetime.timedelta(days=d), 1, "click", v, ""))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = _q("a_theil_sen_slope").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pairs"] == 15 * 14 // 2
    assert abs(r["sen_slope_per_day"] - 1.0) < 1e-6
    assert r["direction"] == "increasing"


def test_anova_balanced_decomposition(spark, tmp_path):
    # balanced 2x2, 2 reps/cell, additive effects, zero noise:
    # y = 100 + 10*A + 4*B (dollars). SS_interaction = 0, SS_error = 0,
    # SS_A = n * varA contribution: A effect +-5 -> SS_A = 8*(5^2) = 200,
    # SS_B = 8*(2^2) = 32 (dollars^2).
    d = datetime.date(2024, 1, 1)
    cust = [(0, "c0", 1, 0.0, "SEG_A"), (1, "c1", 1, 0.0, "SEG_B")]
    orders = []
    ok = 0
    for ck, a_eff in ((0, 0.0), (1, 10.0)):
        for prio, b_eff in (("P1", 0.0), ("P2", 4.0)):
            for _ in range(2):
                orders.append((ok, ck, "O", 100.0 + a_eff + b_eff, d, prio))
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
    out = {r["effect"]: r for r in _q("a_two_way_anova").spark(spark, str(tmp_path)).collect()}
    assert out["factor_a"]["df"] == 1 and out["factor_b"]["df"] == 1
    assert abs(out["factor_a"]["sum_sq"] - 200.0) < 1e-6
    assert abs(out["factor_b"]["sum_sq"] - 32.0) < 1e-6
    assert abs(out["interaction"]["sum_sq"]) < 1e-6
    assert abs(out["error"]["sum_sq"]) < 1e-6
    assert abs(
        out["total"]["sum_sq"]
        - (out["factor_a"]["sum_sq"] + out["factor_b"]["sum_sq"])
    ) < 1e-4
