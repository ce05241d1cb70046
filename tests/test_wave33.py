"""Wave-33 operators: decomposition on a planted weekly pattern, ATT
where stratification removes a planted confounder, and cross-correlation
recovering a planted lead-lag shift."""

from __future__ import annotations

import datetime


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_decomposition_flat_plus_weekly(spark, tmp_path):
    # 28 days: value = 100 + 7 on Sundays (dow 0). Trend MA(7) is flat
    # at 101; seasonal index must be ~ +6 on dow 0 and ~ -1 elsewhere.
    t0 = datetime.datetime(2024, 1, 7, 12, 0)  # a Sunday
    rows = []
    for d in range(28):
        day = t0 + datetime.timedelta(days=d)
        v = 107.0 if d % 7 == 0 else 100.0
        rows.append((d, day, 1, "click", v, ""))
    _write_events(spark, tmp_path, rows)
    out = {
        r["dow"]: r
        for r in _q("a_classical_decomposition").spark(spark, str(tmp_path)).collect()
    }
    assert len(out) == 7
    assert abs(out[0]["seasonal_index"] - 6.0) < 1e-6
    for dow in range(1, 7):
        assert abs(out[dow]["seasonal_index"] + 1.0) < 1e-6
    assert abs(out[0]["seasonal_range"] - 7.0) < 1e-6


def test_att_removes_planted_confounder(spark, tmp_path):
    # Two strata (segments). Stratum A: base price 100, stratum B: 200.
    # Treatment adds exactly +10 in both strata, but treatment is far
    # more common in the expensive stratum -> naive diff is inflated;
    # subclassified ATT must be exactly 10.
    d = datetime.date(2024, 1, 1)
    cust = [(0, "c0", 1, 0.0, "SEG_A"), (1, "c1", 1, 0.0, "SEG_B")]
    orders = []
    ok = 0

    def add(ck, treated, price, n):
        nonlocal ok
        for _ in range(n):
            orders.append(
                (ok, ck, "O", price, d, "1-URGENT" if treated else "2-HIGH")
            )
            ok += 1

    add(0, True, 110.0, 2)   # SEG_A treated
    add(0, False, 100.0, 18)  # SEG_A control
    add(1, True, 210.0, 18)  # SEG_B treated
    add(1, False, 200.0, 2)   # SEG_B control
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
    out = _q("a_att_subclassification").spark(spark, str(tmp_path)).collect()
    assert len(out) == 2  # both strata have common support
    r = out[0]
    assert abs(r["att"] - 10.0) < 1e-3
    # naive: treated mean = (2*110+18*210)/20 = 200; control =
    # (18*100+2*200)/20 = 110 -> diff 90, wildly confounded.
    assert abs(r["naive_diff"] - 90.0) < 1e-6
    for row in out:
        assert abs(row["stratum_diff"] - 10.0) < 1e-6


def test_cross_correlation_recovers_shift(spark, tmp_path):
    # view series = sine-ish ramp; purchase series = the SAME daily
    # values shifted 2 days later -> cross_corr peaks at lag -2
    # (purchase day + (-2) aligns with view).
    t0 = datetime.datetime(2024, 3, 1, 12, 0)
    vals = [10.0, 20.0, 35.0, 50.0, 40.0, 25.0, 15.0, 30.0, 45.0, 60.0,
            55.0, 35.0, 20.0, 12.0]
    rows = []
    eid = 0
    for d, v in enumerate(vals):
        rows.append((eid, t0 + datetime.timedelta(days=d), 1, "view", v, ""))
        eid += 1
    for d, v in enumerate(vals):
        rows.append(
            (eid, t0 + datetime.timedelta(days=d + 2), 1, "purchase", v, "")
        )
        eid += 1
    _write_events(spark, tmp_path, rows)
    out = {
        r["lag"]: r
        for r in _q("a_cross_correlation_lags").spark(spark, str(tmp_path)).collect()
    }
    assert abs(out[-2]["cross_corr"] - 1.0) < 1e-6
    best = max(out.values(), key=lambda r: r["cross_corr"])
    assert best["lag"] == -2
