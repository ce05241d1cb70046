"""Wave-8 operators: skyline dominance, sliding distinct windows,
EXCEPT ALL clamping."""

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


def test_skyline_keeps_only_undominated(spark, tmp_path):
    d = lambda day: datetime.datetime(2024, 1, day)
    orders = [
        # (key, price, date): frontier = strictly cheaper than everything earlier
        (1, 100.0, d(1)),   # first -> frontier
        (2, 150.0, d(2)),   # later and pricier -> dominated
        (3, 80.0, d(3)),    # cheaper than all before -> frontier
        (4, 80.0, d(4)),    # ties the running min, not strictly cheaper -> out
        (5, 20.0, d(5)),    # frontier
    ]
    spark.createDataFrame(
        [(k, 1, "O", p, dt, "LOW") for k, p, dt in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = sorted(r["o_orderkey"] for r in _q("a_skyline_2d").spark(spark, str(tmp_path)).collect())
    assert got == [1, 3, 5]


def test_sliding_distinct_window_membership(spark, tmp_path):
    day = datetime.timedelta(days=1)
    t0 = datetime.datetime(2024, 1, 10)
    rows = [
        (0, t0, 1, "view", 1.0, "{}"),            # user 1 on day D
        (1, t0 + 8 * day, 1, "view", 1.0, "{}"),  # user 1 again on D+8
        (2, t0 + 2 * day, 2, "view", 1.0, "{}"),  # user 2 on D+2
    ]
    _write_events(spark, tmp_path, rows)
    got = {r["win_end"]: r["wau"] for r in _q("a_sliding_distinct_users").spark(spark, str(tmp_path)).collect()}
    d0 = min(got)
    # observed days: D..D+8. Window ending D: {u1}=1. D+2: {u1,u2}=2.
    # D+6: u1(day D) still in [D, D+6] and u2 -> 2. D+7: u1's day-D visit
    # ages out, u2(day D+2) still in -> 1. D+8: u1 returns, u2 in window -> 2
    assert got[d0] == 1
    assert got[d0 + 2] == 2
    assert got[d0 + 6] == 2
    assert got[d0 + 7] == 1
    assert got[d0 + 8] == 2
    assert max(got) == d0 + 8  # clamped to observed days


def test_except_all_clamps_at_zero(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    # cohort 1: three rows >= 50, one of them >= 200 -> surviving 2
    # cohort 2: one row >= 50 which is also >= 200 -> surviving 0 (dropped)
    rows = [
        (0, t0, 1, "view", 60.0, "{}"),
        (1, t0, 11, "view", 70.0, "{}"),
        (2, t0, 21, "view", 250.0, "{}"),
        (3, t0, 2, "view", 300.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        (r["event_type"], r["cohort"]): r["surviving"]
        for r in _q("u_except_all_counts").spark(spark, str(tmp_path)).collect()
    }
    assert got == {("view", 1): 2}


def test_weighted_median_vs_hand_computed(spark, tmp_path):
    import datetime

    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipdate timestamp"
    )
    ship = datetime.datetime(2024, 1, 2)
    # prices 1.00 (w=7), 5.00 (w=2), 9.00 (w=1): total 10, half 5 ->
    # cum at 1.00 is 7 >= 5 -> weighted median 1.00 (plain median is 5.00)
    rows = [
        (1, 1, 1, 1, 7.0, 1.00, 0.0, 0.0, "N", "O", ship),
        (2, 1, 1, 1, 2.0, 5.00, 0.0, 0.0, "N", "O", ship),
        (3, 1, 1, 1, 1.0, 9.00, 0.0, 0.0, "N", "O", ship),
    ]
    spark.createDataFrame(rows, li_schema).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    r = load_all()["a_weighted_median"].spark(spark, str(tmp_path)).collect()[0]
    assert r["total_weight"] == 10
    assert abs(r["weighted_median_price"] - 1.00) < 1e-9
