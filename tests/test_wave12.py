"""Wave-12 operators: sufficient-statistics merge identity under any
partitioning; quality-gate verdicts on injected violations."""

import datetime


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_incremental_merge_matches_recompute_everywhere(spark, tmp_path):
    import random

    rng = random.Random(7)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            t0 + datetime.timedelta(days=rng.randint(0, 29)),
            rng.randint(1, 9),
            rng.choice(["view", "click", "purchase"]),
            round(rng.uniform(0, 500), 2),
            "{}",
        )
        for i in range(500)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = _q("a_incremental_rollup_merge").spark(spark, str(tmp_path)).collect()
    assert out
    for r in out:
        assert r["matches_recompute"] is True
        assert r["min_ticks"] <= r["max_ticks"]
        assert r["std_pop"] >= 0.0


def test_quality_gate_flags_injected_violations(spark, tmp_path):
    ship = datetime.datetime(2024, 1, 2)
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipdate timestamp"
    )
    # orderkey 9 is an orphan; (1,1) duplicated; one negative price
    spark.createDataFrame(
        [
            (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ship),
            (1, 2, 1, 1, 1.0, -5.0, 0.0, 0.0, "N", "O", ship),
            (1, 3, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ship),
            (9, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ship),
        ],
        li_schema,
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, 1, "O", 10.0, ship, None)],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["check_name"]: (r["metric"], r["pass"])
        for r in _q("pipeline_quality_report").spark(spark, str(tmp_path)).collect()
    }
    assert got["orphan_lineitems"] == (1, False)
    assert got["null_priority_orders"] == (1, False)
    assert got["negative_prices"] == (1, False)
    assert got["dup_order_lines"] == (1, False)  # (orderkey 1, line 1) twice
