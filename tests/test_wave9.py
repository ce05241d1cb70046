"""Wave-9 operators: Hamilton allocation exactness, RLE run semantics."""

import datetime


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_budget_allocation_sums_exactly_and_orders_remainders(spark, tmp_path):
    # weights 1,1,1 over budget 10000: 3333 each + 1 leftover unit to the
    # smallest source name (remainders tie -> source ASC tiebreak)
    docs = [
        (1, "x", "en", "a_src", 10),
        (2, "x", "en", "b_src", 10),
        (3, "x", "en", "c_src", 10),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r["source"]: r["allocated"] for r in _q("sample_budget_allocation").spark(spark, str(tmp_path)).collect()}
    assert sum(got.values()) == 10000
    assert got == {"a_src": 3334, "b_src": 3333, "c_src": 3333}

    # skewed weights still sum exactly
    docs = [
        (1, "x", "en", "big", 997),
        (2, "x", "en", "mid", 2),
        (3, "x", "en", "tiny", 1),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r["source"]: r["allocated"] for r in _q("sample_budget_allocation").spark(spark, str(tmp_path)).collect()}
    assert sum(got.values()) == 10000
    assert got["big"] == 9970 and got["mid"] == 20 and got["tiny"] == 10


def test_rle_runs_and_flats(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    s = datetime.timedelta(seconds=1)
    # series: 1,2,3,3,2,1,5 -> moves: up,up,(flat skipped),down,down,up
    # runs: [up x2], [down x2], [up x1] -> 3 runs, longest 2, up_moves 3
    vals = [1.0, 2.0, 3.0, 3.0, 2.0, 1.0, 5.0]
    rows = [
        (i, t0 + i * s, 7, "view", v, "{}") for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = _q("w_run_length_encoding").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_runs"] == 3
    assert r["longest_run"] == 2
    assert r["up_moves"] == 3


def test_asof_forward_semantics(spark):
    from pyspark.sql import functions as F

    from cicevse2024_tfm_datapipeline_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40), (2, 5)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "b"), (2, 1, "c")], "k long, t long, v string"
    )
    out = {
        (r["k"], r["t"]): r["v"]
        for r in asof_join_forward(
            left, right, key="k", left_time="t", right_time="t",
            right_value_cols=["v"],
        ).collect()
    }
    # inclusive: t=10 matches the right row AT 10; t=25 -> next is 30;
    # t=40 has no later right -> null; k=2 t=5 has no right at/after 5
    assert out == {(1, 10): "a", (1, 25): "b", (1, 40): None, (2, 5): None}
