"""Wave-7 operators: diff classification, growth-accounting identity,
epoch day-of-week math, negative-sampling determinism."""

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


def test_table_diff_partitions_rows(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, t0, 1, "view", float(i), "{}") for i in range(500)]
    _write_events(spark, tmp_path, rows)
    got = {r["status"]: r["n_rows"] for r in _q("u_table_diff").spark(spark, str(tmp_path)).collect()}
    # B derives from A: no additions; statuses must partition all 500 rows
    assert "added" not in got
    assert sum(got.values()) == 500
    assert got.get("removed", 0) > 0 and got.get("changed", 0) > 0


def test_growth_accounting_classification(spark, tmp_path):
    week = datetime.timedelta(days=7)
    t0 = datetime.datetime(2024, 1, 8)  # some epoch week W
    rows = [
        # user 1: active W, W+1, W+3 -> new@W, retained@W+1, resurrected@W+3,
        #   churn charged to W+2 (gap) ... and nothing after W+3 (max week)
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + week, 1, "view", 1.0, "{}"),
        (2, t0 + 3 * week, 1, "view", 1.0, "{}"),
        # user 2: active W only -> new@W, churned into W+1
        (3, t0, 2, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {r["week"]: r for r in _q("a_growth_accounting").spark(spark, str(tmp_path)).collect()}
    weeks = sorted(out)
    w0, w1, w3 = weeks[0], weeks[0] + 1, weeks[0] + 3
    assert out[w0]["n_new"] == 2
    assert out[w1]["n_new"] == 0 and out[w1]["n_retained"] == 1
    assert out[w1]["n_churned"] == 1  # user 2
    assert out[w3]["n_resurrected"] == 1
    # user 1's trailing absence after the global max week is NOT churn
    assert w3 + 1 not in out


def test_seasonality_epoch_dow(spark, tmp_path):
    # 2024-01-01 is a Monday -> dow 1 under (days+4) % 7 with Sunday=0?
    # 1970-01-01 Thursday -> dow index 4+0 ... convention: Thursday=4,
    # so Monday = (Thursday + 4 days) -> (19723 + 4) % 7; just assert
    # against Python's weekday: Monday.weekday()=0 -> expect (0+1)%7=1
    t0 = datetime.datetime(2024, 1, 1, 13, 30)  # Monday 13:30 UTC
    rows = [(i, t0, 1, "view", 1.0, "{}") for i in range(4)]
    _write_events(spark, tmp_path, rows)
    out = _q("a_seasonality_heatmap").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # (epoch_days + 4) % 7: Sunday=0, Monday=1, ... Saturday=6
    assert r["dow"] == 1 and r["hour"] == 13 and r["n"] == 4
    assert abs(r["load_factor"] - 168.0) < 1e-6  # all mass in one cell


def test_negative_pairs_deterministic_and_disjoint(spark, tmp_path):
    docs = [(i, f"doc {i}") for i in range(300)]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    a = sorted(
        (r["anchor_id"], r["neg_id"], r["rk"])
        for r in _q("sample_negative_pairs").spark(spark, str(tmp_path)).collect()
    )
    b = sorted(
        (r["anchor_id"], r["neg_id"], r["rk"])
        for r in _q("sample_negative_pairs").spark(spark, str(tmp_path)).collect()
    )
    assert a == b  # rerun-stable
    per_anchor = {}
    for anchor, neg, rk in a:
        per_anchor.setdefault(anchor, []).append((rk, neg))
        assert neg != anchor
    for anchor, pairs in per_anchor.items():
        assert [rk for rk, _ in sorted(pairs)] == list(range(1, len(pairs) + 1))
        assert len(pairs) <= 3
