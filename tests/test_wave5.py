"""Wave-5 operators: rolling-median order statistics, burst debounce
chaining, quantile-normalization mapping, Gini skew, last-touch windows."""

import datetime


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_rolling_median_lower_middle(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    vals = [5.0, 1.0, 9.0, 3.0]
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), 1, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        r["event_id"]: r["roll_median"]
        for r in _q("w_rolling_median").spark(spark, str(tmp_path)).collect()
    }
    # windows: [5] -> 5; [5,1] -> lower middle of {1,5} = 1;
    # [5,1,9] -> 5; [5,1,9,3] -> lower middle of {1,3,5,9} = 3
    assert got == {0: 5.0, 1: 1.0, 2: 5.0, 3: 3.0}


def test_debounce_burst_chaining(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    # clicks at +0s, +50s, +100s: each within 60s of its PREDECESSOR, so
    # the whole chain is ONE burst even though +100s is >60s from the
    # opener (session semantics); +200s opens a second burst
    offs = [0, 50, 100, 200]
    rows = [
        (i, t0 + datetime.timedelta(seconds=s), 1, "click", 1.0, "{}")
        for i, s in enumerate(offs)
    ]
    _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in _q("w_debounce_bursts").spark(spark, str(tmp_path)).collect()}
    assert out["click"]["n_events"] == 4
    assert out["click"]["n_bursts"] == 2


def test_quantile_normalize_identity_and_mapping(spark, tmp_path):
    # source A has 2 docs, source B has 4; pooled distribution is all 6.
    docs = [
        (1, "t", "en", "A", 10),
        (2, "t", "en", "A", 40),
        (3, "t", "en", "B", 15),
        (4, "t", "en", "B", 20),
        (5, "t", "en", "B", 30),
        (6, "t", "en", "B", 50),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r["norm_chars"]
        for r in _q("f_quantile_normalize").spark(spark, str(tmp_path)).collect()
    }
    # pooled ascending: 10,15,20,30,40,50 (ranks 1..6)
    # A (n_s=2): r=1 -> g=floor((1*6-1)/2)+1=3 -> 20 ; r=2 -> g=6 -> 50
    # B (n_s=4): r=1 -> g=2 ->15 ; r=2 -> g=3 ->20 ; r=3 -> g=5 ->40 ; r=4 -> g=6 ->50
    assert got == {1: 20, 2: 50, 3: 15, 4: 20, 5: 40, 6: 50}


def test_gini_uniform_vs_skewed(spark, tmp_path):
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipdate timestamp"
    )
    ship = datetime.datetime(2024, 1, 2)

    def li_rows(key_counts):
        rows = []
        i = 0
        for key, cnt in key_counts.items():
            for _ in range(cnt):
                rows.append((i, key, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship))
                i += 1
        return rows

    # uniform: 4 keys x 5 rows -> Gini 0
    spark.createDataFrame(li_rows({1: 5, 2: 5, 3: 5, 4: 5}), li_schema).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    r = _q("a_key_skew_gini").spark(spark, str(tmp_path)).collect()[0]
    assert r["n_keys"] == 4 and r["n_rows"] == 20 and r["max_cnt"] == 5
    assert abs(r["gini"]) < 1e-9

    # skewed: one key holds 97 of 100 rows -> Gini near (n-1)/n - small
    spark.createDataFrame(li_rows({1: 1, 2: 1, 3: 1, 4: 97}), li_schema).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    r2 = _q("a_key_skew_gini").spark(spark, str(tmp_path)).collect()[0]
    assert r2["max_cnt"] == 97
    # exact: ranks asc (1,1,1,97) -> wsum=1+2+3+4*97=394
    # gini = 2*394/(4*100) - 5/4 = 1.97 - 1.25 = 0.72
    assert abs(r2["gini"] - 0.72) < 1e-9
    assert abs(r2["top1pct_share"] - 0.97) < 1e-9


def test_lasttouch_window_and_tiebreak(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 10)
    day = datetime.timedelta(days=1)
    rows = [
        # user 1: click 2 days before purchase -> attributed, latency 48h
        (1, t0 - 2 * day, 1, "click", 1.0, "{}"),
        (2, t0, 1, "purchase", 1.0, "{}"),
        # user 2: click 8 days before purchase -> NOT attributed
        (3, t0 - 8 * day, 2, "click", 1.0, "{}"),
        (4, t0, 2, "purchase", 1.0, "{}"),
        # user 3: two clicks at the SAME instant -> dedup to max event_id,
        # then attributed with latency 0h... and a later unrelated click
        (5, t0, 3, "click", 1.0, "{}"),
        (6, t0, 3, "click", 1.0, "{}"),
        (7, t0, 3, "purchase", 1.0, "{}"),
        # user 4: purchase with no click at all
        (8, t0, 4, "purchase", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    r = _q("j_lasttouch_attribution").spark(spark, str(tmp_path)).collect()[0]
    assert r["n_purchases"] == 4
    assert r["n_attributed"] == 2  # users 1 and 3
    # total latency = 48h + 0h
    assert r["sum_latency_us"] == 48 * 3600 * 1_000_000
    assert abs(r["avg_latency_hours"] - 24.0) < 1e-6
