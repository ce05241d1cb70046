"""Wave-10 operators: JSD bounds/disjointness, TWAP hold weighting,
Mann-Whitney doubled-rank arithmetic vs scipy-style hand computation."""

import datetime
import math


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_jsd_identical_zero_disjoint_one(spark, tmp_path):
    docs = [
        (1, "a b c", "en", "s1", 5),
        (2, "a b c", "en", "s2", 5),   # identical distribution to s1
        (3, "x y z", "en", "s3", 5),   # disjoint from both
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["src_a"], r["src_b"]): r["jsd"]
        for r in _q("text_js_divergence_sources").spark(spark, str(tmp_path)).collect()
    }
    assert abs(got[("s1", "s2")]) < 1e-9          # identical -> 0
    assert abs(got[("s1", "s3")] - 1.0) < 1e-9    # disjoint -> 1 (log2)
    assert abs(got[("s2", "s3")] - 1.0) < 1e-9


def test_twap_weights_by_hold_duration(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    s = datetime.timedelta(seconds=1)
    # value 10 held 3s, value 20 held 1s, final value has no hold
    rows = [
        (0, t0, 1, "view", 10.0, "{}"),
        (1, t0 + 3 * s, 1, "view", 20.0, "{}"),
        (2, t0 + 4 * s, 1, "view", 999.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    r = _q("w_time_weighted_average").spark(spark, str(tmp_path)).collect()[0]
    assert r["n_segments"] == 2
    assert r["total_ms"] == 4000
    # (10*3000 + 20*1000) / 4000 = 12.5; the plain mean would be 343
    assert abs(r["twap"] - 12.5) < 1e-6


def test_mann_whitney_matches_hand_rank_sum(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    a_vals = [1.0, 2.0, 3.0, 3.0]   # 'view'
    b_vals = [3.0, 4.0, 5.0]        # 'purchase'
    rows = []
    i = 0
    for v in a_vals:
        rows.append((i, t0, 1, "view", v, "{}")); i += 1
    for v in b_vals:
        rows.append((i, t0, 1, "purchase", v, "{}")); i += 1
    _write_events(spark, tmp_path, rows)
    r = _q("a_mann_whitney_u").spark(spark, str(tmp_path)).collect()[0]
    assert r["n1"] == 4 and r["n2"] == 3
    # combined sorted: 1,2,3,3,3,4,5 -> midrank of the 3s = (3+4+5)/3 = 4
    # R1 = 1 + 2 + 4 + 4 = 11 -> 2R1 = 22; 2U1 = 2R1 - n1(n1+1) = 22-20 = 2
    assert r["u1_x2"] == 2
    # z = (2U1 - n1 n2) / (2 sigma), sigma with tie correction t=3
    n = 7
    tie3 = 3**3 - 3
    sigma = math.sqrt(4 * 3 / 12.0 * ((n + 1) - tie3 / (n * (n - 1))))
    z = (2 - 12) / (2 * sigma)
    assert abs(r["z_score"] - round(math.floor(z * 1e6 + 0.5) / 1e6, 6)) < 1e-9
