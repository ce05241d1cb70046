"""Wave-35 operators: log-rank null/extreme cases, sequential patterns
on planted orderings, and stickiness identities."""

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


def test_logrank_identical_arms_z_zero(spark, tmp_path):
    # arms are mirror images (user 2k and 2k+1 share the same history)
    # -> at every event time d1 = dt*n1/nt exactly -> O-E = 0, z = 0.
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for k in range(6):
        for uid in (2 * k, 2 * k + 1):
            rows.append((eid, t0, uid, "view", 1.0, ""))
            eid += 1
            rows.append(
                (eid, t0 + datetime.timedelta(minutes=k + 1), uid, "purchase", 1.0, "")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = _q("a_logrank_test").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_arm0"] == 6 and r["n_arm1"] == 6
    assert abs(r["observed_minus_expected"]) < 1e-9
    assert abs(r["z"]) < 1e-9
    assert r["variance"] > 0


def test_logrank_detects_faster_arm(spark, tmp_path):
    # arm 1 (odd users) purchases quickly; arm 0 never purchases
    # (censored late) -> strongly positive O-E for arm 1.
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for k in range(8):
        uid = 2 * k + 1  # arm 1
        rows.append((eid, t0, uid, "view", 1.0, ""))
        eid += 1
        rows.append((eid, t0 + datetime.timedelta(minutes=1 + k), uid, "purchase", 1.0, ""))
        eid += 1
    for k in range(8):
        uid = 2 * k  # arm 0, censored at +100 min
        rows.append((eid, t0, uid, "view", 1.0, ""))
        eid += 1
        rows.append((eid, t0 + datetime.timedelta(minutes=100), uid, "view", 1.0, ""))
        eid += 1
    _write_events(spark, tmp_path, rows)
    r = _q("a_logrank_test").spark(spark, str(tmp_path)).collect()[0]
    assert r["observed_minus_expected"] > 2.0
    assert r["chi2"] > 3.84  # significant at 5%


def test_sequential_patterns_planted_order(spark, tmp_path):
    # 5 users all do signup -> purchase; 2 users only purchase.
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(5):
        rows.append((eid, t0, uid, "signup", 1.0, ""))
        eid += 1
        rows.append((eid, t0 + datetime.timedelta(minutes=5), uid, "purchase", 1.0, ""))
        eid += 1
    for uid in (10, 11):
        rows.append((eid, t0, uid, "purchase", 1.0, ""))
        eid += 1
    _write_events(spark, tmp_path, rows)
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in _q("a_sequential_patterns").spark(spark, str(tmp_path)).collect()
    }
    sp = out[("signup", "purchase")]
    assert sp["n_both"] == 5
    assert sp["n_ordered"] == 5
    assert abs(sp["support"] - 5.0 / 7.0) < 1e-6
    assert abs(sp["confidence"] - 1.0) < 1e-9
    ps = out[("purchase", "signup")]
    assert ps["n_ordered"] == 0 and ps["confidence"] == 0.0


def test_stickiness_identities(spark, tmp_path):
    # month 1: user 1 active on both days, user 2 on day 1 only.
    # DAU = [2, 1] -> avg 1.5; MAU = 2 -> stickiness 0.75.
    t0 = datetime.datetime(2024, 5, 1, 10, 0)
    rows = [
        (0, t0, 1, "view", 1.0, ""),
        (1, t0, 2, "view", 1.0, ""),
        (2, t0 + datetime.timedelta(days=1), 1, "view", 1.0, ""),
    ]
    _write_events(spark, tmp_path, rows)
    out = _q("a_dau_mau_stickiness").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["active_days"] == 2 and r["mau"] == 2
    assert abs(r["avg_dau"] - 1.5) < 1e-9
    assert abs(r["stickiness"] - 0.75) < 1e-9
