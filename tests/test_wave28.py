"""Wave-28 operators: BH step-up on a planted p-value ladder, IPS/SNIPS
identities on a hand-built log, and SPRT decisions on deterministic
pure-success / pure-failure streams."""

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


def test_sprt_decisions(spark, tmp_path):
    # user 1: pure purchases -> crosses the upper boundary at event 5
    #   (5 * 693147 = 3465735 >= 2944439; 4 * 693147 = 2772588 not yet).
    # user 2: no purchases -> crosses the lower boundary at event 11
    #   (11 * -287682 = -3164502 <= -2944439; 10 gives -2876820).
    # user 3: 2 events, alternating -> undecided.
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(6):
        rows.append((eid, t0 + datetime.timedelta(minutes=i), 1, "purchase", 1.0, ""))
        eid += 1
    for i in range(12):
        rows.append((eid, t0 + datetime.timedelta(minutes=i), 2, "view", 1.0, ""))
        eid += 1
    rows.append((eid, t0, 3, "purchase", 1.0, ""))
    rows.append((eid + 1, t0 + datetime.timedelta(minutes=1), 3, "view", 1.0, ""))
    _write_events(spark, tmp_path, rows)
    out = {
        r["user_id"]: r
        for r in _q("a_sprt_boundary_crossing").spark(spark, str(tmp_path)).collect()
    }
    assert out[1]["decision"] == "accept_h1"
    assert out[1]["n_to_decision"] == 5
    assert out[1]["llr_ticks_at_decision"] == 5 * 693147
    assert out[2]["decision"] == "accept_h0"
    assert out[2]["n_to_decision"] == 11
    assert out[3]["decision"] == "undecided"
    assert out[3]["n_to_decision"] == 0


def test_ips_snips_identities(spark, tmp_path):
    # Single bucket (user_id 5 -> bucket 0). Two actions: 'a' logged 3x
    # with reward 2.00, 'b' logged 1x with reward 10.00. Target policy
    # picks 'b' (mean 10 > 2). w(b) = N/cnt_b = 4.
    # IPS = (4 * 10) / 4 = 10; SNIPS = 40/4 = 10; ESS = 4^2... with one
    # matched row: sw = 4e6, sw2 = 16e12*1 -> ess = 1.
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (0, t0, 5, "a", 2.0, ""),
        (1, t0, 5, "a", 2.0, ""),
        (2, t0, 5, "a", 2.0, ""),
        (3, t0, 5, "b", 10.0, ""),
    ]
    _write_events(spark, tmp_path, rows)
    out = _q("a_ips_snips_offpolicy").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bucket"] == 0
    assert r["target_action"] == "b"
    assert abs(r["inv_propensity"] - 4.0) < 1e-9
    assert r["n_matched"] == 1
    assert abs(r["ips_value"] - 10.0) < 1e-6
    assert abs(r["snips_value"] - 10.0) < 1e-6
    assert abs(r["effective_sample_size"] - 1.0) < 1e-6
    assert abs(r["behavior_mean_reward"] - 4.0) < 1e-9  # (2+2+2+10)/4


def test_bh_rejects_extreme_segment_only(spark, tmp_path):
    # Three (seg, nation) groups: one wildly above the global 'F' rate,
    # two at it. BH at q=0.10 must reject exactly the extreme one.
    d = datetime.date(2024, 1, 1)
    cust, orders = [], []
    ck, ok = 0, 0

    def add_group(seg, nat, n_f, n_o):
        nonlocal ck, ok
        cust.append((ck, f"Customer#{ck}", nat, 0.0, seg))
        for _ in range(n_f):
            orders.append((ok, ck, "F", 1.0, d, "P"))
            ok += 1
        for _ in range(n_o):
            orders.append((ok, ck, "O", 1.0, d, "P"))
            ok += 1
        ck += 1

    # global rate = (12+15+15)/132 ~= 0.318; HOT (100% F, z ~= 5.1) is the
    # only group far from it — COLD/MILD sit ~1.1 sigma away (p ~= 0.25),
    # far above the BH cut at q=0.10.
    add_group("HOT", 1, 12, 0)    # all F
    add_group("COLD", 2, 15, 45)  # 25% F
    add_group("MILD", 3, 15, 45)  # 25% F
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
    out = {
        r["seg"]: r
        for r in _q("a_benjamini_hochberg_fdr").spark(spark, str(tmp_path)).collect()
    }
    assert out["HOT"]["rejected"] == 1
    assert out["HOT"]["rnk"] == 1
    assert out["COLD"]["rejected"] == 0
    assert out["MILD"]["rejected"] == 0
    # ranks are a permutation of 1..3
    assert sorted(r["rnk"] for r in out.values()) == [1, 2, 3]
