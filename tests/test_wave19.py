"""Wave-19 operators: SPC rule counts vs an integer Python mirror on
planted patterns, and Markov-entropy identities on a deterministic
cycle."""

import datetime

SF = "/root/testdata/sf0.001"


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def _spc_mirror(counts):
    """Integer mirror of the query's rule arithmetic."""
    n = len(counts)
    S = sum(counts)
    Q = sum(c * c for c in counts)
    var_xn2 = n * Q - S * S
    rows = []
    for c in counts:
        dev = c * n - S
        sgn = (dev > 0) - (dev < 0)
        rows.append(
            (sgn, dev * dev > 9 * var_xn2, dev * dev > 4 * var_xn2)
        )
    r1 = sum(1 for _, b3, _b2 in rows if b3)
    r2 = r4 = 0
    for i in range(len(rows)):
        if i >= 2:
            w = rows[i - 2 : i + 1]
            up = sum(1 for s, _, b2 in w if b2 and s > 0)
            dn = sum(1 for s, _, b2 in w if b2 and s < 0)
            if up >= 2 or dn >= 2:
                r2 += 1
        if i >= 7:
            w = rows[i - 7 : i + 1]
            up = sum(1 for s, _, _ in w if s > 0)
            dn = sum(1 for s, _, _ in w if s < 0)
            if up == 8 or dn == 8:
                r4 += 1
    return r1, r2, r4


def test_spc_rules_match_integer_mirror(spark, tmp_path):
    t0 = datetime.datetime(2024, 6, 1)
    scenarios = {
        "spike": [10] * 15 + [200] + [10] * 14,  # one extreme point
        "flat": [12] * 30,  # zero variance -> zero violations
        "steps": [10] * 20 + [14] * 10,  # sustained shift -> runs
    }
    rows, eid = [], 0
    for et, counts in scenarios.items():
        for day, cnt in enumerate(counts):
            for _ in range(cnt):
                rows.append(
                    (eid, t0 + datetime.timedelta(days=day, minutes=eid % 60),
                     1, et, 1.0, "{}")
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["event_type"]: r
        for r in _q("a_spc_western_electric").spark(spark, str(tmp_path)).collect()
    }
    for et, counts in scenarios.items():
        r1, r2, r4 = _spc_mirror(counts)
        assert out[et]["n_days"] == len(counts)
        assert out[et]["rule1_violations"] == r1, et
        assert out[et]["rule2_violations"] == r2, et
        assert out[et]["rule4_violations"] == r4, et
    assert out["spike"]["rule1_violations"] >= 1
    assert out["flat"]["rule1_violations"] == 0
    assert out["flat"]["rule4_violations"] == 0
    assert out["steps"]["rule4_violations"] >= 1


def test_markov_entropy_on_deterministic_cycle(spark, tmp_path):
    # a strict cycle view -> click -> purchase -> view ... makes the
    # next event fully determined: H(next|cur) = 0 and the information
    # gain equals the marginal entropy
    t0 = datetime.datetime(2024, 6, 1)
    cyc = ["view", "click", "purchase"]
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, cyc[i % 3], 1.0, "{}")
        for i in range(90)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = _q("a_markov_conditional_entropy").spark(spark, str(tmp_path)).collect()[0]
    assert r["n_transitions"] == 89
    assert r["cond_entropy_bits"] == 0.0
    assert r["marginal_entropy_bits"] > 1.5  # ~log2(3)
    assert abs(r["information_gain_bits"] - r["marginal_entropy_bits"]) < 1e-9


def test_markov_gain_nonnegative_on_real_data(spark):
    r = _q("a_markov_conditional_entropy").spark(spark, SF).collect()[0]
    assert r["information_gain_bits"] >= -1e-6  # MI >= 0 up to tick noise
    assert 0.0 <= r["cond_entropy_bits"] <= r["marginal_entropy_bits"] + 1e-6
