"""Wave-18 operators: PSI is exactly zero on identical halves and
large on a shifted half; conformal coverage is exact on a perfectly
periodic series; golden-record survivorship rules on a planted
cluster."""

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


def _mk_days(values_by_day):
    t0 = datetime.datetime(2024, 5, 1)
    rows, eid = [], 0
    for day, vals in values_by_day.items():
        for v in vals:
            rows.append(
                (eid, t0 + datetime.timedelta(days=day, minutes=eid % 60),
                 1, "view", float(v), "{}")
            )
            eid += 1
    return rows


def test_psi_zero_on_identical_halves(spark, tmp_path):
    # days 0..9 (mid=4): post days replay the pre days' values exactly
    vals = [float(v) for v in range(1, 41)]
    by_day = {d: vals for d in range(10)}
    _write_events(spark, tmp_path, _mk_days(by_day))
    r = _q("a_psi_drift").spark(spark, str(tmp_path)).collect()[0]
    assert r["n_pre"] == r["n_post"] == 200
    assert r["psi"] == 0.0  # p == q in every bin, exactly


def test_psi_flags_shifted_half(spark, tmp_path):
    pre_vals = [float(v) for v in range(1, 41)]
    post_vals = [float(v + 100) for v in range(1, 41)]  # full shift
    by_day = {d: (pre_vals if d <= 4 else post_vals) for d in range(10)}
    _write_events(spark, tmp_path, _mk_days(by_day))
    r = _q("a_psi_drift").spark(spark, str(tmp_path)).collect()[0]
    assert r["psi"] > 0.25  # way past the retrain threshold


def test_psi_plan_single_ntile_subtree(spark):
    """Round-7 regression pin: the ntile/edges subtree must not appear in
    the executed plan at all (the lazily-pinned edge array truncates that
    lineage — unpinned, the cum___one window block executed once PER
    bins_of consumer), and the exchange count stays at the audited 9."""
    df = _q("a_psi_drift").spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("cum___one") == 0, "ntile subtree leaked past the pin"
    assert plan.count("Exchange") <= 9, f"exchanges grew: {plan.count('Exchange')}"


def test_conformal_exact_on_periodic_series(spark, tmp_path):
    # weekly-periodic counts: residuals are 0 everywhere -> q_hat = 0,
    # coverage = 1.0
    t0 = datetime.datetime(2024, 5, 1)
    rows, eid = [], 0
    for day in range(28):
        for _ in range(3 + (day % 7)):  # count depends only on day-of-week
            rows.append(
                (eid, t0 + datetime.timedelta(days=day, minutes=eid % 60),
                 1, "view", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = _q("a_conformal_naive_coverage").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["q_hat"] == 0
    assert r["coverage"] == 1.0
    # 21 predictable days (7..27) split by parity
    assert r["n_cal"] + r["n_test"] == 21


def test_golden_record_survivorship_rules(spark, tmp_path):
    base = " ".join(f"w{i}" for i in range(60))
    cluster = [
        (5, base + " tail5", "src_a", 300),
        (7, base + " tail7", "src_a", 450),
        (9, base + " tail9", "src_b", 120),
    ]
    singles = [
        (20, " ".join(f"x{i}" for i in range(40)), "src_c", 200),
        (21, " ".join(f"y{i}" for i in range(40)), "src_c", 210),
    ]
    rows = [
        (did, text, "en", src, n) for did, text, src, n in cluster + singles
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = _q("dedup_golden_record").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1  # singletons excluded
    r = out[0]
    assert r["cluster_id"] == 5 and r["canonical_id"] == 5  # MIN id
    assert r["n_members"] == 3
    assert r["best_n_chars"] == 450  # MAX completeness
    assert r["mode_source"] == "src_a"  # consensus with 2 of 3
