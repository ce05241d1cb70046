"""Wave-24 operators: IRLS logistic regression sign/symmetry contracts,
Neyman allocation on planted zero/high-variance strata, and MI ranking
separating a dependent from an independent event type."""

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


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_logreg_sign_and_symmetry(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 5)
    # positives concentrate at high x -> positive slope
    rows = [
        (i, t0, i, "click" if i >= 50 else "view", float(i), "{}")
        for i in range(100)
    ]
    _write_events(spark, tmp_path, rows)
    r = _q("ml_logreg_irls_two_rounds").spark(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 100 and r["n_pos"] == 50
    assert r["slope"] > 0.0
    assert r["intercept"] < 0.0  # boundary at x=50 pushes the intercept down

    # label flip -> (near-exactly) negated coefficients: round 1 negates
    # exactly, round 2 up to the 1e-4 sigmoid tick
    flipped = [
        (i, t0, i, "view" if i >= 50 else "click", float(i), "{}")
        for i in range(100)
    ]
    _write_events(spark, tmp_path, flipped)
    rf = _q("ml_logreg_irls_two_rounds").spark(spark, str(tmp_path)).collect()[0]
    assert abs(rf["slope"] + r["slope"]) < 1e-3
    assert abs(rf["intercept"] + r["intercept"]) < 1e-2


def test_neyman_prefers_high_variance_strata(spark, tmp_path):
    rows = []
    did = 0
    for i in range(30):  # constant stratum: S_h = 0 -> zero allocation
        rows.append((did, "x", "en", "flat", 100))
        did += 1
    for i in range(30):  # high-variance stratum
        rows.append((did, "x", "en", "wild", 10 if i % 2 else 1000))
        did += 1
    for i in range(30):  # mild variance
        rows.append((did, "x", "en", "mild", 100 + (i % 3)))
        did += 1
    _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in _q("sample_neyman_allocation").spark(spark, str(tmp_path)).collect()}
    assert sum(r["allocated"] for r in out.values()) == 1000  # exact budget
    assert out["flat"]["allocated"] == 0                      # S=0 stratum
    assert out["wild"]["allocated"] > out["mild"]["allocated"]


def test_mi_ranking_dependent_vs_independent(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 5)
    rows, eid = [], 0
    for i in range(400):
        # 'dep' fires only in the top half of the value range;
        # 'indep' is uniform across it
        rows.append((eid, t0, i, "dep" if i >= 200 else "indep", float(i), "{}"))
        eid += 1
        rows.append((eid, t0, i, "uni", float((i * 37) % 400), "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in _q("a_mutual_information_ranking").spark(spark, str(tmp_path)).collect()}
    assert out["dep"]["mi"] > out["uni"]["mi"]
    assert out["dep"]["rank"] < out["uni"]["rank"]
    # informative well beyond noise (the OVR indicator has p=0.25, so
    # even perfect dependence caps MI at H(0.25)=0.56 nats; decile
    # mixing with the interleaved uniform stream lowers it further)
    assert out["dep"]["mi"] > 0.05
