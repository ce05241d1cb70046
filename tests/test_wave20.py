"""Wave-20 operators: retention decay fit vs a NumPy mirror on a
planted exponential cohort, and burstiness identities (Poisson-like
vs constant vs bursty plants)."""

import datetime

import numpy as np


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_retention_fit_recovers_planted_decay(spark, tmp_path):
    # 64 users, all engaged in week 0; halve the engaged population
    # every week (32, 16, 8): exact decay ln(1/2) per week, half-life 1
    t0 = datetime.datetime(2024, 1, 1)  # the week origin
    rows, eid = [], 0
    alive = 64
    for week in range(4):
        for u in range(alive):
            for k in range(15):  # exactly at the engagement threshold
                rows.append(
                    (eid, t0 + datetime.timedelta(weeks=week, hours=k),
                     u, "view", 1.0, "{}")
                )
                eid += 1
        alive //= 2
    _write_events(spark, tmp_path, rows)
    r = _q("a_retention_half_life").spark(spark, str(tmp_path)).collect()[0]
    assert r["n_offsets"] == 3
    assert abs(r["decay_per_week"] - np.log(0.5)) < 1e-3  # tick rounding
    assert abs(r["half_life_weeks"] - 1.0) < 1e-2


def test_burstiness_identities(spark, tmp_path):
    t0 = datetime.datetime(2024, 6, 1)
    scenarios = {
        "constant": [20] * 10,  # var 0 -> fano 0, burstiness -1
        "bursty": [1] * 9 + [191],  # extreme concentration
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
    _write_events(spark, tmp_path, rows)
    out = {
        r["event_type"]: r
        for r in _q("a_burstiness_fano").spark(spark, str(tmp_path)).collect()
    }
    c = out["constant"]
    assert c["fano"] == 0.0 and c["burstiness"] == -1.0
    b = out["bursty"]
    counts = np.array(scenarios["bursty"], dtype=float)
    fano = counts.var() / counts.mean()
    burst = (counts.std() - counts.mean()) / (counts.std() + counts.mean())
    assert abs(b["fano"] - fano) < 1e-6
    assert abs(b["burstiness"] - burst) < 1e-6
    assert b["fano"] > 1.0  # overdispersed
