"""Wave-29 operators: pinball loss on a hand-computed split, linear MMD
zero/positive cases on planted embeddings, Mann–Kendall on strictly
monotone and flat daily series."""

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


def test_pinball_loss_hand_computed(spark, tmp_path):
    # one series, 8 events: train = first 4 (values 1,2,3,4),
    # test = last 4 (values 2,2,2,2).
    # q=0.5 forecast = ceil(0.5*4)=2nd order stat = 2.00 -> loss 0.
    # q=0.1 forecast = ceil(0.1*4)=1st = 1.00 -> each test row: y>=f,
    #   0.1*(2-1)=0.1 -> mean 0.1.
    # q=0.9 forecast = ceil(0.9*4)=4th = 4.00 -> y<f: 0.1*(4-2)=0.2.
    t0 = datetime.datetime(2024, 1, 1)
    vals = [1.0, 2.0, 3.0, 4.0, 2.0, 2.0, 2.0, 2.0]
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "click", v, "")
        for i, v in enumerate(vals)
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        round(r["quantile"], 1): r
        for r in _q("a_pinball_loss_quantile_eval").spark(spark, str(tmp_path)).collect()
    }
    assert len(out) == 3
    assert out[0.5]["forecast"] == 2.0
    assert abs(out[0.5]["pinball_loss"] - 0.0) < 1e-9
    assert out[0.1]["forecast"] == 1.0
    assert abs(out[0.1]["pinball_loss"] - 0.1) < 1e-9
    assert out[0.9]["forecast"] == 4.0
    assert abs(out[0.9]["pinball_loss"] - 0.2) < 1e-9
    assert out[0.5]["n_train"] == 4 and out[0.5]["n_test"] == 4


def test_mmd_linear_zero_for_identical_groups(spark, tmp_path):
    # labels 0 and 1 hold the SAME vectors in the same id order ->
    # every h term cancels: k(x1,x2)+k(y1,y2)-k(x1,y2)-k(x2,y1) = 0.
    rows = []
    vid = 0
    for lab in (0, 1):
        for i in range(6):
            v = [float(i + 1), float(2 * i), 1.0, -1.0]
            rows.append((vid, v, lab))
            vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = _q("a_mmd_linear_two_sample").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_a"] == 6 and r["n_b"] == 6 and r["m_pairs"] == 3
    assert abs(r["mmd2_linear"]) < 1e-6


def test_mmd_linear_positive_for_separated_groups(spark, tmp_path):
    # label 0 on +e0, label 1 on +e1 with varying norms -> within-group
    # kernels exceed cross-group ones -> mmd2 > 0.
    rows = []
    vid = 0
    for i in range(6):
        rows.append((vid, [2.0 + i * 0.1, 0.0, 0.0, 0.0], 0))
        vid += 1
    for i in range(6):
        rows.append((vid, [0.0, 2.0 + i * 0.1, 0.0, 0.0], 1))
        vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = _q("a_mmd_linear_two_sample").spark(spark, str(tmp_path)).collect()
    assert out[0]["mmd2_linear"] > 0.1


def test_mann_kendall_trends(spark, tmp_path):
    # 'up': strictly increasing daily means over 10 days -> S = 45,
    # z = 44/sqrt(125) ~= 3.94 -> increasing.
    # 'flat': constant -> S = 0, all tied -> no_trend.
    t0 = datetime.datetime(2024, 3, 1, 12, 0)
    rows = []
    eid = 0
    for d in range(10):
        rows.append((eid, t0 + datetime.timedelta(days=d), 1, "up", 10.0 + d, ""))
        eid += 1
    for d in range(10):
        rows.append((eid, t0 + datetime.timedelta(days=d), 1, "flat", 5.0, ""))
        eid += 1
    _write_events(spark, tmp_path, rows)
    out = {
        r["event_type"]: r
        for r in _q("a_mann_kendall_trend").spark(spark, str(tmp_path)).collect()
    }
    up = out["up"]
    assert up["n_days"] == 10 and up["s_stat"] == 45
    assert up["trend"] == "increasing"
    # var = 10*9*25/18 = 125
    assert abs(up["var_s"] - 125.0) < 1e-9
    assert abs(up["z"] - 44.0 / 125.0**0.5) < 1e-5
    flat = out["flat"]
    assert flat["s_stat"] == 0
    assert flat["trend"] == "no_trend"
    # all 10 days tied: tie_term = 10*9*25 = 2250 -> var = (2250-2250)/18 = 0
    assert abs(flat["var_s"]) < 1e-9
