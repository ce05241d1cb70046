"""Wave-25 operators: Naive Bayes on a separable two-language plant,
PIT feature matrix leakage checks on a hand-built timeline, and
k-means++ seed spread on planted far-apart clusters."""

from __future__ import annotations

import datetime


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_naive_bayes_separable_languages(spark, tmp_path):
    rows = []
    for i in range(60):
        if i % 2 == 0:
            rows.append((i, " ".join(["bonjour"] * 20), "fr", "s", 140))
        else:
            rows.append((i, " ".join(["hello"] * 20), "en", "s", 100))
    _write_docs(spark, tmp_path, rows)
    out = {(r["true_lang"], r["pred_lang"]): r["n"] for r in _q("ml_naive_bayes_classify").spark(spark, str(tmp_path)).collect()}
    # held-out = doc_id%3==0: ids 0,6,12,... mixed parity -> both langs
    # present; vocabularies are disjoint so NB is perfect
    assert all(t == p for (t, p) in out)
    assert sum(out.values()) == 20  # 60/3 held-out docs


def test_pit_matrix_no_future_leakage(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 10, 12, 0, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1: view(10)@t0, click@t+1, purchase@t+2, view(99)@t+3 (future!)
        (0, at(0), 1, "view", 10.0, "{}"),
        (1, at(1), 1, "click", 1.0, "{}"),
        (2, at(2), 1, "purchase", 5.0, "{}"),
        (3, at(3), 1, "view", 99.0, "{}"),
        # user 2: purchase with NO prior features
        (4, at(0), 2, "purchase", 5.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {r["user_id"]: r for r in _q("j_feature_store_pit_matrix").spark(spark, str(tmp_path)).collect()}
    # user 1: last view BEFORE purchase is 10, not the future 99
    assert out[1]["n_labels"] == 1
    assert out[1]["sum_last_view"] == 10
    assert out[1]["sum_cum_clicks"] == 1
    # user 2: no features -> sentinel -1 / 0
    assert out[2]["sum_last_view"] == -1
    assert out[2]["sum_cum_clicks"] == 0


def test_kmeanspp_seeds_spread_across_clusters(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    centers = {0: 0.0, 1: 50.0, 2: -50.0}  # three far-apart blobs on dim 0
    vid = 0
    for c, off in centers.items():
        for _ in range(40):
            v = rng.normal(scale=0.1, size=64)
            v[0] += off
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    r = _q("ml_kmeanspp_seeding").spark(spark, str(tmp_path)).collect()[0]
    seeds = [r["seed0"], r["seed1"], r["seed2"]]
    assert len(set(seeds)) == 3
    blobs = {s // 40 for s in seeds}
    # D^2 weighting must land one seed in each far-apart blob
    assert blobs == {0, 1, 2}
    assert r["n_rest"] == 120 - 3
    assert r["potential_ticks"] > 0
