"""Wave-32 operators: GBM stumps on a planted two-split signal, KN
smoothing on a hand-computable corpus, and EB shrinkage direction/
magnitude checks."""

from __future__ import annotations

import datetime


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_gbm_recovers_planted_splits(spark, tmp_path):
    # y depends ONLY on two step functions: +10000 cents if q > 25,
    # +8000 cents if d > 5. Round 1 picks the q<=25 split (larger
    # balanced gain); with learning rate 0.5 the remaining q-gap is
    # 5000 < 8000, so round 2 must flip to the d<=5 split.
    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    k = 0
    for q in range(1, 51):
        for d in range(0, 11):
            y = 50000 + (10000 if q > 25 else 0) + (8000 if d > 5 else 0)
            rows.append((k, k, k, 1, float(q), y / 100.0, d / 100.0,
                         0.0, "N", "O", d0))
            k += 1
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = _q("ml_gbm_two_stumps").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["feature_1"] == "q" and r["threshold_1"] == 25
    assert r["feature_2"] == "d" and r["threshold_2"] == 5
    # learning rate 0.5: round-1 leaves move half the gap each side
    assert r["gamma1_left"] < 0 < r["gamma1_right"]
    assert r["gamma2_left"] < 0 < r["gamma2_right"]
    assert r["r2_vs_mean"] > 0.6  # two half-rate stumps on a two-step target
    assert r["train_rmse"] < 60.0


def test_kneser_ney_hand_corpus(spark, tmp_path):
    # corpus: "a b" x3 and "a c" x1 (all docs source s1).
    # bigrams: (a,b) c=3, (a,c) c=1 -> cc(a)=4, n1fwd(a)=2, bt=2,
    # n1back(b)=1, n1back(c)=1.
    # P(b|a) = (3-.75)/4 + (.75*2/4)*(1/2) = 0.5625 + 0.1875 = 0.75
    # P(c|a) = (1-.75)/4 + 0.1875 = 0.0625 + 0.1875 = 0.25
    import math

    docs = [
        (0, "a b", "en", "s1", 3),
        (1, "a b", "en", "s1", 3),
        (2, "a b", "en", "s1", 3),
        (3, "a c", "en", "s1", 3),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = _q("text_kneser_ney_bigram").spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_bigrams"] == 4
    want_nll = -(3 * math.log(0.75) + math.log(0.25)) / 4
    assert abs(r["avg_nll"] - want_nll) < 1e-5
    assert abs(r["perplexity"] - math.exp(want_nll)) < 1e-4


def test_eb_shrinkage_direction(spark, tmp_path):
    # many mid-rate users + one extreme low-n user: the small-sample
    # user shrinks toward the population mean; a high-volume user with
    # the same rate barely moves.
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add_user(uid, n, x):
        nonlocal eid
        for i in range(n):
            et = "purchase" if i < x else "view"
            rows.append((eid, t0, uid, et, 1.0, ""))
            eid += 1

    # population: rates spread around ~0.3
    for u, (n, x) in enumerate([(50, 10), (50, 15), (50, 20), (50, 12),
                                (50, 18), (50, 14), (50, 16), (50, 13)]):
        add_user(u, n, x)
    add_user(100, 2, 2)    # tiny n, rate 1.0
    add_user(101, 200, 60)  # big n, rate 0.3
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r["user_id"]: r for r in _q("a_empirical_bayes_shrinkage").spark(spark, str(tmp_path)).collect()}
    tiny = out[100]
    big = out[101]
    assert tiny["raw_rate"] == 1.0
    # shrinks a long way toward the population mean (~0.36 incl. user 100)
    assert tiny["shrunk_rate"] < 0.85
    assert abs(big["shrunk_rate"] - big["raw_rate"]) < abs(
        tiny["shrunk_rate"] - tiny["raw_rate"]
    )
    assert out[0]["alpha"] > 0 and out[0]["beta"] > 0
