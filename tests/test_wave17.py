"""Wave-17 operators: DiD cell identity on planted rates, Adamic-Adar
predictions are true non-edges, and lossless quantization gives
perfect recall."""

import datetime

SF01 = "/root/testdata/sf0.1"


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_did_recovers_planted_effect(spark, tmp_path):
    # treated rate: 0.2 pre -> 0.7 post (change +0.5)
    # control rate: 0.1 pre -> 0.3 post (change +0.2)  => DiD = +0.3
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # days 0..9; mid = (0+9)//2 = 4 -> pre: day <= 4, post: day > 4
    for day in range(10):
        post = day > 4
        for treated, (pre_rate, post_rate) in (
            (True, (0.2, 0.7)),
            (False, (0.1, 0.3)),
        ):
            rate = post_rate if post else pre_rate
            n = 10
            k = round(rate * n)
            for j in range(n):
                # value >= 100 -> charging (treated); attack label from
                # event_type not in (view, click)
                et = "error" if j < k else "view"
                val = 150.0 if treated else 50.0
                rows.append(
                    (eid, t0 + datetime.timedelta(days=day, minutes=eid % 60),
                     1, et, val, "{}")
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = _q("a_difference_in_differences").spark(spark, str(tmp_path)).collect()[0]
    assert abs(r["treated_pre"] - 0.2) < 1e-9
    assert abs(r["treated_post"] - 0.7) < 1e-9
    assert abs(r["control_pre"] - 0.1) < 1e-9
    assert abs(r["control_post"] - 0.3) < 1e-9
    assert abs(r["did"] - 0.3) < 1e-9


def test_adamic_adar_predicts_only_nonedges(spark):
    from pyspark.sql import functions as F

    from cicevse2024_tfm_datapipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
    )
    from cicevse2024_tfm_datapipeline_spark.plans.common import t as _t

    out = _q("g_adamic_adar").spark(spark, SF01).collect()
    assert len(out) == 20  # sf0.1's graph has open wedges
    docs = _t(spark, SF01, "documents")
    edges = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(docs, "text", "doc_id").collect()
    }
    scores = [r["adamic_adar"] for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        assert (r["doc_a"], r["doc_b"]) not in edges  # novelty filter
        assert r["doc_a"] < r["doc_b"]
        assert r["n_common"] >= 1
        assert r["adamic_adar"] > 0


def test_lossless_quantization_gives_perfect_recall(spark, tmp_path):
    # embeddings whose ticks are exact multiples of the per-dim max/127
    # quantize losslessly -> both rankings identical -> recall 1.0
    # values in {-1, 0, 1}: ticks are {-10000, 0, 10000}, codes are
    # exactly {-127, 0, 127} (proportional), so the quantized dot is
    # 127^2/1e8 times the full dot — identical total order, recall 1.0.
    # (Fractional values would NOT work: round-half-up is asymmetric
    # around zero, e.g. 0.5 -> code 64 but -0.5 -> code -63.)
    import random

    rng = random.Random(11)
    rows = [(0, [1.0] * 8, 0)]  # pins every dim's max|tick| to 10000
    for vid in range(1, 40):
        emb = [float(rng.choice((-1, 0, 1))) for _ in range(8)]
        rows.append((vid, emb, vid % 3))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = _q("sim_quantization_recall").spark(spark, str(tmp_path)).collect()
    assert len(out) == 10
    for r in out:
        assert r["n_overlap"] == 10
        assert abs(r["recall_at_10"] - 1.0) < 1e-9
