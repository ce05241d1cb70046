"""Wave-11 operators: signed hashing reproducibility and zero-mean
collisions; rolling-origin leak-freedom."""

import datetime


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_feature_hashing_deterministic_and_linear(spark, tmp_path):
    docs = [
        (1, "alpha beta", "en", "s", 1),
        (2, "alpha beta alpha beta", "en", "s", 1),  # doubled doc
        (3, "", "en", "s", 1),                        # empty -> no rows
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(docs, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {r["doc_id"]: r for r in _q("f_feature_hashing").spark(spark, str(tmp_path)).collect()}
    assert 3 not in rows  # no tokens -> no vector row
    v1 = [rows[1][f"f{b}"] for b in range(8)]
    v2 = [rows[2][f"f{b}"] for b in range(8)]
    assert v2 == [2 * x for x in v1]  # hashing is linear in counts
    assert sum(abs(x) for x in v1) > 0
    # rerun-stable
    rows_b = {r["doc_id"]: r for r in _q("f_feature_hashing").spark(spark, str(tmp_path)).collect()}
    assert {k: tuple(v[f"f{b}"] for b in range(8)) for k, v in rows.items()} == {
        k: tuple(v[f"f{b}"] for b in range(8)) for k, v in rows_b.items()
    }


def test_rolling_origin_never_leaks_future(spark, tmp_path):
    week = datetime.timedelta(days=7)
    t0 = datetime.datetime(2024, 1, 8)
    counts = [5, 3, 2, 7]  # events in weeks w0..w0+3
    rows = []
    i = 0
    for wi, n in enumerate(counts):
        for _ in range(n):
            rows.append((i, t0 + wi * week, 1, "view", 1.0, "{}"))
            i += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r["fold"]: r for r in _q("sample_rolling_origin_splits").spark(spark, str(tmp_path)).collect()}
    assert out[1]["n_train"] == 5 and out[1]["n_test"] == 3
    assert out[2]["n_train"] == 8 and out[2]["n_test"] == 2
    assert out[3]["n_train"] == 10 and out[3]["n_test"] == 7
    # expanding window: train sets strictly grow, train+test never overlap
    assert out[1]["n_train"] < out[2]["n_train"] < out[3]["n_train"]
