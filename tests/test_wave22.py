"""Wave-22 operators: TextRank hub recovery, CUPED on a planted
perfectly-correlated covariate, the delta-join identity, bloom
runtime-filter no-false-negative guarantee, PQ occupancy conservation,
and Merkle digest sensitivity/partition-invariance."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_textrank_hub_ranks_first(spark, tmp_path):
    # "hub" is adjacent to 20 distinct words; the others only see the hub
    words = [f"w{i:02d}" for i in range(20)]
    text = " ".join(x for w in words for x in ("hub", w))
    _write_docs(spark, tmp_path, [(0, text, "en", "s", len(text))])
    out = _q("text_textrank_keywords").spark(spark, str(tmp_path)).collect()
    best = min(out, key=lambda r: r["rk"])
    assert best["keyword"] == "hub" and best["rk"] == 1
    assert len(out) == 10


def test_cuped_planted_correlation(spark, tmp_path):
    # y = 2x per user and no treatment effect: the covariate explains all
    # variance -> var_reduction ~ 1 and the adjusted diff collapses to ~0
    t0 = datetime.datetime(2024, 1, 10)
    t1 = datetime.datetime(2024, 1, 20)  # after the fixed CUPED split
    rows, eid = [], 0
    for u in range(60):
        x = 10 + (u % 13) * 7
        for ts, mult in ((t0, 1), (t1, 2)):
            rows.append((eid, ts, u, "m", float(x * mult), "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = _q("a_cuped_adjustment").spark(spark, str(tmp_path)).collect()[0]
    assert r["n_treat"] + r["n_ctrl"] == 60
    assert abs(r["theta"] - 2.0) < 1e-9
    assert abs(r["var_reduction"] - 1.0) < 1e-6
    assert abs(r["adjusted_diff"]) < 1e-6
    assert abs(r["adjusted_diff"]) <= abs(r["raw_diff"]) + 1e-9


def test_incremental_join_view_consistent(spark):
    rows = _q("w_incremental_join_view").spark(spark, SF).collect()
    assert len(rows) > 0
    assert all(r["consistent"] == 1 for r in rows)
    assert any(r["delta_orders"] > 0 for r in rows)  # deltas actually flow


def test_bloom_filter_no_false_negatives(spark):
    from cicevse2024_tfm_datapipeline_spark.plans.common import t as load

    r = _q("j_bloom_runtime_filter").spark(spark, SF).collect()[0]
    part = load(spark, SF, "part").filter(F.col("p_size") == 15).select("p_partkey")
    li = load(spark, SF, "lineitem")
    direct = li.join(part, li.l_partkey == part.p_partkey).count()
    assert r["n_matched"] == direct  # bloom never drops a true match
    assert r["n_false_pos"] >= 0
    assert r["n_bloom_pass"] == r["n_matched"] + r["n_false_pos"]


def test_pq_occupancy_conservation(spark):
    from cicevse2024_tfm_datapipeline_spark.plans.common import t as load

    rows = _q("sim_pq_codebook_audit").spark(spark, SF).collect()
    n_vec = load(spark, SF, "embeddings").count()
    per_sub = {}
    for r in rows:
        assert 0 <= r["cell"] < 8 and 0 <= r["subspace"] < 4
        assert r["mean_sq_error"] >= 0.0
        per_sub[r["subspace"]] = per_sub.get(r["subspace"], 0) + r["n_vectors"]
    assert per_sub == {s: n_vec for s in range(4)}  # every vector coded once


def test_merkle_sensitivity_and_partition_invariance(spark, tmp_path):
    rows = [(i, f"document number {i} body", "en", "s", 20) for i in range(200)]
    _write_docs(spark, tmp_path, rows)
    r1 = _q("a_merkle_corpus_digest").spark(spark, str(tmp_path)).collect()[0]
    assert r1["n_docs"] == 200 and r1["n_l1_nodes"] == 4 and r1["n_l2_nodes"] == 1

    # same content, different physical layout -> identical root
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(7).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    r2 = _q("a_merkle_corpus_digest").spark(spark, str(tmp_path)).collect()[0]
    assert r2["root_digest"] == r1["root_digest"]

    # one changed document -> different root
    rows3 = list(rows)
    rows3[123] = (123, "MUTATED body", "en", "s", 12)
    _write_docs(spark, tmp_path, rows3)
    r3 = _q("a_merkle_corpus_digest").spark(spark, str(tmp_path)).collect()[0]
    assert r3["root_digest"] != r1["root_digest"]
