"""Wave-21 operators: DSIR importance weights on a planted two-dialect
corpus, hard negatives respect labels and bucket locality, contamination
grades on planted overlaps, epoch allocation conservation identities,
Heaps beta on a closed-vocabulary plant, and the streaming LSH collision
monitor vs its batch twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_dsir_prefers_target_dialect(spark, tmp_path):
    # target slice (doc_id%7==0) speaks pure "alpha"; raw docs are either
    # pure alpha (should score positive) or pure "omega" (negative)
    rows = []
    for i in range(70):
        word = "alpha" if (i % 7 == 0 or i % 2 == 0) else "omega"
        text = " ".join([word] * 20)
        rows.append((i, text, "en", f"src{i % 2}", len(text)))
    _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in _q("sample_dsir_importance").spark(spark, str(tmp_path)).collect()}
    # src0 = even ids = all alpha -> every doc selected; src1 = odd ids
    # (non-multiples of 7) = all omega -> none selected
    assert out["src0"]["n_selected"] == out["src0"]["n_docs"]
    assert out["src1"]["n_selected"] == 0
    assert out["src0"]["avg_log_importance"] > 0 > out["src1"]["avg_log_importance"]


def test_hard_negatives_label_and_rank(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(120):
        v = rng.normal(size=64)
        # dims 0-3 fixed positive -> everyone lands in one bucket: the
        # assertion set is the full label-mismatch candidate set
        v[:4] = np.abs(v[:4]) + 0.1
        rows.append((i, [float(x) for x in v], int(i % 3)))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = _q("sim_hard_negatives").spark(spark, str(tmp_path)).collect()
    assert len(out) == 20 * 3
    by_q = {}
    for r in out:
        assert r["neg_label"] != r["query_id"] % 3  # label mismatch holds
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for ranks in by_q.values():
        ranks.sort()
        assert [k for k, _ in ranks] == [1, 2, 3]
        cos = [c for _, c in ranks]
        assert cos == sorted(cos, reverse=True)  # hardest first


def test_contamination_grades(spark, tmp_path):
    eval_text = "the quick brown fox jumps over the lazy dog tonight"
    clean = "completely different words entirely here nothing shared at all"
    half = "the quick brown fox jumps alpha beta gamma delta epsilon zeta"
    rows = [
        (0, eval_text, "en", "eval", len(eval_text)),      # eval doc (id%10==0)
        (1, eval_text, "en", "dup", len(eval_text)),       # fully contaminated
        (2, clean, "en", "clean", len(clean)),             # clean
        (3, half, "en", "half", len(half)),                # partial overlap
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        (r["source"], r["grade"]): r
        for r in _q("dedup_contamination_fraction").spark(spark, str(tmp_path)).collect()
    }
    assert ("dup", "contaminated") in out and out[("dup", "contaminated")]["pooled_overlap"] == 1.0
    assert ("clean", "clean") in out and out[("clean", "clean")]["pooled_overlap"] == 0.0
    assert ("half", "partial") in out
    assert 0.0 < out[("half", "partial")]["pooled_overlap"] < 0.5


def test_epoch_allocation_identities(spark, tmp_path):
    rows = [
        (0, " ".join(["w"] * 400), "en", "big", 800),
        (1, " ".join(["w"] * 10), "en", "tiny", 20),
        (2, " ".join(["w"] * 100), "en", "mid", 200),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in _q("sample_epoch_allocation").spark(spark, str(tmp_path)).collect()}
    total = 400 + 10 + 100
    desired = (3 * total // 2) // 3  # 255
    for src, t_s in (("big", 400), ("tiny", 10), ("mid", 100)):
        r = out[src]
        assert r["desired"] == desired
        # conservation: effective = full*t_s + partial; shortfall closes it
        assert r["effective_tokens"] == r["full_epochs"] * t_s + r["partial_tokens"]
        assert r["desired"] == r["effective_tokens"] + r["shortfall"]
        assert r["full_epochs"] <= 4
    assert out["tiny"]["full_epochs"] == 4 and out["tiny"]["shortfall"] == desired - 40
    assert out["big"]["shortfall"] == 0


def test_heaps_closed_vocab_flat(spark, tmp_path):
    # closed 5-word vocabulary repeated everywhere: V(n) saturates at 5
    # by the first checkpoint -> beta ~ 0 (no growth)
    rows = [
        (i, " ".join("abcde"[j % 5] for j in range(80)), "en", "s", 80)
        for i in range(20)
    ]
    _write_docs(spark, tmp_path, rows)
    r = _q("text_heaps_law").spark(spark, str(tmp_path)).collect()[0]
    assert r["n_points"] == 16
    assert abs(r["beta"]) < 1e-9


def test_stream_lsh_matches_batch(spark, tmp_path):
    texts = [
        "one two three four five six seven eight nine ten",
        "one two three four five six seven eight nine ten",   # exact dup
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "totally unrelated content with its own words here now",
    ]
    rows = [(i, txt, "en", "s", len(txt)) for i, txt in enumerate(texts)]
    # the file-source stream globs on FILE names (the shipped testdata is
    # one file per table), so stage the frame and place a single
    # documents.parquet file rather than a part-file directory
    import glob
    import shutil

    staging = tmp_path / "staging"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(staging))
    part = glob.glob(str(staging / "part-*.parquet"))[0]
    shutil.copy(part, str(tmp_path / "documents.parquet"))
    stream_out = {
        r["band_idx"]: r
        for r in _q("stream_lsh_collisions").spark(spark, str(tmp_path)).collect()
    }
    # two exact-dup groups collide in EVERY band
    assert set(stream_out) == {0, 1, 2, 3}
    for b in range(4):
        assert stream_out[b]["n_collision_buckets"] == 2
        assert stream_out[b]["n_docs_in_collisions"] == 4
