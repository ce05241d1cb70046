"""Wave-23 operators: sorted-neighborhood pairing, CCNet tercile
ordering on a planted easy/hard-vocabulary corpus, one-rule-at-a-time
Gopher violations, and exact overlap Jaccard on planted shingle sets."""

from __future__ import annotations


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_sorted_neighborhood_pairs(spark, tmp_path):
    near_a = "alpha beta gamma delta epsilon zeta"
    near_b = "alpha beta gamma delta epsilon zetX"  # 1 edit away
    far = "completely different text with nothing shared whatsoever here"
    rows = [
        (0, near_a, "en", "s", len(near_a)),
        (1, far, "en", "s", len(far)),
        (2, near_b, "en", "s", len(near_b)),
    ]
    _write_docs(spark, tmp_path, rows)
    out = _q("dedup_sorted_neighborhood").spark(spark, str(tmp_path)).collect()
    pairs = {tuple(sorted((r["doc_a"], r["doc_b"]))): r["lev"] for r in out}
    # sort puts the two near-dups adjacent despite ids 0 and 2 (doc_a is
    # the sort-order predecessor, not the smaller id — 'zetX' < 'zeta')
    assert pairs == {(0, 2): 1}


def test_ccnet_terciles_rank_rare_vocab_last(spark, tmp_path):
    rows = []
    # 9 docs: 6 from the common vocabulary, 3 of singleton rare words
    for i in range(6):
        rows.append((i, " ".join(["common"] * 30), "en", "s", 180))
    for i in range(6, 9):
        text = " ".join(f"rare{i}x{j}" for j in range(30))
        rows.append((i, text, "en", "s", len(text)))
    _write_docs(spark, tmp_path, rows)
    out = {r["bucket"]: r for r in _q("text_ccnet_perplexity_buckets").spark(spark, str(tmp_path)).collect()}
    assert {1, 2, 3} == set(out)
    assert out[1]["n_docs"] == 3 and out[2]["n_docs"] == 3 and out[3]["n_docs"] == 3
    # rare-vocab docs have strictly higher nll -> the tail bucket
    assert out[3]["avg_nll"] > out[1]["avg_nll"]


def test_gopher_rules_one_violation_each(spark, tmp_path):
    good = "the quick brown fox and a dog of mine " * 8  # 80 tokens, clean
    short = "the of and a tiny"                           # fails length only
    longwords = " ".join(["the", "of"] + ["extraordinarily"] * 78)  # mean len > 10
    symbols = ("the of and a " + "@#$% " * 40) + "word " * 40      # symbol-heavy
    nostop = " ".join(f"tok{i}" for i in range(80))                 # no stopwords
    repetitive = "the of and a " + "same pair " * 60                # one bigram dominates
    rows = [
        (0, good, "en", "good", len(good)),
        (1, short, "en", "short", len(short)),
        (2, longwords, "en", "longw", len(longwords)),
        (3, symbols, "en", "sym", len(symbols)),
        (4, nostop, "en", "nostop", len(nostop)),
        (5, repetitive, "en", "rep", len(repetitive)),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in _q("text_gopher_quality_rules").spark(spark, str(tmp_path)).collect()}
    assert out["good"]["pass_all"] == 1
    assert out["short"]["pass_length"] == 0
    assert out["longw"]["pass_word_len"] == 0
    assert out["sym"]["pass_symbols"] == 0
    assert out["nostop"]["pass_stopwords"] == 0
    assert out["rep"]["pass_repetition"] == 0
    for bad in ("short", "longw", "sym", "nostop", "rep"):
        assert out[bad]["pass_all"] == 0


def test_overlap_matrix_exact_jaccard(spark, tmp_path):
    # src0 and src1 share exactly their first 3 tokens -> one common
    # 3-shingle; src2 shares nothing
    rows = [
        (0, "a b c d e", "en", "src0", 9),    # shingles: abc bcd cde
        (1, "a b c x y", "en", "src1", 9),    # shingles: abc bcx cxy
        (2, "p q r s t", "en", "src2", 9),    # disjoint
    ]
    _write_docs(spark, tmp_path, rows)
    out = {(r["src_a"], r["src_b"]): r for r in _q("dedup_source_overlap_matrix").spark(spark, str(tmp_path)).collect()}
    assert set(out) == {(0, 1)}  # zero-overlap pairs are absent
    r = out[(0, 1)]
    assert r["n_common"] == 1
    assert abs(r["jaccard"] - 1 / 5) < 1e-9  # |A|=3, |B|=3, common=1
