"""Wave-34 operators: MIPS ranking vs a hand-ranked dot-product set,
QTE on a planted location/scale shift, and BLEU-2 identities on
hand-built candidate/reference pairs."""

from __future__ import annotations

import datetime
import math


def _q(name):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    return load_all()[name]


def test_mips_ranks_by_inner_product_not_cosine(spark, tmp_path):
    # query (id 0) = e0. Candidates: id 10 = 5*e0 (ip 5, cosine 1),
    # id 11 = unit e0 (ip 1, cosine 1), id 12 = [3, 3] direction
    # (ip 3, cosine < 1). MIPS order must be 10, 12, 11 — cosine alone
    # would tie 10/11 ahead of 12.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (10, [5.0, 0.0, 0.0, 0.0], 0),
        (11, [1.0, 0.0, 0.0, 0.0], 0),
        (12, [3.0, 3.0, 0.0, 0.0], 0),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = sorted(
        _q("sim_mips_norm_reduction").spark(spark, str(tmp_path)).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["neighbor_id"] for r in out] == [10, 12, 11]
    assert [round(r["inner_product"], 6) for r in out] == [5.0, 3.0, 1.0]
    assert all(r["reduction_rank_match"] == 1 for r in out)


def test_qte_location_shift(spark, tmp_path):
    # control: 1..100 dollars; treated: 11..110 (pure +10 shift) ->
    # QTE = 10 at every quantile.
    d = datetime.date(2024, 1, 1)
    orders = []
    ok = 0
    for v in range(1, 101):
        orders.append((ok, 1, "O", float(v), d, "2-HIGH"))
        ok += 1
    for v in range(11, 111):
        orders.append((ok, 1, "O", float(v), d, "1-URGENT"))
        ok += 1
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r["quantile_pct"]: r
        for r in _q("a_quantile_treatment_effect").spark(spark, str(tmp_path)).collect()
    }
    assert set(out) == {25, 50, 75}
    for q in (25, 50, 75):
        assert abs(out[q]["qte"] - 10.0) < 1e-9
    assert abs(out[50]["control_quantile"] - 50.0) < 1e-9
    assert abs(out[50]["treated_quantile"] - 60.0) < 1e-9


def test_bleu2_identity_and_zero(spark, tmp_path):
    # source s1: docs 0,1 identical -> bleu2 = 1.
    # source s2: docs 2,3 share no tokens -> bleu2 = 0.
    # source s3: docs 4,5 partial overlap, hand-computed.
    docs = [
        (0, "a b c d", "en", "s1", 7),
        (1, "a b c d", "en", "s1", 7),
        (2, "x y z w", "en", "s2", 7),
        (3, "p q r s", "en", "s2", 7),
        (4, "a b c d", "en", "s3", 7),   # candidate
        (5, "a b e f", "en", "s3", 7),   # reference
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["cand_id"]: r for r in _q("text_bleu2_near_pairs").spark(spark, str(tmp_path)).collect()}
    assert abs(out[0]["bleu2"] - 1.0) < 1e-6
    assert out[2]["bleu2"] == 0.0
    # cand 4 vs ref 5: unigram hits a,b -> p1 = 2/4; bigrams cand =
    # {ab, bc, cd}, ref = {ab, be, ef} -> hits {ab} -> p2 = 1/3;
    # lens equal -> bp = 1; bleu = sqrt(0.5 * 1/3).
    want = math.sqrt(0.5 * (1.0 / 3.0))
    assert abs(out[4]["p1"] - 0.5) < 1e-9
    assert abs(out[4]["p2"] - 1.0 / 3.0) < 1e-6
    assert abs(out[4]["bleu2"] - want) < 1e-5
