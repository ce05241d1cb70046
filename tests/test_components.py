"""Connected-components (fuzzy-dedup clustering) and repetition-signal
tests: hand-built graphs with known components, partitioning
invariance, and a pandas differential for the Gopher-style signals.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.dedup import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    out = connected_components(df)
    return {r.node: r.component for r in out.collect()}


def test_cc_two_cliques(spark):
    # {1,2,3} clique and {10,11} pair — labels are min member ids
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11)]
    got = _cc(spark, pairs)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_chain_transitivity(spark):
    # A~B, B~C, C~D with no direct A~D: one component via transitivity —
    # the exact case where pair-level dedup under-merges
    pairs = [(4, 5), (5, 6), (6, 7)]
    got = _cc(spark, pairs)
    assert got == {4: 4, 5: 4, 6: 4, 7: 4}


def test_cc_long_path_converges(spark):
    # path graph 0-1-2-...-9: worst-case diameter for label propagation
    pairs = [(i, i + 1) for i in range(9)]
    got = _cc(spark, pairs)
    assert got == {i: 0 for i in range(10)}


def test_cc_singletons_not_emitted(spark):
    pairs = [(100, 200)]
    got = _cc(spark, pairs)
    assert set(got) == {100, 200}


def test_cc_partitioning_invariant(spark):
    pairs = [(1, 2), (2, 3), (7, 8), (3, 9), (20, 21)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    a = {r.node: r.component for r in connected_components(df).collect()}
    b = {
        r.node: r.component
        for r in connected_components(df.repartition(7)).collect()
    }
    assert a == b == {1: 1, 2: 1, 3: 1, 9: 1, 7: 7, 8: 7, 20: 20, 21: 20}


def test_repetition_signals_vs_pandas(spark):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all
    from tests.conftest import SF_SMOKE

    q = load_all()["text_repetition_signals"]
    got = q.spark(spark, SF_SMOKE).toPandas().set_index("doc_id").sort_index()

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    for _, row in docs.head(25).iterrows():
        toks = [t for t in row.text.split() if t]
        assert len(toks) > 0
        g = got.loc[row.doc_id]
        assert g.n_tokens == len(toks)
        counts = pd.Series(toks).value_counts()
        assert g.type_token_ratio == pytest.approx(len(counts) / len(toks), abs=1e-6)
        assert g.top_word_frac == pytest.approx(counts.iloc[0] / len(toks), abs=1e-6)
        bigrams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        if bigrams:
            bc = pd.Series(bigrams).value_counts()
            assert g.top_bigram_frac == pytest.approx(bc.iloc[0] / len(bigrams), abs=1e-6)
        else:
            assert g.top_bigram_frac == 0.0


def test_fuzzy_dedup_survivors_composition(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.dedup import (
        fuzzy_dedup_survivors,
    )

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(10)], "doc_id long, body string"
    )
    # clusters {1,2,3} (chained) and {7,8}; 0,4,5,6,9 untouched singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    kept = {r.doc_id for r in fuzzy_dedup_survivors(docs, pairs).collect()}
    assert kept == {0, 1, 4, 5, 6, 7, 9}


def test_bloom_membership_no_false_negatives_bounded_fp(spark):
    """Every corpus member must be flagged (structural: same hash
    functions on both sides); non-members false-positive at a rate set by
    m/n and k — with n=400, m=65536, k=4 the expected rate is << 1%, so
    a 5% ceiling is a safe determinism-friendly bound. Rerun must agree
    exactly (pure md5 arithmetic, no RNG, no partitioning dependence)."""
    from pyspark.sql import functions as F

    from cicevse2024_tfm_datapipeline_spark.operators.dedup import (
        bloom_bitmap,
        bloom_might_contain,
    )

    corpus = spark.range(400).select(
        F.col("id"), F.concat(F.lit("doc-"), F.col("id")).alias("key")
    )
    members = corpus.limit(100)
    outsiders = spark.range(2000, 4000).select(
        F.col("id"), F.concat(F.lit("doc-"), F.col("id")).alias("key")
    )

    bitmap = bloom_bitmap(corpus, F.col("key"), m_bits=1 << 16, k=4, tag="t")
    flag_members = bloom_might_contain(
        members, bitmap, "id", F.col("key"), m_bits=1 << 16, k=4, tag="t"
    )
    assert flag_members.filter(~F.col("__might_contain")).count() == 0

    flag_out = bloom_might_contain(
        outsiders, bitmap, "id", F.col("key"), m_bits=1 << 16, k=4, tag="t"
    )
    fp1 = flag_out.filter(F.col("__might_contain")).count()
    assert fp1 / 2000 < 0.05, fp1

    fp2 = (
        bloom_might_contain(
            outsiders.repartition(7),
            bitmap,
            "id",
            F.col("key"),
            m_bits=1 << 16,
            k=4,
            tag="t",
        )
        .filter(F.col("__might_contain"))
        .count()
    )
    assert fp1 == fp2
