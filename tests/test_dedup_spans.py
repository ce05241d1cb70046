"""duplicate_spans (substring dedup) — hand-checked span semantics.

Ground truth computed by hand on a tiny corpus: spans are maximal merged
ranges of corpus-duplicated k-grams, 1-based inclusive token positions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.dedup import duplicate_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_disjoint_duplicate_spans_merge_and_positions(spark):
    # k=3: docs 1 and 2 share "a b c d" (two overlapping 3-grams at doc-1
    # positions 1-2 -> merged span [1, 4]); doc 2 carries it at [3, 6].
    rows = [
        (1, "a b c d x y z"),
        (2, "p q a b c d r"),
        (3, "m n o m n o m n o"),  # self-repeat: "m n o ..." 3-grams
    ]
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(_docs(spark, rows), k=3).collect()
    }
    assert (1, 1, 4, 4) in spans
    assert (2, 3, 6, 4) in spans
    # doc 3: "m n o m" etc. — positions 1..7 all start duplicated 3-grams
    # ("m n o" x3 internally, plus shifted repeats), one merged span 1..9
    assert (3, 1, 9, 9) in spans
    assert len([s for s in spans if s[0] == 1]) == 1
    assert len([s for s in spans if s[0] == 2]) == 1


def test_gap_splits_spans(spark):
    # duplicated 2-grams at positions 1 and 9 with a unique middle — two
    # separate spans, not one
    rows = [
        (1, "a b u1 u2 u3 u4 u5 u6 a b"),
        (2, "a b"),
    ]
    spans = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicate_spans(_docs(spark, rows), k=2).collect()
        if r["doc_id"] == 1
    )
    assert spans == [(1, 2), (9, 10)]


def test_no_duplicates_no_spans(spark):
    rows = [(1, "q w e r t y"), (2, "z x c v b n")]
    assert duplicate_spans(_docs(spark, rows), k=3).count() == 0


def test_min_occurrences_threshold(spark):
    rows = [(1, "a b c"), (2, "a b c"), (3, "a b c")]
    # with min_occurrences=4 the thrice-repeated 3-gram is below threshold
    assert duplicate_spans(_docs(spark, rows), k=3, min_occurrences=4).count() == 0
    got = duplicate_spans(_docs(spark, rows), k=3, min_occurrences=3)
    assert got.count() == 3
    assert got.agg(F.min("span_tokens"), F.max("span_tokens")).first() == (3, 3)
