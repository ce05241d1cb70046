"""Graph operators: PageRank invariants and exact triangle counts."""

from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.graph import (
    pagerank_fixed,
    triangle_count,
    undirect,
)


def _edges(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return undirect(df)


def test_pagerank_mass_conserved_and_hub_wins(spark):
    # star: 0 is the hub of 1..4, plus a detached edge 10-11
    e = _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4), (10, 11)])
    pr = {r["node"]: r["rank"] for r in pagerank_fixed(e, iters=5).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9  # symmetric graph: mass conserved
    assert pr[0] > max(pr[i] for i in (1, 2, 3, 4))  # hub outranks leaves
    assert abs(pr[1] - pr[3]) < 1e-12  # leaves symmetric
    assert abs(pr[10] - pr[11]) < 1e-12


def test_pagerank_fixed_is_deterministic(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    a = sorted((r["node"], r["rank"]) for r in pagerank_fixed(e, 3).collect())
    b = sorted((r["node"], r["rank"]) for r in pagerank_fixed(e.repartition(5), 3).collect())
    assert [n for n, _ in a] == [n for n, _ in b]
    for (_, x), (_, y) in zip(a, b):
        assert abs(x - y) < 1e-12


def test_triangle_count_exact(spark):
    # K4 has 4 triangles; the pendant edge adds none
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = _edges(spark, k4 + [(3, 9)])
    assert triangle_count(e).first()["n_triangles"] == 4

    # triangle-free path
    e2 = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    assert triangle_count(e2).first()["n_triangles"] == 0
