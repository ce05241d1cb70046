"""Graph analytics over edge frames (companions to
operators/dedup.connected_components).

Edges live as (src, dst) DataFrames — here typically the LSH
candidate-pair graph, whose size is bounded by near-duplicate density
(edge-bounded, never corpus²). Both operators are join/aggregate
compositions with no driver-side iteration state beyond a fixed plan
depth, so they inherit Spark's shuffle/broadcast machinery and stay
oracle-checkable:

- ``pagerank_fixed``: K power-iteration steps UNROLLED into the plan —
  deterministic arithmetic (no convergence probe), which is exactly what
  makes it SQL-twin-checkable; K=O(10) covers ranking use-cases on
  short-diameter dedup graphs. Per step: one join edge⋈rank on src + one
  groupBy dst — the standard distributed PageRank shape.
- ``triangle_count``: ordered 3-clique join (a<b<c), the motif-counting
  baseline; candidate fan-out is bounded by per-node degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["undirect", "pagerank_fixed", "triangle_count"]


def undirect(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """(a, b) pairs → symmetric (src, dst) edge frame, self-loops and
    duplicates removed."""
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    return fwd.unionByName(rev).filter(F.col("src") != F.col("dst")).distinct()


def pagerank_fixed(
    edges: DataFrame, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """PageRank with a FIXED number of unrolled power iterations over a
    symmetric edge frame: rank_{k+1}(v) = (1-d)/N + d·Σ_{u→v} rank_k(u)/deg(u).
    Returns (node, rank). N and degrees come from the edge frame; isolated
    nodes are absent by construction (dedup graphs carry no singletons)."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_total = nodes.agg(F.count(F.lit(1)).alias("n"))
    rank = nodes.crossJoin(F.broadcast(n_total)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    d = float(damping)
    for _ in range(iters):
        contrib = (
            edges.join(rank.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        rank = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_total))
            .select(
                "node",
                (
                    F.lit(1.0 - d) / F.col("n")
                    + F.lit(d) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return rank


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over a symmetric edge frame: ordered
    3-clique join a<b<c (each triangle counted once). One row out."""
    ab = edges.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    bc = ab.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = ab.select(F.col("a").alias("a2"), F.col("b").alias("c2"))
    tri = (
        ab.join(bc, "b")
        .join(ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .filter(F.col("b") < F.col("c"))
    )
    return tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
