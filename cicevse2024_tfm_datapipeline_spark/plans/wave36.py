"""Round-4 wave 36: instrumental-variable (Wald) treatment-effect
estimation, k-core decomposition of the LSH dedup graph (two unrolled
peeling rounds), and the dedup threshold operating curve.

Scale extensions beyond the reference pipeline surface. House rules: IV
moments are ONE exact integer aggregate; k-core peeling is join/aggregate
per round on the edge frame (edge-bounded, pinned so the LSH banding
subtree executes once); the threshold sweep's Jaccard comparisons are
pure integer cross-multiplications over a bounded audit sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.dedup import lsh_candidate_pairs
from cicevse2024_tfm_datapipeline_spark.operators.graph import undirect
from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr
from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.extensions import (
    _PR_EDGES,
    _band_sql,
    _sig_sql,
    BANDS,
    NUM_HASHES,
)
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Instrumental-variable Wald estimator
# ---------------------------------------------------------------------------


@register(
    "a_iv_wald_estimator",
    oracle="""
    WITH rel AS (
        SELECT c.c_nationkey % 2 AS z,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS d,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    mom AS (
        SELECT CAST(sum(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN z = 1 THEN d ELSE 0 END) AS BIGINT) AS d1,
               CAST(sum(CASE WHEN z = 0 THEN d ELSE 0 END) AS BIGINT) AS d0,
               CAST(sum(CASE WHEN z = 1 THEN y ELSE 0 END) AS BIGINT) AS y1,
               CAST(sum(CASE WHEN z = 0 THEN y ELSE 0 END) AS BIGINT) AS y0
        FROM rel
    )
    SELECT n1 AS n_encouraged, n0 AS n_not_encouraged,
           round(CAST(d1 AS DOUBLE) / n1 - CAST(d0 AS DOUBLE) / n0, 6)
               AS first_stage,
           round((CAST(y1 AS DOUBLE) / n1 - CAST(y0 AS DOUBLE) / n0)
                 / 100.0, 6) AS itt_effect,
           round((CAST(y1 AS DOUBLE) / n1 - CAST(y0 AS DOUBLE) / n0)
                 / (CAST(d1 AS DOUBLE) / n1 - CAST(d0 AS DOUBLE) / n0)
                 / 100.0, 6) AS wald_late
    FROM mom
    """,
    doc="Instrumental-variable treatment-effect estimation (the Wald / "
    "two-group IV): instrument z = customer-nation parity (an "
    "'encouragement' assignment), endogenous treatment d = urgent "
    "priority, outcome y = order value. Reports the first stage "
    "E[d|z=1]-E[d|z=0] (instrument strength — read it BEFORE trusting "
    "the IV), the intent-to-treat outcome difference, and the Wald "
    "LATE = ITT / first-stage. Six exact integer sums from ONE "
    "map-side-combined scan; all ratios close on a 1-row frame. "
    "Completes the causal battery (diff-in-diff, CUPED, ATT "
    "subclassification, QTE) with the endogeneity-robust estimator.",
    tags=("stats", "causal"),
)
def a_iv_wald_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    rel = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        (F.col("c_nationkey") % 2).alias("z"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("d"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    mom = rel.agg(
        F.sum((F.col("z") == 1).cast("int")).cast("long").alias("n1"),
        F.sum((F.col("z") == 0).cast("int")).cast("long").alias("n0"),
        F.sum(F.when(F.col("z") == 1, F.col("d")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when(F.col("z") == 0, F.col("d")).otherwise(0))
        .cast("long")
        .alias("d0"),
        F.sum(F.when(F.col("z") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("y1"),
        F.sum(F.when(F.col("z") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("y0"),
    )
    fs = F.col("d1").cast("double") / F.col("n1") - F.col("d0").cast("double") / F.col(
        "n0"
    )
    itt = F.col("y1").cast("double") / F.col("n1") - F.col("y0").cast(
        "double"
    ) / F.col("n0")
    return mom.select(
        F.col("n1").alias("n_encouraged"),
        F.col("n0").alias("n_not_encouraged"),
        pround(fs, 6).alias("first_stage"),
        pround(itt / F.lit(100.0), 6).alias("itt_effect"),
        pround(itt / fs / F.lit(100.0), 6).alias("wald_late"),
    )


# ---------------------------------------------------------------------------
# k-core decomposition (two unrolled peeling rounds)
# ---------------------------------------------------------------------------

_KCORE_K = 2


def _peel_sql(r: int, k: int) -> str:
    prev = f"sym{r - 1}" if r > 1 else "sym0"
    return f"""alive{r} AS (
        SELECT src AS node FROM {prev} GROUP BY 1 HAVING count(*) >= {k}
    ),
    sym{r} AS (
        SELECT e.src, e.dst FROM {prev} e
        JOIN alive{r} a ON a.node = e.src
        JOIN alive{r} b ON b.node = e.dst
    )"""


@register(
    "g_kcore_two_rounds",
    oracle=f"""
    WITH {_sig_sql()},
    bands AS ({_band_sql()}),
    {_PR_EDGES},
    sym0 AS (SELECT src, dst FROM edges),  -- _PR_EDGES is already symmetric
    {_peel_sql(1, _KCORE_K)},
    {_peel_sql(2, _KCORE_K)},
    stats AS (
        SELECT 1 AS round,
               (SELECT CAST(count(*) AS BIGINT) FROM alive1) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM sym1) // 2 AS n_edges
        UNION ALL
        SELECT 2 AS round,
               (SELECT CAST(count(*) AS BIGINT) FROM alive2) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM sym2) // 2 AS n_edges
    )
    SELECT CAST(round AS BIGINT) AS round, n_nodes, CAST(n_edges AS BIGINT)
               AS n_edges
    FROM stats
    """,
    doc="k-core decomposition (k=2) of the MinHash-LSH dedup graph with "
    "two unrolled peeling rounds: round r drops every node whose degree "
    "fell below k and the edges touching it; the reported per-round "
    "(nodes, edges) converge when two consecutive rounds agree — the "
    "bounded-unrolled-fixpoint pattern this engine uses for PageRank "
    "and BFS, applied to the density skeleton dedup reviewers read "
    "(the 2-core = documents in genuinely clustered duplicate "
    "neighborhoods, not just pendant pairs). Each round is one "
    "degree aggregate + two semi-join-shaped equi-joins on the "
    "edge frame, which is pinned so the LSH banding subtree executes "
    "once; cost is edge-bounded at any corpus size.",
    tags=("graph", "dedup"),
)
def g_kcore_two_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs, "text", "doc_id", NUM_HASHES, BANDS, 3)
    sym = undirect(pairs).localCheckpoint(eager=False)

    def peel(edges: DataFrame):
        alive = (
            edges.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select("node")
        )
        kept = (
            edges.join(alive.withColumnRenamed("node", "src"), "src")
            .join(alive.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
        )
        return alive, kept

    alive1, sym1 = peel(sym)
    sym1 = sym1.localCheckpoint(eager=False)
    alive2, sym2 = peel(sym1)

    def stats(alive: DataFrame, edges: DataFrame, rnd: int) -> DataFrame:
        na = alive.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        ne = edges.agg(
            F.floor(F.count(F.lit(1)) / 2).cast("long").alias("n_edges")
        )
        return na.crossJoin(ne).select(
            F.lit(rnd).cast("long").alias("round"), "n_nodes", "n_edges"
        )

    return stats(alive1, sym1, 1).unionAll(stats(alive2, sym2, 2))


# ---------------------------------------------------------------------------
# Dedup threshold operating curve
# ---------------------------------------------------------------------------

_CURVE_N = 200
_TAUS = (5, 6, 7, 8, 9)  # tenths


@register(
    "text_dedup_threshold_curve",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS toks
        FROM documents WHERE doc_id < {_CURVE_N}
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.toks, b.toks)) AS inter,
               len(a.toks) + len(b.toks)
                   - len(list_intersect(a.toks, b.toks)) AS uni
        FROM d a JOIN d b ON a.doc_id < b.doc_id
    ),
    taus AS (SELECT * FROM (VALUES {", ".join(f"({v})" for v in _TAUS)})
             AS v(tau10)),
    hits AS (
        SELECT t.tau10, p.id_b
        FROM pairs p JOIN taus t ON 10 * p.inter >= t.tau10 * p.uni
    ),
    agg AS (
        SELECT tau10, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(count(DISTINCT id_b) AS BIGINT) AS n_docs_dropped
        FROM hits GROUP BY 1
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d)
    SELECT round(t.tau10 / 10.0, 6) AS tau,
           coalesce(a.n_pairs, 0) AS n_pairs,
           coalesce(a.n_docs_dropped, 0) AS n_docs_dropped,
           round(CAST(coalesce(a.n_docs_dropped, 0) AS DOUBLE) / nd.n_docs, 6)
               AS drop_fraction
    FROM taus t LEFT JOIN agg a ON a.tau10 = t.tau10 CROSS JOIN nd
    """,
    doc="Dedup threshold operating curve on a bounded audit sample: for "
    "each Jaccard threshold tau in 0.5..0.9, how many near-dup pairs "
    "fire and what fraction of documents the keep-lowest-id survivor "
    "rule would drop — the sweep a dedup owner reads to CHOOSE tau "
    "before running the corpus-wide LSH job (too low = over-deletion, "
    "too high = residual duplication). Jaccard-vs-tau is the integer "
    "cross-multiplication 10*|A∩B| >= tau10*|A∪B| (no float "
    "thresholds), the threshold table is a 5-row literal joined by "
    "inequality against the pair frame, and the quadratic pass is "
    "confined to the fixed-size sample — constant audit cost at any "
    "corpus scale.",
    tags=("dedup", "text", "eval"),
)
def text_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.functions.literals import literal_df

    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _CURVE_N)
        .select("doc_id", F.array_distinct(tokens_expr("text")).alias("toks"))
    )
    a = d.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb")))
    pairs = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_b",
            inter.alias("inter"),
            (F.size("ta") + F.size("tb") - inter).alias("uni"),
        )
    )
    taus = literal_df(spark, [(v,) for v in _TAUS], "tau10 int")
    hits = pairs.join(
        F.broadcast(taus), F.lit(10) * F.col("inter") >= F.col("tau10") * F.col("uni")
    )
    agg = hits.groupBy("tau10").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("id_b").cast("long").alias("n_docs_dropped"),
    )
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        taus.join(agg, "tau10", "left")
        .crossJoin(F.broadcast(nd))
        .select(
            pround(F.col("tau10") / F.lit(10.0), 6).alias("tau"),
            F.coalesce(F.col("n_pairs"), F.lit(0).cast("long")).alias("n_pairs"),
            F.coalesce(F.col("n_docs_dropped"), F.lit(0).cast("long")).alias(
                "n_docs_dropped"
            ),
            pround(
                F.coalesce(F.col("n_docs_dropped"), F.lit(0)).cast("double")
                / F.col("n_docs"),
                6,
            ).alias("drop_fraction"),
        )
    )
