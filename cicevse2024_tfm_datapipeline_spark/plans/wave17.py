"""Round-3 wave 17: Adamic-Adar link prediction on the dedup graph,
an int8 quantization recall audit for embedding search, and a
difference-in-differences rate estimate.

Scale extensions beyond the reference pipeline surface (no reference
twin; the reference is a single-machine pandas/sklearn TFM pipeline).
Determinism contracts follow the house rules (plans/tpch_suite.py
header): Adamic-Adar weights and quantized codes round to exact
BIGINT ticks before any aggregation, rankings carry id tiebreaks, and
the DiD cells are exact integer counts with closing divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import (
    POWER_BASE_SQL,
    pround,
    power_view,
    t,
)
from cicevse2024_tfm_datapipeline_spark.plans.extensions import (
    BANDS,
    NUM_HASHES,
    _band_sql,
    _PR_EDGES,
    _sig_sql,
)
from cicevse2024_tfm_datapipeline_spark.plans.registry import register
from cicevse2024_tfm_datapipeline_spark.plans.wave5 import _US


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction over the LSH candidate graph
# ---------------------------------------------------------------------------


@register(
    "g_adamic_adar",
    oracle=f"""
    WITH {_sig_sql()},
    bands AS ({_band_sql()}),
    {_PR_EDGES},
    deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
    wedge AS (
        SELECT e1.dst AS v, e2.dst AS w,
               CAST(floor(1000000000.0 / ln(d.deg) + 0.5) AS BIGINT) AS tick
        FROM edges e1
        JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
        JOIN deg d ON d.node = e1.src
    ),
    scored AS (
        SELECT v, w, CAST(sum(tick) AS BIGINT) AS score_ticks,
               CAST(count(*) AS BIGINT) AS n_common
        FROM wedge GROUP BY 1, 2
    ),
    novel AS (
        SELECT s.* FROM scored s
        LEFT JOIN pairs p ON p.doc_a = s.v AND p.doc_b = s.w
        WHERE p.doc_a IS NULL
    )
    SELECT v AS doc_a, w AS doc_b, n_common,
           round(score_ticks / 1000000000.0, 6) AS adamic_adar
    FROM novel
    ORDER BY score_ticks DESC, v ASC, w ASC LIMIT 20
    """,
    doc="Adamic-Adar link prediction on the MinHash-LSH candidate "
    "graph: for every NON-adjacent 2-hop pair, the sum over common "
    "neighbors u of 1/ln(deg(u)) — rare shared neighbors are strong "
    "evidence, hub neighbors near-worthless; the classic 'which links "
    "are missing' score that flags near-dup pairs LSH banding "
    "happened to miss (its false-negative repair pass). Wedge "
    "enumeration reuses the clustering-coefficient shape (sum(deg^2)-"
    "bounded, band-bucket-capped degrees); each wedge center's weight "
    "rounds to an exact 1e-9 BIGINT tick BEFORE the per-pair sum, so "
    "scores are order-free integers and the (score, v, w) top-20 cut "
    "is engine-independent. The novelty filter is one anti-join "
    "against the existing edge list.",
    tags=("graph", "link-prediction", "dedup"),
)
def g_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
    )
    from cicevse2024_tfm_datapipeline_spark.operators.graph import undirect
    from cicevse2024_tfm_datapipeline_spark.operators.topk import top_k

    docs = t(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(
        docs, "text", "doc_id", NUM_HASHES, BANDS, 3
    ).localCheckpoint(eager=False)
    # r12 (guide §2.4, the pagerank loop-invariant-fold pattern): edges
    # has three consumers (deg + both wedge sides) — unpinned, the
    # union+distinct over the pair pin re-executed per branch. The
    # per-center tick (a pure function of the center's degree) is also
    # folded into the e1 side BEFORE the wedge self-join: the identical
    # rows and per-row ln(deg) operands by inner-equi-join associativity,
    # but the node-sized deg join now runs on the EDGE-sized frame
    # instead of the wedge-sized (sum deg^2) one.
    edges = undirect(pairs).localCheckpoint(eager=False)
    # deg >= 2 BEFORE the tick projection: a wedge center has two
    # distinct neighbors by construction (v < w), so degree-1 nodes can
    # never contribute — and their ln(1) = 0 tick division must not
    # evaluate (ANSI divide-by-zero; the old post-wedge join only ever
    # saw center nodes)
    degt = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= 2)
        .select(
            "node",
            F.floor(F.lit(1000000000.0) / F.log(F.col("deg")) + F.lit(0.5))
            .cast("long")
            .alias("tick"),
        )
    )
    e1 = edges.select(F.col("src").alias("node"), F.col("dst").alias("v"))
    e2 = edges.select(F.col("src").alias("node"), F.col("dst").alias("w"))
    wedge = (
        e1.join(degt, "node")
        .join(e2, "node")
        .filter(F.col("v") < F.col("w"))
        .select("v", "w", "tick")
    )
    scored = wedge.groupBy("v", "w").agg(
        F.sum("tick").cast("long").alias("score_ticks"),
        F.count(F.lit(1)).cast("long").alias("n_common"),
    )
    novel = scored.join(
        pairs,
        (F.col("v") == F.col("doc_a")) & (F.col("w") == F.col("doc_b")),
        "left_anti",
    )
    top = top_k(
        novel, [F.desc("score_ticks"), F.asc("v"), F.asc("w")], 20
    )
    return top.select(
        F.col("v").alias("doc_a"),
        F.col("w").alias("doc_b"),
        "n_common",
        pround(F.col("score_ticks") / F.lit(1000000000.0), 6).alias(
            "adamic_adar"
        ),
    )


# ---------------------------------------------------------------------------
# int8 quantization recall audit for embedding search
# ---------------------------------------------------------------------------


@register(
    "sim_quantization_recall",
    oracle="""
    WITH e AS (
        SELECT vec_id,
               unnest(range(0, len(embedding))) AS d,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000 + 0.5)
                    AS BIGINT) AS tick
        FROM embeddings
    ),
    scale AS (SELECT d, max(abs(tick)) AS s FROM e GROUP BY 1),
    q AS (
        SELECT e.vec_id, e.d, e.tick,
               CAST(floor(e.tick * 127.0 / scale.s + 0.5) AS BIGINT) AS code
        FROM e JOIN scale USING (d)
    ),
    pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
               CAST(sum(a.tick * b.tick) AS BIGINT) AS dot_full,
               CAST(sum(a.code * b.code) AS BIGINT) AS dot_q
        FROM q a JOIN q b ON a.d = b.d
        WHERE a.vec_id < 10 AND b.vec_id >= 10
        GROUP BY 1, 2
    ),
    rf AS (
        SELECT query_id, cand_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot_full DESC, cand_id ASC) AS rk
        FROM pairs
    ),
    rq AS (
        SELECT query_id, cand_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot_q DESC, cand_id ASC) AS rk
        FROM pairs
    )
    SELECT f.query_id,
           CAST(count(q.cand_id) AS BIGINT) AS n_overlap,
           round(count(q.cand_id) / 10.0, 6) AS recall_at_10
    FROM rf f
    LEFT JOIN rq q ON q.query_id = f.query_id AND q.cand_id = f.cand_id
                   AND q.rk <= 10
    WHERE f.rk <= 10
    GROUP BY f.query_id
    """,
    doc="Quantization recall audit: symmetric per-dimension int8 "
    "quantization (code = round(tick * 127 / max|tick|_d)) of the "
    "embedding corpus, then recall@10 of quantized dot-product top-10 "
    "vs full-precision top-10 for the first 10 vectors as queries — "
    "the measurement that decides whether a 4x-smaller scalar-"
    "quantized index is safe to ship, run entirely as relational "
    "algebra. 'Full precision' is itself exact (1e-4 BIGINT ticks), "
    "codes derive from one floor of an identical double expression, "
    "and BOTH rankings are integer dot products with id tiebreaks — "
    "every rank, overlap count, and recall is engine-independent. "
    "Per-dim scales are a 64-row broadcast; the scoring join is "
    "dimension-keyed (at production scale the same audit runs on the "
    "LSH/IVF candidate subset instead of all pairs).",
    tags=("similarity", "quantization", "recall"),
)
def sim_quantization_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "ev")
    ).select(
        "vec_id",
        "d",
        F.floor(F.col("ev").cast("double") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("tick"),
    )
    e = e.localCheckpoint(eager=False)
    scale = e.groupBy("d").agg(F.max(F.abs(F.col("tick"))).alias("s"))
    q = e.join(F.broadcast(scale), "d").select(
        "vec_id",
        "d",
        "tick",
        F.floor(F.col("tick") * F.lit(127.0) / F.col("s") + F.lit(0.5))
        .cast("long")
        .alias("code"),
    )
    q = q.localCheckpoint(eager=False)
    a = q.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        "d",
        F.col("tick").alias("ta"),
        F.col("code").alias("ca"),
    )
    b = q.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cand_id"),
        "d",
        F.col("tick").alias("tb"),
        F.col("code").alias("cb"),
    )
    pairs = (
        F.broadcast(a)
        .join(b, "d")
        .groupBy("query_id", "cand_id")
        .agg(
            F.sum(F.col("ta") * F.col("tb")).cast("long").alias("dot_full"),
            F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot_q"),
        )
        .localCheckpoint(eager=False)
    )
    wf = W.partitionBy("query_id").orderBy(
        F.desc("dot_full"), F.asc("cand_id")
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("cand_id"))
    rf = (
        pairs.withColumn("rk", F.row_number().over(wf))
        .filter(F.col("rk") <= 10)
        .select("query_id", "cand_id")
    )
    rq = (
        pairs.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= 10)
        .select(
            F.col("query_id").alias("q_query"),
            F.col("cand_id").alias("q_cand"),
        )
    )
    joined = rf.join(
        rq,
        (F.col("query_id") == F.col("q_query"))
        & (F.col("cand_id") == F.col("q_cand")),
        "left",
    ).select("query_id", "q_cand")
    return joined.groupBy("query_id").agg(
        F.count("q_cand").cast("long").alias("n_overlap"),
        pround(F.count("q_cand") / F.lit(10.0), 6).alias("recall_at_10"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences rate estimate
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


@register(
    "a_difference_in_differences",
    oracle=f"""
    WITH base AS ({POWER_BASE_SQL}),
    b AS (
        SELECT epoch_us(ts) // {_DAY_US} AS day, state,
               CASE WHEN label = 'attack' THEN 1 ELSE 0 END AS y
        FROM base
    ),
    span AS (
        SELECT (min(day) + max(day)) // 2 AS mid FROM b
    ),
    cells AS (
        SELECT CASE WHEN state = 'charging' THEN 1 ELSE 0 END AS treated,
               CASE WHEN day > mid THEN 1 ELSE 0 END AS post,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS k
        FROM b CROSS JOIN span
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT
            max(CASE WHEN treated = 1 AND post = 0 THEN k * 1.0 / n END) AS t_pre,
            max(CASE WHEN treated = 1 AND post = 1 THEN k * 1.0 / n END) AS t_post,
            max(CASE WHEN treated = 0 AND post = 0 THEN k * 1.0 / n END) AS c_pre,
            max(CASE WHEN treated = 0 AND post = 1 THEN k * 1.0 / n END) AS c_post,
            CAST(sum(n) AS BIGINT) AS n_rows
        FROM cells
    )
    SELECT n_rows,
           round(t_pre, 6) AS treated_pre, round(t_post, 6) AS treated_post,
           round(c_pre, 6) AS control_pre, round(c_post, 6) AS control_post,
           round((t_post - t_pre) - (c_post - c_pre), 6) AS did
    FROM wide
    """,
    doc="Difference-in-differences: the attack-rate change across the "
    "series midpoint for the charging (treated) group MINUS the same "
    "change for the idle (control) group — the panel estimator that "
    "removes both group-level baselines and period-level shocks, and "
    "the honest way to read a before/after comparison when a "
    "contemporaneous control exists (complements the Simpson screen: "
    "that one flags aggregation reversal, this one nets out secular "
    "trend). The period boundary is integer day arithmetic from "
    "broadcast min/max scalars, the four cells are exact integer "
    "counts from ONE grouped aggregation, and the estimate is "
    "arithmetic over four identical divisions.",
    tags=("A", "causal", "did"),
)
def a_difference_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = power_view(spark, sf_dir).select(
        (F.expr(_US) / F.lit(_DAY_US)).cast("long").alias("day"),
        "state",
        F.when(F.col("label") == "attack", 1).otherwise(0).alias("y"),
    )
    span = b.agg(
        ((F.min("day") + F.max("day")) / F.lit(2)).cast("long").alias("mid")
    )
    cells = (
        b.crossJoin(F.broadcast(span))
        .select(
            F.when(F.col("state") == "charging", 1).otherwise(0).alias("treated"),
            F.when(F.col("day") > F.col("mid"), 1).otherwise(0).alias("post"),
            "y",
        )
        .groupBy("treated", "post")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("k"),
        )
    )
    rate = F.col("k") * F.lit(1.0) / F.col("n")
    wide = cells.agg(
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 0), rate)).alias(
            "t_pre"
        ),
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 1), rate)).alias(
            "t_post"
        ),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 0), rate)).alias(
            "c_pre"
        ),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 1), rate)).alias(
            "c_post"
        ),
        F.sum("n").cast("long").alias("n_rows"),
    )
    return wide.select(
        "n_rows",
        pround(F.col("t_pre"), 6).alias("treated_pre"),
        pround(F.col("t_post"), 6).alias("treated_post"),
        pround(F.col("c_pre"), 6).alias("control_pre"),
        pround(F.col("c_post"), 6).alias("control_post"),
        pround(
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre")),
            6,
        ).alias("did"),
    )
