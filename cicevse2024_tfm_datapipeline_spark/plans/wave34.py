"""Round-4 wave 34: maximum-inner-product search via the norm-
augmentation reduction (with an in-result ranking-equivalence proof),
quantile treatment effects on grouped two-phase ranks, and BLEU-2
scoring of candidate/reference document pairs.

Scale extensions beyond the reference pipeline surface. House rules:
queries broadcast and the candidate side never shuffles (MIPS), group
quantiles come from the grouped two-phase rank (one giant group never
serializes into one task), clipped n-gram matches are exact integer
mins, and the only transcendentals run on identical exact-ratio
operands at the close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.functions.literals import literal_df
from cicevse2024_tfm_datapipeline_spark.operators.scan import grouped_cumsum
from cicevse2024_tfm_datapipeline_spark.operators.similarity import (
    as_double_array,
    dot_expr,
    norm_expr,
)
from cicevse2024_tfm_datapipeline_spark.operators.skew import ensure_min_parallelism
from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# MIPS via norm augmentation
# ---------------------------------------------------------------------------

_MIPS_K = 5
_DOTQ = (
    "list_reduce(list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i]),"
    " (x, y) -> x + y)"
)
_NORM = lambda v: (  # noqa: E731
    f"sqrt(list_reduce(list_transform(range(1, len({v}) + 1),"
    f" i -> {v}[i] * {v}[i]), (x, y) -> x + y))"
)


@register(
    "sim_mips_norm_reduction",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    mx AS (SELECT max({_NORM('v')}) AS m FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               {_DOTQ} AS ip,
               {_DOTQ} / ({_NORM('qv')} * mx.m) AS aug_cos
        FROM e c CROSS JOIN mx, q
        WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY ip DESC, neighbor_id) AS r_ip,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY aug_cos DESC, neighbor_id)
                   AS r_aug
        FROM scored
    )
    SELECT query_id, neighbor_id,
           CAST(r_ip AS BIGINT) AS rank,
           round(ip, 6) AS inner_product,
           CAST(CASE WHEN r_ip = r_aug THEN 1 ELSE 0 END AS BIGINT)
               AS reduction_rank_match
    FROM ranked WHERE r_ip <= {_MIPS_K}
    """,
    doc="Maximum-inner-product search (the retrieval op for dot-product-"
    "trained embeddings) via the norm-augmentation reduction: appending "
    "sqrt(M^2-|x|^2) to each corpus vector (M = max corpus norm) turns "
    "MIPS into cosine ANN — here the augmented cosine simplifies to "
    "ip/(|q|M), and the result CARRIES THE PROOF: each top-k row "
    "reports whether the augmented-cosine rank equals the exact "
    "inner-product rank (must be 1 everywhere, since the reduction is "
    "rank-monotone for a fixed query). Queries broadcast; the corpus "
    "side never shuffles; M is one scalar aggregate. This is how a "
    "dot-product index reuses a cosine-LSH/IVF infrastructure at "
    "100 TB.",
    tags=("similarity", "retrieval"),
)
def sim_mips_norm_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    mx = e.agg(F.max(norm_expr(F.col("v"))).alias("m"))
    # query-side norm precomputed on the 10 broadcast rows, and the dot
    # fold evaluated ONCE per pair (aug_cos derives from the same ip
    # column — HOF folds are CodegenFallback, so Catalyst was evaluating
    # the duplicated fold twice per row). Bit-equal restructure (r11).
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        norm_expr(F.col("v")).alias("qn"),
    )
    c = ensure_min_parallelism(e).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .crossJoin(F.broadcast(mx))
        .withColumn("ip", dot_expr(F.col("qv"), F.col("cv")))
        .select(
            "query_id",
            "neighbor_id",
            "ip",
            (F.col("ip") / (F.col("qn") * F.col("m"))).alias("aug_cos"),
        )
    )
    w_ip = Window.partitionBy("query_id").orderBy(
        F.desc("ip"), F.asc("neighbor_id")
    )
    w_aug = Window.partitionBy("query_id").orderBy(
        F.desc("aug_cos"), F.asc("neighbor_id")
    )
    ranked = scored.select(
        "*",
        F.row_number().over(w_ip).alias("r_ip"),
        F.row_number().over(w_aug).alias("r_aug"),
    )
    return ranked.filter(F.col("r_ip") <= _MIPS_K).select(
        "query_id",
        "neighbor_id",
        F.col("r_ip").cast("long").alias("rank"),
        pround("ip", 6).alias("inner_product"),
        (F.col("r_ip") == F.col("r_aug")).cast("long").alias(
            "reduction_rank_match"
        ),
    )


# ---------------------------------------------------------------------------
# Quantile treatment effects
# ---------------------------------------------------------------------------


@register(
    "a_quantile_treatment_effect",
    oracle="""
    WITH rel AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS treated,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y,
               o_orderkey AS ok
        FROM orders
    ),
    ranked AS (
        SELECT treated, y,
               row_number() OVER (PARTITION BY treated ORDER BY y, ok)
                   AS rn,
               CAST(count(*) OVER (PARTITION BY treated) AS BIGINT) AS ng
        FROM rel
    ),
    qs AS (SELECT * FROM (VALUES (25), (50), (75)) AS v(q100)),
    picks AS (
        SELECT q.q100, r.treated, r.y
        FROM ranked r JOIN qs q
          ON r.rn = CAST(ceil(q.q100 * r.ng / 100.0) AS BIGINT)
    ),
    wide AS (
        SELECT q100,
               CAST(max(CASE WHEN treated = 1 THEN y END) AS BIGINT) AS qt,
               CAST(max(CASE WHEN treated = 0 THEN y END) AS BIGINT) AS qc
        FROM picks GROUP BY 1
    )
    SELECT CAST(q100 AS BIGINT) AS quantile_pct,
           round(qt / 100.0, 6) AS treated_quantile,
           round(qc / 100.0, 6) AS control_quantile,
           round(CAST(qt - qc AS DOUBLE) / 100.0, 6) AS qte
    FROM wide
    """,
    doc="Quantile treatment effects: the treated-minus-control gap at "
    "the 25th/50th/75th percentile of the outcome (order value), "
    "showing WHERE in the distribution the treatment acts — the "
    "complement to the mean-effect ATT. Quantiles are exact ceil(q*n) "
    "order statistics from per-group ranks computed with the grouped "
    "two-phase scan (operators.scan.grouped_cumsum — a giant treatment "
    "group range-partitions across tasks instead of serializing into "
    "one), picked by a 3-row literal rank filter. Everything is exact "
    "integer cents until the final /100 display scale.",
    tags=("stats", "causal", "quantile"),
)
def a_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    rel = t(spark, sf_dir, "orders").select(
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("treated"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("y"),
        F.col("o_orderkey").alias("ok"),
    )
    ranked = grouped_cumsum(
        rel.withColumn("__one", F.lit(1)),
        ["treated"],
        ["y", "ok"],
        ["__one"],
        with_totals=True,
    ).select(
        "treated",
        "y",
        F.col("cum___one").alias("rn"),
        F.col("tot___one").cast("long").alias("ng"),
    )
    qs = literal_df(spark, [(25,), (50,), (75,)], "q100 int")
    picks = ranked.join(
        F.broadcast(qs),
        F.col("rn")
        == F.ceil(F.col("q100") * F.col("ng") / F.lit(100.0)).cast("long"),
    ).select("q100", "treated", "y")
    wide = picks.groupBy("q100").agg(
        F.max(F.when(F.col("treated") == 1, F.col("y"))).cast("long").alias("qt"),
        F.max(F.when(F.col("treated") == 0, F.col("y"))).cast("long").alias("qc"),
    )
    return wide.select(
        F.col("q100").cast("long").alias("quantile_pct"),
        pround(F.col("qt") / F.lit(100.0), 6).alias("treated_quantile"),
        pround(F.col("qc") / F.lit(100.0), 6).alias("control_quantile"),
        pround((F.col("qt") - F.col("qc")).cast("double") / F.lit(100.0), 6).alias(
            "qte"
        ),
    )


# ---------------------------------------------------------------------------
# BLEU-2 over candidate/reference pairs
# ---------------------------------------------------------------------------

_TOKS = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"
_BLEU_MAX_ID = 300


@register(
    "text_bleu2_near_pairs",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, {_TOKS} AS toks FROM documents
        WHERE doc_id < {_BLEU_MAX_ID}
    ),
    idx AS (
        SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id)
                      AS rk
        FROM d
    ),
    pairs AS (
        SELECT a.doc_id AS cand_id, b.doc_id AS ref_id,
               len(a.toks) AS clen, len(b.toks) AS rlen
        FROM idx a JOIN idx b
          ON b.source = a.source AND b.rk = a.rk + 1
        WHERE a.rk % 2 = 1
    ),
    uni AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(toks) AS w FROM d) GROUP BY 1, 2
    ),
    bi AS (
        SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
        FROM (
            SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
            FROM d, unnest(range(1, len(toks))) AS u(i)
        ) GROUP BY 1, 2
    ),
    m1 AS (
        SELECT p.cand_id, CAST(sum(least(ca.c, cb.c)) AS BIGINT) AS hits1
        FROM pairs p
        JOIN uni ca ON ca.doc_id = p.cand_id
        JOIN uni cb ON cb.doc_id = p.ref_id AND cb.w = ca.w
        GROUP BY 1
    ),
    m2 AS (
        SELECT p.cand_id, CAST(sum(least(ca.c, cb.c)) AS BIGINT) AS hits2
        FROM pairs p
        JOIN bi ca ON ca.doc_id = p.cand_id
        JOIN bi cb ON cb.doc_id = p.ref_id AND cb.g = ca.g
        GROUP BY 1
    ),
    scored AS (
        SELECT p.cand_id, p.ref_id, p.clen, p.rlen,
               coalesce(m1.hits1, 0) AS h1,
               coalesce(m2.hits2, 0) AS h2
        FROM pairs p
        LEFT JOIN m1 ON m1.cand_id = p.cand_id
        LEFT JOIN m2 ON m2.cand_id = p.cand_id
        WHERE p.clen > 1
    )
    SELECT cand_id, ref_id, CAST(clen AS BIGINT) AS cand_len,
           round(CAST(h1 AS DOUBLE) / clen, 6) AS p1,
           round(CAST(h2 AS DOUBLE) / (clen - 1), 6) AS p2,
           round(CASE WHEN h1 > 0 AND h2 > 0 THEN
                    (CASE WHEN clen >= rlen THEN 1.0
                          ELSE exp(1.0 - CAST(rlen AS DOUBLE) / clen) END)
                    * exp(0.5 * (ln(CAST(h1 AS DOUBLE) / clen)
                                 + ln(CAST(h2 AS DOUBLE) / (clen - 1))))
                 ELSE 0.0 END, 6) AS bleu2
    FROM scored
    """,
    doc="BLEU-2 scoring of (candidate, reference) document pairs "
    "(adjacent same-source docs on a bounded audit slice): clipped "
    "unigram/bigram precision from exact integer min(count_cand, "
    "count_ref) sums over n-gram equi-joins, the brevity penalty "
    "exp(1 - ref/cand) for short candidates, and the geometric mean of "
    "the two precisions. The generation-eval metric a synthetic-data "
    "pipeline runs to grade rewrites/paraphrases against references — "
    "here exercised corpus-side with the n-gram count frames shared "
    "across all pairs (one groupBy each; the pair join is an id "
    "equi-join). Transcendentals run only at the close on exact "
    "integer ratios.",
    tags=("text", "eval", "generation"),
)
def text_bleu2_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr

    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _BLEU_MAX_ID)
        .select("doc_id", "source", tokens_expr("text").alias("toks"))
    )
    # pair rank 2k-1 with rank 2k inside each source (the audit slice is
    # bounded, so the per-source window frame is too)
    idx = d.withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("source").orderBy("doc_id")),
    )
    pairs = (
        idx.alias("a")
        .join(
            idx.alias("b"),
            (F.col("b.source") == F.col("a.source"))
            & (F.col("b.rk") == F.col("a.rk") + 1),
        )
        .filter(F.col("a.rk") % 2 == 1)
        .select(
            F.col("a.doc_id").alias("cand_id"),
            F.col("b.doc_id").alias("ref_id"),
            F.size("a.toks").alias("clen"),
            F.size("b.toks").alias("rlen"),
        )
    )
    uni = (
        d.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    bi = (
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                    " (x, i) -> concat(x, ' ', toks[i + 1]))"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ca1 = uni.select(F.col("doc_id").alias("cand_id"), "w", F.col("c").alias("cc"))
    cb1 = uni.select(F.col("doc_id").alias("ref_id"), "w", F.col("c").alias("rc"))
    m1 = (
        pairs.join(ca1, "cand_id")
        .join(cb1, ["ref_id", "w"])
        .groupBy("cand_id")
        .agg(F.sum(F.least("cc", "rc")).cast("long").alias("h1"))
    )
    ca2 = bi.select(F.col("doc_id").alias("cand_id"), "g", F.col("c").alias("cc"))
    cb2 = bi.select(F.col("doc_id").alias("ref_id"), "g", F.col("c").alias("rc"))
    m2 = (
        pairs.join(ca2, "cand_id")
        .join(cb2, ["ref_id", "g"])
        .groupBy("cand_id")
        .agg(F.sum(F.least("cc", "rc")).cast("long").alias("h2"))
    )
    scored = (
        pairs.join(m1, "cand_id", "left")
        .join(m2, "cand_id", "left")
        .filter(F.col("clen") > 1)
        .select(
            "cand_id",
            "ref_id",
            "clen",
            "rlen",
            F.coalesce(F.col("h1"), F.lit(0)).alias("h1"),
            F.coalesce(F.col("h2"), F.lit(0)).alias("h2"),
        )
    )
    bp = F.when(F.col("clen") >= F.col("rlen"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - F.col("rlen").cast("double") / F.col("clen"))
    )
    p1 = F.col("h1").cast("double") / F.col("clen")
    p2 = F.col("h2").cast("double") / (F.col("clen") - 1)
    bleu = F.when(
        (F.col("h1") > 0) & (F.col("h2") > 0),
        bp * F.exp(F.lit(0.5) * (F.log(p1) + F.log(p2))),
    ).otherwise(F.lit(0.0))
    return scored.select(
        "cand_id",
        "ref_id",
        F.col("clen").cast("long").alias("cand_len"),
        pround(p1, 6).alias("p1"),
        pround(p2, 6).alias("p2"),
        pround(bleu, 6).alias("bleu2"),
    )
