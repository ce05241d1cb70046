"""Round-4 wave 40: association rules (confidence / lift / conviction)
over order baskets, n-gram novelty of eval documents against the train
split (memorization audit), and hash-holdout assignment stability across
salt changes.

Scale extensions beyond the reference pipeline surface. House rules:
rule statistics are exact integer supports joined on a vocabulary-
bounded frame; novelty is an exact distinct-shingle anti-count per eval
doc against the broadcast-joined train vocabulary; holdout assignment is
engine-portable md5 arithmetic, and the migration matrix is one exact
integer aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Association rules
# ---------------------------------------------------------------------------

_RULE_MINSUP = 0.005
_RULE_MINCONF = 0.17


@register(
    "a_association_rules",
    oracle=f"""
    WITH b AS (
        SELECT DISTINCT l.l_orderkey AS oid, p.p_brand AS item
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (
        SELECT CAST(count(DISTINCT oid) AS BIGINT) AS nb,
               greatest(CAST(2 AS BIGINT),
                        CAST(floor(count(DISTINCT oid) * {_RULE_MINSUP})
                             AS BIGINT)) AS ms
        FROM b
    ),
    items AS (
        SELECT item, CAST(count(*) AS BIGINT) AS s1 FROM b GROUP BY 1
    ),
    pairs AS (
        SELECT x.item AS a, y.item AS c, CAST(count(*) AS BIGINT) AS s2
        FROM b x JOIN b y ON y.oid = x.oid AND x.item <> y.item
        GROUP BY 1, 2
    ),
    rules AS (
        SELECT p.a AS antecedent, p.c AS consequent, p.s2,
               ia.s1 AS sa, ic.s1 AS sc, n.nb
        FROM pairs p
        JOIN items ia ON ia.item = p.a
        JOIN items ic ON ic.item = p.c
        CROSS JOIN n
        WHERE p.s2 >= n.ms
          AND 100 * p.s2 >= CAST({int(_RULE_MINCONF * 100)} AS BIGINT) * ia.s1
    )
    SELECT antecedent, consequent, s2 AS support_count,
           round(CAST(s2 AS DOUBLE) / nb, 6) AS support,
           round(CAST(s2 AS DOUBLE) / sa, 6) AS confidence,
           round((CAST(s2 AS DOUBLE) / sa) / (CAST(sc AS DOUBLE) / nb), 6)
               AS lift,
           round(CASE WHEN sa - s2 > 0
                      THEN (1.0 - CAST(sc AS DOUBLE) / nb)
                           / (1.0 - CAST(s2 AS DOUBLE) / sa)
                      ELSE 0.0 END, 6) AS conviction
    FROM rules
    """,
    doc="Association rules A -> B over order baskets (items = part "
    "brands): support, confidence, lift (>1 = genuinely associated, "
    "not just popular) and conviction, thresholded at 0.5% support "
    "and 17% confidence — the confidence gate is the integer "
    "cross-multiplication 100*s(A,B) >= 17*s(A), no float compare. "
    "The rules deliverable on top of the Apriori itemset machinery: "
    "one basket self-join bounded by the item vocabulary, supports "
    "joined from the |items| frame, all closing ratios on exact "
    "integers. What a merchandiser/recommender actually consumes.",
    tags=("stats", "mining", "rules"),
)
def a_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # pin the basket frame: FOUR consumers (n, items, and both sides of
    # the pair self-join) — unpinned, the scan+join+distinct subtree
    # re-executed per branch (15 parquet scans / 18 exchanges observed in
    # the executed plan at sf0.1), the round-5 multi-consumer root cause.
    # One materialization of the narrow (oid, item) frame serves all four.
    b = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("oid"), F.col("p_brand").alias("item"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = b.agg(
        F.countDistinct("oid").cast("long").alias("nb"),
        F.greatest(
            F.lit(2).cast("long"),
            F.floor(F.countDistinct("oid") * _RULE_MINSUP).cast("long"),
        ).alias("ms"),
    )
    items = b.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("s1"))
    x = b.select("oid", F.col("item").alias("a"))
    y = b.select("oid", F.col("item").alias("c"))
    pairs = (
        x.join(y, "oid")
        .filter(F.col("a") != F.col("c"))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("s2"))
    )
    ia = items.select(F.col("item").alias("a"), F.col("s1").alias("sa"))
    ic = items.select(F.col("item").alias("c"), F.col("s1").alias("sc"))
    rules = (
        pairs.join(F.broadcast(ia), "a")
        .join(F.broadcast(ic), "c")
        .crossJoin(F.broadcast(n))
        .filter(
            (F.col("s2") >= F.col("ms"))
            & (
                F.lit(100) * F.col("s2")
                >= F.lit(int(_RULE_MINCONF * 100)) * F.col("sa")
            )
        )
    )
    conf = F.col("s2").cast("double") / F.col("sa")
    base = F.col("sc").cast("double") / F.col("nb")
    return rules.select(
        F.col("a").alias("antecedent"),
        F.col("c").alias("consequent"),
        F.col("s2").alias("support_count"),
        pround(F.col("s2").cast("double") / F.col("nb"), 6).alias("support"),
        pround(conf, 6).alias("confidence"),
        pround(conf / base, 6).alias("lift"),
        pround(
            F.when(
                F.col("sa") - F.col("s2") > 0,
                (F.lit(1.0) - base) / (F.lit(1.0) - conf),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("conviction"),
    )


# ---------------------------------------------------------------------------
# Eval-vs-train n-gram novelty
# ---------------------------------------------------------------------------

_TOKS = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"


@register(
    "text_novelty_vs_train",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, {_TOKS} AS toks,
               CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS is_eval
        FROM documents
    ),
    sh AS (
        SELECT doc_id, source, is_eval,
               toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS g
        FROM d, unnest(range(1, len(toks) - 1)) AS u(i)
    ),
    train_vocab AS (SELECT DISTINCT g FROM sh WHERE is_eval = 0),
    eval_sh AS (
        SELECT doc_id, source, g, CAST(count(*) AS BIGINT) AS c
        FROM sh WHERE is_eval = 1 GROUP BY 1, 2, 3
    ),
    per_doc AS (
        SELECT e.doc_id, e.source,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(CASE WHEN tv.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_novel
        FROM eval_sh e LEFT JOIN train_vocab tv ON tv.g = e.g
        GROUP BY 1, 2
    ),
    ticked AS (
        SELECT source,
               CAST(floor(CAST(n_novel AS DOUBLE) / n_distinct * 1000000
                          + 0.5) AS BIGINT) AS nov_t
        FROM per_doc
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_eval_docs,
           round(CAST(sum(nov_t) AS DOUBLE) / count(*) / 1000000.0, 6)
               AS avg_novelty,
           round(min(nov_t) / 1000000.0, 6) AS min_novelty,
           round(max(nov_t) / 1000000.0, 6) AS max_novelty
    FROM ticked GROUP BY 1
    """,
    doc="n-gram novelty of the eval split against the train split: per "
    "eval document, the fraction of its DISTINCT 3-gram shingles never "
    "seen anywhere in train — the memorization/novelty audit run on "
    "generated or held-out text (novelty ~0 = the doc is reassembled "
    "training data; the same statistic, inverted, is the "
    "decontamination signal). The train vocabulary is one distinct "
    "frame; the membership probe is a shingle equi-join (at 100 TB a "
    "bloom pre-filter cuts the probe traffic, same shape as the "
    "decontaminate path); per-doc fractions tick to 1e6 before the "
    "per-source aggregate.",
    tags=("text", "dedup", "eval"),
)
def text_novelty_vs_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.text import (
        tokens_expr,
        word_shingles_expr,
    )

    # wide=True: 3-gram shingling of the full corpus pre-shuffle
    d = t(spark, sf_dir, "documents", wide=True).select(
        "doc_id",
        "source",
        word_shingles_expr(tokens_expr("text"), 3).alias("shingles"),
        (F.col("doc_id") % 5 == 0).cast("int").alias("is_eval"),
    )
    # per-doc shingle dedup via array_distinct BEFORE the explode:
    # (doc_id, g) is unique by construction, so the eval side needs no
    # (doc, shingle)-keyed shuffle at all and the train-vocab distinct's
    # map-side combine sees pre-deduped input
    sh = d.select(
        "doc_id",
        "source",
        "is_eval",
        F.explode(F.array_distinct("shingles")).alias("g"),
    )
    train_vocab = sh.filter(F.col("is_eval") == 0).select("g").distinct()
    eval_sh = sh.filter(F.col("is_eval") == 1).select("doc_id", "source", "g")
    tv = train_vocab.withColumn("seen", F.lit(1))
    per_doc = (
        eval_sh.join(tv, "g", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    ticked = per_doc.select(
        "source",
        F.floor(
            F.col("n_novel").cast("double") / F.col("n_distinct") * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("nov_t"),
    )
    return ticked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_docs"),
        pround(
            F.sum("nov_t").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0), 6
        ).alias("avg_novelty"),
        pround(F.min("nov_t") / F.lit(1000000.0), 6).alias("min_novelty"),
        pround(F.max("nov_t") / F.lit(1000000.0), 6).alias("max_novelty"),
    )


# ---------------------------------------------------------------------------
# Hash-holdout assignment stability
# ---------------------------------------------------------------------------

_SPLIT_SQL = (
    "CASE WHEN b{s} < 80 THEN 'train' WHEN b{s} < 90 THEN 'val'"
    " ELSE 'test' END"
)


@register(
    "sample_holdout_stability",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    hashed AS (
        SELECT user_id,
               CAST(('0x' || substr(md5('s1|' || CAST(user_id AS VARCHAR)),
                                    1, 8))::BIGINT % 100 AS BIGINT) AS b1,
               CAST(('0x' || substr(md5('s2|' || CAST(user_id AS VARCHAR)),
                                    1, 8))::BIGINT % 100 AS BIGINT) AS b2
        FROM u
    ),
    assigned AS (
        SELECT user_id, {_SPLIT_SQL.format(s=1)} AS split_s1,
               {_SPLIT_SQL.format(s=2)} AS split_s2
        FROM hashed
    ),
    nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM assigned),
    matrix AS (
        SELECT split_s1, split_s2, CAST(count(*) AS BIGINT) AS n_users
        FROM assigned GROUP BY 1, 2
    ),
    stay AS (
        SELECT CAST(sum(CASE WHEN split_s1 = split_s2 THEN n_users
                             ELSE 0 END) AS BIGINT) AS stayed
        FROM matrix
    )
    SELECT m.split_s1, m.split_s2, m.n_users,
           round(CAST(m.n_users AS DOUBLE) / nu.n, 6) AS frac,
           round(CAST(s.stayed AS DOUBLE) / nu.n, 6) AS overall_stability
    FROM matrix m CROSS JOIN nu CROSS JOIN stay s
    """,
    doc="Hash-holdout assignment stability under a salt change: users "
    "assign to train/val/test by md5(salt|id) mod 100 (80/10/10); the "
    "migration matrix between salt s1 and salt s2 shows how many users "
    "land in each (old split, new split) cell and what fraction keep "
    "their assignment (~66% stay in expectation for 80/10/10 — i.e., "
    "salt changes silently RESHUFFLE holdouts, the leakage mechanism "
    "this audit exists to catch; keep salts pinned). Assignment is "
    "pure engine-portable md5 integer arithmetic, the matrix is one "
    "exact aggregate over the |users| frame.",
    tags=("sampling", "split", "audit"),
)
def sample_holdout_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = t(spark, sf_dir, "events").select("user_id").distinct()

    def bucket(salt: str):
        h = F.md5(F.concat(F.lit(salt + "|"), F.col("user_id").cast("string")))
        return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 100).alias(
            f"b_{salt}"
        )

    def split(col):
        return (
            F.when(col < 80, F.lit("train"))
            .when(col < 90, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    hashed = u.select("user_id", bucket("s1"), bucket("s2"))
    assigned = hashed.select(
        split(F.col("b_s1")).alias("split_s1"),
        split(F.col("b_s2")).alias("split_s2"),
    )
    nu = assigned.agg(F.count(F.lit(1)).cast("long").alias("n"))
    matrix = assigned.groupBy("split_s1", "split_s2").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    stay = matrix.agg(
        F.sum(
            F.when(F.col("split_s1") == F.col("split_s2"), F.col("n_users")).otherwise(
                0
            )
        )
        .cast("long")
        .alias("stayed")
    )
    return (
        matrix.crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(stay))
        .select(
            "split_s1",
            "split_s2",
            "n_users",
            pround(F.col("n_users").cast("double") / F.col("n"), 6).alias("frac"),
            pround(F.col("stayed").cast("double") / F.col("n"), 6).alias(
                "overall_stability"
            ),
        )
    )
