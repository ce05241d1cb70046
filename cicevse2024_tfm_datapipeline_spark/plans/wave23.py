"""Round-4 wave 23: corpus-curation diagnostics — sorted-neighborhood
dedup blocking, CCNet-style per-language perplexity terciles, the
Gopher quality-rule battery, and the exact cross-source shingle-overlap
matrix.

Scale extensions beyond the reference pipeline surface. House rules:
exact integer comparisons for every rule threshold (no float
boundaries), 1e-4-ticked negative log-likelihoods summed as BIGINTs,
the two-phase scan for global/grouped ranks, and SQL-NTILE arithmetic
reproduced exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.extensions import _SHINGLES3, _TOKS
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup blocking
# ---------------------------------------------------------------------------

_SN_PREFIX = 64
_SN_MAXDIST = 10


@register(
    "dedup_sorted_neighborhood",
    oracle=f"""
    WITH k AS (
        SELECT doc_id, substr(text, 1, {_SN_PREFIX}) AS t64 FROM documents
    ),
    ranked AS (
        SELECT doc_id, t64,
               row_number() OVER (ORDER BY t64, doc_id) AS rn
        FROM k
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(levenshtein(a.t64, b.t64) AS BIGINT) AS lev
        FROM ranked a JOIN ranked b ON b.rn = a.rn + 1
    )
    SELECT doc_a, doc_b, lev FROM pairs WHERE lev <= {_SN_MAXDIST}
    """,
    doc="Sorted-neighborhood dedup blocking (Hernandez & Stolfo 1995) — "
    "the third blocking strategy next to LSH banding and PPJoin "
    "prefixes: sort the corpus on a 64-char key, compare only ADJACENT "
    "records, and keep pairs within edit distance 10. The global rank "
    "comes from operators.scan.global_row_number (two-phase range scan, "
    "no unpartitioned window); the neighbor step is a rank equi-join "
    "(rn+1), so total comparisons = corpus size regardless of duplicate "
    "density — the cheapest possible candidate generator when near-dups "
    "share prefixes. Levenshtein is engine-exact (same integer in Spark "
    "and DuckDB — the dedup_edit_distance_verify precedent).",
    tags=("dedup", "blocking", "levenshtein"),
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.scan import global_row_number

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, _SN_PREFIX).alias("t64")
    )
    ranked = global_row_number(docs, ["t64", "doc_id"], "rn")
    a = ranked.select(
        F.col("doc_id").alias("doc_a"), F.col("t64").alias("ta"), F.col("rn")
    )
    b = ranked.select(
        F.col("doc_id").alias("doc_b"),
        F.col("t64").alias("tb"),
        (F.col("rn") - 1).alias("rn"),
    )
    return (
        a.join(b, "rn")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("ta", "tb").cast("long").alias("lev"),
        )
        .filter(F.col("lev") <= _SN_MAXDIST)
    )


# ---------------------------------------------------------------------------
# CCNet-style per-language perplexity terciles
# ---------------------------------------------------------------------------


@register(
    "text_ccnet_perplexity_buckets",
    oracle=f"""
    WITH toksd AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    inst AS (
        SELECT doc_id, lang, unnest(toks) AS term FROM toksd
    ),
    lm AS (
        SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt
        FROM inst GROUP BY 1, 2
    ),
    lt AS (
        SELECT lang, CAST(sum(cnt) AS BIGINT) AS tot,
               CAST(count(*) AS BIGINT) AS v
        FROM lm GROUP BY 1
    ),
    scored_inst AS (
        SELECT i.doc_id, i.lang,
               CAST(floor(-ln((lm.cnt + 1.0) / (lt.tot + lt.v)) * 10000 + 0.5)
                    AS BIGINT) AS nll_ticks
        FROM inst i JOIN lm USING (lang, term) JOIN lt USING (lang)
    ),
    per_doc AS (
        SELECT doc_id, lang,
               CAST(sum(nll_ticks) // count(*) AS BIGINT) AS score
        FROM scored_inst GROUP BY 1, 2
    ),
    tiled AS (
        SELECT lang, score,
               ntile(3) OVER (PARTITION BY lang ORDER BY score, doc_id)
                   AS bucket
        FROM per_doc
    )
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(score) AS DOUBLE) / 10000.0 / count(*), 4)
               AS avg_nll
    FROM tiled GROUP BY lang, bucket
    """,
    doc="CCNet-style perplexity bucketing (Wenzek et al. 2020): score "
    "each document by its per-token negative log-likelihood under the "
    "per-LANGUAGE unigram LM (Laplace-smoothed, 1e-4-ticked integer "
    "sums, integer-divided by length), then cut each language into "
    "head/middle/tail terciles — the standard web-corpus quality "
    "partition. The per-language NTILE(3) is exact SQL NTILE arithmetic "
    "computed from grouped two-phase ranks (operators.scan."
    "grouped_cumsum — one range shuffle, a language's million docs "
    "spread over many partitions, never one task per language).",
    tags=("text", "quality", "perplexity"),
)
def text_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.scan import grouped_cumsum
    from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr

    docs = t(spark, sf_dir, "documents")
    inst = docs.select(
        "doc_id", "lang", F.explode(tokens_expr("text")).alias("term")
    )
    lm = inst.groupBy("lang", "term").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    lt = lm.groupBy("lang").agg(
        F.sum("cnt").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    nll = F.floor(
        -F.log((F.col("cnt") + 1.0) / (F.col("tot") + F.col("v"))) * 10000
        + F.lit(0.5)
    ).cast("long")
    scored_inst = (
        inst.join(lm, ["lang", "term"])
        .join(F.broadcast(lt), "lang")
        .select("doc_id", "lang", nll.alias("nll_ticks"))
    )
    per_doc = scored_inst.groupBy("doc_id", "lang").agg(
        F.floor(F.sum("nll_ticks") / F.count(F.lit(1))).cast("long").alias("score")
    )
    # exact SQL-NTILE(3) per language from grouped two-phase ranks:
    # rn within (lang) ordered by (score, doc_id), tot per lang, then the
    # first (tot % 3) tiles take the extra row — same arithmetic as
    # scan.global_ntile, applied per group
    cum = grouped_cumsum(
        per_doc.withColumn("__one", F.lit(1)),
        ["lang"],
        ["score", "doc_id"],
        ["__one"],
        with_totals=True,
    )
    rn, tot = F.col("cum___one"), F.col("tot___one")
    q = F.floor(tot / F.lit(3))
    r = tot % F.lit(3)
    cut = (q + F.lit(1)) * r
    bucket = F.when(rn <= cut, F.floor((rn - 1) / (q + 1)) + 1).otherwise(
        r + F.floor((rn - 1 - cut) / F.greatest(q, F.lit(1))) + 1
    )
    return (
        cum.select("lang", "score", bucket.cast("long").alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            pround(
                F.sum("score").cast("double") / 10000.0 / F.count(F.lit(1)), 4
            ).alias("avg_nll"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher quality-rule battery
# ---------------------------------------------------------------------------

# 2-word shingles — lockstep with operators.text.word_shingles_expr(toks, 2)
_BIGRAMS = (
    "CASE WHEN len(toks) >= 2 THEN "
    "list_transform(range(1, len(toks)), "
    "i -> array_to_string(list_slice(toks, i, i + 1), ' ')) "
    "ELSE [] END"
)


@register(
    "text_gopher_quality_rules",
    oracle=f"""
    WITH toksd AS (
        SELECT doc_id, source, text, {_TOKS} AS toks,
               length(text) AS n_chars
        FROM documents
    ),
    base AS (
        SELECT doc_id, source,
               CAST(len(toks) AS BIGINT) AS n_tok,
               CAST(list_reduce(list_transform(toks, x -> length(x)),
                                (a, b) -> a + b) AS BIGINT) AS sum_len,
               CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                    AS BIGINT) AS n_sym,
               n_chars,
               CAST(CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
                  + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
                  + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
                  + CASE WHEN list_contains(toks, 'a') THEN 1 ELSE 0 END
                    AS BIGINT) AS n_stop
        FROM toksd
    ),
    bg AS (
        SELECT doc_id, unnest({_BIGRAMS}) AS b
        FROM toksd
    ),
    bgc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
    bgm AS (
        SELECT doc_id, CAST(max(c) AS BIGINT) AS max_bg,
               CAST(sum(c) AS BIGINT) AS tot_bg
        FROM bgc GROUP BY 1
    ),
    flags AS (
        SELECT b.source,
               CASE WHEN b.n_tok BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r1,
               CASE WHEN 3 * b.n_tok <= b.sum_len
                     AND b.sum_len <= 10 * b.n_tok THEN 1 ELSE 0 END AS r2,
               CASE WHEN 10 * b.n_sym <= b.n_chars THEN 1 ELSE 0 END AS r3,
               CASE WHEN b.n_stop >= 2 THEN 1 ELSE 0 END AS r4,
               CASE WHEN m.doc_id IS NULL OR 50 * m.max_bg <= 9 * m.tot_bg
                    THEN 1 ELSE 0 END AS r5
        FROM base b LEFT JOIN bgm m USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(r1) AS BIGINT) AS pass_length,
           CAST(sum(r2) AS BIGINT) AS pass_word_len,
           CAST(sum(r3) AS BIGINT) AS pass_symbols,
           CAST(sum(r4) AS BIGINT) AS pass_stopwords,
           CAST(sum(r5) AS BIGINT) AS pass_repetition,
           CAST(sum(r1 * r2 * r3 * r4 * r5) AS BIGINT) AS pass_all
    FROM flags GROUP BY source
    """,
    doc="Gopher quality-rule battery (Rae et al. 2021, the standard "
    "web-corpus pre-filter): per-document length bounds, mean-word-"
    "length bounds, symbol-to-char ratio, minimum stopword evidence, "
    "and top-bigram repetition — EVERY threshold an exact integer "
    "cross-multiplication (3n <= L <= 10n, 10*sym <= chars, 50*max <= "
    "9*total), so no float boundary can diverge between engines. Four "
    "of five rules are pure per-row expressions; the repetition rule "
    "adds one bounded per-doc bigram aggregate. Per-source pass counts "
    "are the corpus-health dashboard a filtering run reads first.",
    tags=("text", "quality", "gopher"),
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.text import (
        tokens_expr,
        word_shingles_expr,
    )

    docs = t(spark, sf_dir, "documents")
    toks = tokens_expr("text")
    base = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tok"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0),
            lambda a, b: a + b,
        )
        .cast("long")
        .alias("sum_len"),
        F.length(F.regexp_replace("text", "[A-Za-z0-9 ]", ""))
        .cast("long")
        .alias("n_sym"),
        F.length("text").cast("long").alias("n_chars"),
        (
            F.array_contains(toks, "the").cast("int")
            + F.array_contains(toks, "of").cast("int")
            + F.array_contains(toks, "and").cast("int")
            + F.array_contains(toks, "a").cast("int")
        )
        .cast("long")
        .alias("n_stop"),
    )
    bgm = (
        docs.select(
            "doc_id", F.explode(word_shingles_expr(tokens_expr("text"), 2)).alias("b")
        )
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").cast("long").alias("max_bg"),
            F.sum("c").cast("long").alias("tot_bg"),
        )
    )
    flags = base.join(bgm, "doc_id", "left").select(
        "source",
        F.col("n_tok").between(50, 100000).cast("int").alias("r1"),
        (
            (3 * F.col("n_tok") <= F.col("sum_len"))
            & (F.col("sum_len") <= 10 * F.col("n_tok"))
        )
        .cast("int")
        .alias("r2"),
        (10 * F.col("n_sym") <= F.col("n_chars")).cast("int").alias("r3"),
        (F.col("n_stop") >= 2).cast("int").alias("r4"),
        (
            F.col("max_bg").isNull()
            | (50 * F.col("max_bg") <= 9 * F.col("tot_bg"))
        )
        .cast("int")
        .alias("r5"),
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("r1").cast("long").alias("pass_length"),
        F.sum("r2").cast("long").alias("pass_word_len"),
        F.sum("r3").cast("long").alias("pass_symbols"),
        F.sum("r4").cast("long").alias("pass_stopwords"),
        F.sum("r5").cast("long").alias("pass_repetition"),
        F.sum(F.col("r1") * F.col("r2") * F.col("r3") * F.col("r4") * F.col("r5"))
        .cast("long")
        .alias("pass_all"),
    )


# ---------------------------------------------------------------------------
# Cross-source shingle-overlap matrix
# ---------------------------------------------------------------------------


@register(
    "dedup_source_overlap_matrix",
    oracle=f"""
    WITH toksd AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    sh AS (
        SELECT DISTINCT CAST(substr(source, 4) AS INT) AS src,
               unnest({_SHINGLES3}) AS s
        FROM toksd
    ),
    per_src AS (SELECT src, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
    common AS (
        SELECT a.src AS src_a, b.src AS src_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM sh a JOIN sh b ON a.s = b.s AND a.src < b.src
        GROUP BY 1, 2
    )
    SELECT c.src_a, c.src_b, c.n_common,
           round(CAST(c.n_common AS DOUBLE)
                 / (pa.n_sh + pb.n_sh - c.n_common), 6) AS jaccard
    FROM common c
    JOIN per_src pa ON pa.src = c.src_a
    JOIN per_src pb ON pb.src = c.src_b
    """,
    doc="Cross-source overlap matrix: exact pairwise 3-shingle Jaccard "
    "between every pair of corpus sources — the contamination/"
    "provenance diagnostic that decides which sources double-count "
    "content before mixture weights are set. ONE distinct "
    "(shingle, source) pass, then a self-equi-join on the shingle key "
    "whose fan-out per shingle is bounded by (sources-containing-it "
    "choose 2) <= C(20,2), never corpus-sized; union sizes come from "
    "the same distinct frame. At 100 TB the same plan holds (the "
    "shingle join is the dedup shuffle); swap in MinHash unions when "
    "source counts grow past a few hundred.",
    tags=("dedup", "overlap", "provenance"),
)
def dedup_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.text import (
        tokens_expr,
        word_shingles_expr,
    )

    # wide=True: the tokenize+shingle explode below is CPU-dense
    docs = t(spark, sf_dir, "documents", wide=True)
    # array_distinct cuts the partial-agg input per doc; the lazy pin
    # matters more: sh has THREE consumers (per_src + both join sides),
    # and without it the tokenize+explode+distinct subtree — the only
    # corpus-sized work in the query — executes once per consumer. The
    # pinned frame is (src, shingle)-distinct, i.e. vocabulary-bounded,
    # never corpus-sized.
    sh = (
        docs.select(
            F.expr("cast(substring(source, 4) as int)").alias("src"),
            F.explode(
                F.array_distinct(word_shingles_expr(tokens_expr("text"), 3))
            ).alias("s"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    per_src = sh.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a = sh.select(F.col("src").alias("src_a"), "s")
    b = sh.select(F.col("src").alias("src_b"), "s")
    common = (
        a.join(b, "s")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    pa = per_src.select(F.col("src").alias("src_a"), F.col("n_sh").alias("na"))
    pb = per_src.select(F.col("src").alias("src_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(F.broadcast(pa), "src_a")
        .join(F.broadcast(pb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            pround(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
