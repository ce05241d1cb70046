"""Round-4 wave 21: training-data curation operators from the modern
LLM-pipeline playbook — DSIR-style hashed importance resampling, ANN
hard-negative mining, eval-contamination fraction scoring, token-budget
epoch allocation, the Heaps-law vocabulary-growth exponent, and a
streaming near-dup collision monitor.

Scale extensions beyond the reference pipeline surface (the reference is
a single-machine pandas/sklearn TFM pipeline with no corpus layer).
House determinism rules throughout: md5/sha slices for cross-engine
hashing, ln values ticked to exact 1e-4 BIGINTs before any summation,
integer arithmetic for every allocation/threshold, and single closing
divisions canonicalized with pround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.extensions import (
    _band_sql,
    _DOT,
    _NQ,
    _NV,
    _sig_sql,
    _SHINGLES3,
    _TOKS,
    BANDS,
    NUM_HASHES,
)
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

_N_FEAT = 64  # hashed n-gram feature buckets (DSIR keeps 10k at scale)


def _md5_mod_sql(expr: str, m: int) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT) % {m}"


def _md5_mod_col(col, m: int):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % m


# ---------------------------------------------------------------------------
# DSIR-style hashed importance resampling
# ---------------------------------------------------------------------------


@register(
    "sample_dsir_importance",
    oracle=f"""
    WITH toksd AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    terms AS (SELECT doc_id, unnest(toks) AS term FROM toksd),
    inst AS (
        SELECT doc_id, {_md5_mod_sql("term", _N_FEAT)} AS bkt FROM terms
    ),
    bc AS (
        SELECT bkt,
               CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS t_b,
               CAST(count(*) AS BIGINT) AS r_b
        FROM inst GROUP BY bkt
    ),
    tot AS (
        SELECT CAST(sum(t_b) AS BIGINT) AS tt, CAST(sum(r_b) AS BIGINT) AS rt
        FROM bc
    ),
    lw AS (
        SELECT bkt,
               CAST(floor(ln(((t_b + 1.0) * (rt + {_N_FEAT})) /
                            ((r_b + 1.0) * (tt + {_N_FEAT}))) * 10000 + 0.5)
                    AS BIGINT) AS l_ticks
        FROM bc CROSS JOIN tot
    ),
    per_doc AS (
        SELECT i.doc_id, CAST(sum(l.l_ticks) AS BIGINT) AS imp_ticks
        FROM inst i JOIN lw l USING (bkt)
        WHERE i.doc_id % 7 <> 0
        GROUP BY i.doc_id
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN coalesce(p.imp_ticks, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_selected,
           round(CAST(sum(coalesce(p.imp_ticks, 0)) AS DOUBLE)
                 / 10000.0 / count(*), 4) AS avg_log_importance
    FROM (SELECT doc_id, source FROM documents WHERE doc_id % 7 <> 0) d
    LEFT JOIN per_doc p USING (doc_id)
    GROUP BY d.source
    """,
    doc="DSIR-style importance resampling (Xie et al. 2023, 'Data "
    "Selection for Language Models via Importance Resampling'): unigram "
    "instances hash onto 64 feature buckets (md5 slice — the hashed "
    "n-gram generative model), the target distribution is the held-out "
    "slice doc_id%7=0, and each raw doc scores the exact integer sum of "
    "1e-4-ticked per-bucket log importance ratios ln(p_target/p_raw), "
    "Laplace-smoothed. Selection = positive log importance. Scale shape: "
    "one token-instance pass aggregated to a 64-row weight table that "
    "broadcasts back onto the instance stream; per-doc sums shuffle once "
    "on doc_id; nothing is ever all-pairs and the weight model is O(1) "
    "memory. Reported per source: corpus size, selected count, mean log "
    "importance — the mixture diagnostic a 100-TB curation run reads.",
    tags=("sample", "dsir", "importance"),
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr

    docs = t(spark, sf_dir, "documents")
    inst = docs.select(
        "doc_id", F.explode(tokens_expr("text")).alias("term")
    ).select("doc_id", _md5_mod_col(F.col("term"), _N_FEAT).alias("bkt"))
    bc = inst.groupBy("bkt").agg(
        F.sum(((F.col("doc_id") % 7) == 0).cast("long")).alias("t_b"),
        F.count(F.lit(1)).cast("long").alias("r_b"),
    )
    tot = bc.agg(
        F.sum("t_b").cast("long").alias("tt"), F.sum("r_b").cast("long").alias("rt")
    )
    lw = bc.crossJoin(F.broadcast(tot)).select(
        "bkt",
        F.floor(
            F.log(
                ((F.col("t_b") + 1.0) * (F.col("rt") + F.lit(_N_FEAT)))
                / ((F.col("r_b") + 1.0) * (F.col("tt") + F.lit(_N_FEAT)))
            )
            * 10000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("l_ticks"),
    )
    per_doc = (
        inst.filter((F.col("doc_id") % 7) != 0)
        .join(F.broadcast(lw), "bkt")
        .groupBy("doc_id")
        .agg(F.sum("l_ticks").cast("long").alias("imp_ticks"))
    )
    raw = docs.filter((F.col("doc_id") % 7) != 0).select("doc_id", "source")
    scored = raw.join(per_doc, "doc_id", "left").select(
        "source", F.coalesce("imp_ticks", F.lit(0)).alias("imp_ticks")
    )
    agg = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("imp_ticks") > 0).cast("long")).cast("long").alias("n_selected"),
        F.sum("imp_ticks").cast("long").alias("__sum_ticks"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_selected",
        pround(
            F.col("__sum_ticks").cast("double") / 10000.0 / F.col("n_docs"), 4
        ).alias("avg_log_importance"),
    )


# ---------------------------------------------------------------------------
# Hard-negative mining over the ANN buckets
# ---------------------------------------------------------------------------

_HN_BITS = 4  # 16 sign buckets — denser candidates than the 8-bit ANN index


def _hn_bucket_sql(var: str) -> str:
    return " + ".join(
        f"(CASE WHEN {var}[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_HN_BITS)
    )


@register(
    "sim_hard_negatives",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id, label, v, {_hn_bucket_sql("v")} AS bucket FROM e),
    q AS (SELECT vec_id AS query_id, label AS q_label, v AS qv, bucket
          FROM c WHERE vec_id < 20),
    scored AS (
        SELECT q.query_id, c.vec_id AS neg_id, c.label AS neg_label,
               {_DOT} / ({_NQ} * {_NV}) AS cosine
        FROM c JOIN q USING (bucket)
        WHERE c.label <> q.q_label
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neg_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neg_id, neg_label, round(cosine, 6) AS cosine,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 3
    """,
    doc="Hard-negative mining for contrastive training: for each anchor "
    "(vec_id < 20) find the 3 most-similar vectors with a DIFFERENT "
    "label — the near-boundary negatives that make embedding models "
    "learn. Candidate generation is the sign-bucket ANN equi-join "
    "(anchors meet only their own bucket, never the full corpus), the "
    "label-mismatch filter rides the join, and the per-anchor top-3 is "
    "a partitioned window over the bounded candidate set — the same "
    "linear-in-corpus shape as the ANN index queries at 100 TB. "
    "Sequential-fold dot products, 6-dp cosine canonicalization.",
    tags=("similarity", "contrastive", "ann"),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from cicevse2024_tfm_datapipeline_spark.operators.similarity import (
        as_double_array,
        dot_expr,
        norm_expr,
        sign_bucket_expr,
    )

    emb = t(spark, sf_dir, "embeddings")
    v = as_double_array("embedding")
    # per-side norm precompute (r11): one fold per row instead of two
    # folds per candidate pair — identical IEEE expression, bit-equal
    c = emb.select(
        "vec_id",
        "label",
        v.alias("v"),
        sign_bucket_expr(v, _HN_BITS).alias("bucket"),
        norm_expr(v).alias("nv"),
    )
    q = c.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
        F.col("nv").alias("qn"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("label") != F.col("q_label"))
        .select(
            "query_id",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            (dot_expr(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nv"))).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neg_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            "neg_id",
            "neg_label",
            pround("cosine", 6).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Eval-contamination fraction scoring (graded, not binary)
# ---------------------------------------------------------------------------


@register(
    "dedup_contamination_fraction",
    oracle=f"""
    WITH toksd AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, source, {_SHINGLES3} AS shingles FROM toksd),
    eval_sh AS (
        SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 10 = 0
    ),
    train_sh AS (
        SELECT DISTINCT doc_id, source, unnest(shingles) AS s
        FROM sh WHERE doc_id % 10 <> 0
    ),
    per_doc AS (
        SELECT t.doc_id, t.source,
               CAST(count(*) AS BIGINT) AS n_sh,
               CAST(sum(CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hit
        FROM train_sh t LEFT JOIN eval_sh e USING (s)
        GROUP BY t.doc_id, t.source
    ),
    graded AS (
        SELECT source,
               CASE WHEN n_hit = 0 THEN 'clean'
                    WHEN 2 * n_hit < n_sh THEN 'partial'
                    ELSE 'contaminated' END AS grade,
               n_hit, n_sh
        FROM per_doc
    )
    SELECT source, grade,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(n_hit) AS DOUBLE) / sum(n_sh), 6) AS pooled_overlap
    FROM graded GROUP BY source, grade
    """,
    doc="Graded eval-contamination scoring — the refinement of the binary "
    "decontaminate filter real pipelines use for triage: per training "
    "doc, the fraction of its DISTINCT 3-word shingles that appear in "
    "the eval shingle set, graded clean / partial (<50%) / contaminated "
    "(>=50%, integer 2*hit<n comparison — no float threshold). The eval "
    "side collapses to a distinct broadcast set exactly as "
    "dedup_decontaminate_train; the corpus never shuffles for the "
    "membership test, then aggregates once per (source, grade) with the "
    "pooled overlap ratio as a single closing division.",
    tags=("dedup", "decontamination"),
)
def dedup_contamination_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.text import (
        tokens_expr,
        word_shingles_expr,
    )

    # wide=True: 3-gram shingling of the full corpus is the CPU-dense
    # narrow stage (the 4.9x 100x probe ratio was this single-task CPU)
    docs = t(spark, sf_dir, "documents", wide=True)
    sh = docs.select(
        "doc_id",
        "source",
        word_shingles_expr(tokens_expr("text"), 3).alias("shingles"),
    )
    # per-doc dedup happens INSIDE the array (array_distinct) before the
    # explode: (doc_id, s) is then unique by construction, so the train
    # side needs NO corpus-sized distinct shuffle — the only wide op on
    # the exploded frame is the per-doc groupBy, whose map-side combine
    # collapses each doc's (contiguous) shingles before the exchange.
    # The eval side still needs a global distinct, but on 10% of the
    # corpus and after the per-doc dedup.
    eval_sh = (
        sh.filter(F.col("doc_id") % 10 == 0)
        .select(F.explode(F.array_distinct("shingles")).alias("s"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    train_sh = sh.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", "source", F.explode(F.array_distinct("shingles")).alias("s")
    )
    per_doc = (
        train_sh.join(F.broadcast(eval_sh), "s", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sh"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_hit"),
        )
    )
    grade = (
        F.when(F.col("n_hit") == 0, "clean")
        .when(2 * F.col("n_hit") < F.col("n_sh"), "partial")
        .otherwise("contaminated")
    )
    return (
        per_doc.withColumn("grade", grade)
        .groupBy("source", "grade")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            pround(
                F.sum("n_hit").cast("double") / F.sum("n_sh"), 6
            ).alias("pooled_overlap"),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget epoch allocation (multi-epoch mixture planning)
# ---------------------------------------------------------------------------

_MAX_EPOCHS = 4


@register(
    "sample_epoch_allocation",
    oracle=f"""
    WITH toksd AS (SELECT source, len({_TOKS}) AS n_tok FROM documents),
    per_src AS (
        SELECT source, CAST(sum(n_tok) AS BIGINT) AS t_s FROM toksd GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(t_s) AS BIGINT) AS r,
               CAST(count(*) AS BIGINT) AS n_src
        FROM per_src
    ),
    alloc AS (
        SELECT source, t_s,
               CAST((3 * r // 2) // n_src AS BIGINT) AS desired,
               least(CAST((3 * r // 2) // n_src AS BIGINT),
                     {_MAX_EPOCHS} * t_s) AS effective
        FROM per_src CROSS JOIN tot
    )
    SELECT source, t_s AS n_tokens, desired,
           CAST(effective // t_s AS BIGINT) AS full_epochs,
           CAST(effective % t_s AS BIGINT) AS partial_tokens,
           effective AS effective_tokens,
           CAST(desired - effective AS BIGINT) AS shortfall
    FROM alloc
    """,
    doc="Token-budget epoch allocation — the mixture-planning arithmetic "
    "of a multi-epoch pretraining run (how many times each source "
    "repeats under a global token budget with a repeat cap): budget = "
    "3/2 of the corpus, split evenly across sources; each source "
    "delivers min(desired, 4 epochs) as full epochs + a partial-epoch "
    "token remainder, and the undeliverable shortfall is reported for "
    "reallocation. Every quantity is exact BIGINT arithmetic on one "
    "per-source aggregate (integer // and %%, no float allocation), so "
    "the plan is a token-count scan plus a 20-row broadcast — the same "
    "shape whether the corpus is 500 docs or 100 TB.",
    tags=("sample", "mixture", "epochs"),
)
def sample_epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr

    docs = t(spark, sf_dir, "documents")
    per_src = docs.select(
        "source", F.size(tokens_expr("text")).alias("n_tok")
    ).groupBy("source").agg(F.sum("n_tok").cast("long").alias("t_s"))
    tot = per_src.agg(
        F.sum("t_s").cast("long").alias("r"),
        F.count(F.lit(1)).cast("long").alias("n_src"),
    )
    # pure integer quotients on both sides: DuckDB's // on DOUBLEs does
    # not floor and its double->BIGINT cast ROUNDS, so any float detour
    # here breaks parity (seen at sf0.1: 20302.8 -> 20303 vs floor 20302)
    desired = (
        F.floor(F.floor(3 * F.col("r") / F.lit(2)) / F.col("n_src")).cast("long")
    )
    alloc = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "t_s",
        desired.alias("desired"),
        F.least(desired, F.lit(_MAX_EPOCHS) * F.col("t_s")).alias("effective"),
    )
    return alloc.select(
        "source",
        F.col("t_s").alias("n_tokens"),
        "desired",
        F.floor(F.col("effective") / F.col("t_s")).cast("long").alias("full_epochs"),
        (F.col("effective") % F.col("t_s")).cast("long").alias("partial_tokens"),
        F.col("effective").alias("effective_tokens"),
        (F.col("desired") - F.col("effective")).cast("long").alias("shortfall"),
    )


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth exponent
# ---------------------------------------------------------------------------

_N_CHECKPOINTS = 16


@register(
    "text_heaps_law",
    oracle=f"""
    WITH toksd AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    inst AS (
        SELECT doc_id,
               unnest(toks) AS term,
               unnest(range(1, len(toks) + 1)) AS pos
        FROM toksd
    ),
    numbered AS (
        SELECT term, row_number() OVER (ORDER BY doc_id, pos) AS gpos FROM inst
    ),
    firsts AS (SELECT term, min(gpos) AS first_pos FROM numbered GROUP BY term),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM numbered),
    cps AS (
        SELECT k, CAST(n * k // {_N_CHECKPOINTS} AS BIGINT) AS n_k
        FROM tot CROSS JOIN range(1, {_N_CHECKPOINTS} + 1) t(k)
    ),
    vk AS (
        SELECT c.k, c.n_k, CAST(count(*) AS BIGINT) AS v_k
        FROM cps c JOIN firsts f ON f.first_pos <= c.n_k
        GROUP BY c.k, c.n_k
    ),
    pts AS (
        SELECT CAST(floor(ln(CAST(n_k AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS x,
               CAST(floor(ln(CAST(v_k AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS y
        FROM vk
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM pts
    )
    SELECT n AS n_points,
           round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 4) AS beta,
           round(((sy - (n * sxy - sx * sy) * 1.0
                        / (n * sxx - sx * sx) * sx) / n) / 10000.0, 4)
               AS intercept_ln_k
    FROM s
    """,
    doc="Heaps-law vocabulary growth: V(n) ~ K n^beta fitted over 16 "
    "equal-spaced corpus prefixes. Each token instance gets a global "
    "position from the two-phase scan (operators.scan.global_row_number "
    "— no unpartitioned window over the instance stream), first "
    "occurrences reduce to one row per vocabulary term, and V at each "
    "checkpoint is a 16-row broadcast range join against the vocabulary "
    "frame. The log-log OLS runs on 1e-4-ticked integer moments (the "
    "wave-15 Zipf machinery), so beta is exact-arithmetic reproducible. "
    "beta far from ~0.5 flags templated/synthetic corpora the same way "
    "the Zipf slope does — the two are the standard paired diagnostics.",
    tags=("text", "heaps", "powerlaw"),
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.scan import global_row_number
    from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr

    docs = t(spark, sf_dir, "documents")
    inst = docs.select(
        "doc_id", F.posexplode(tokens_expr("text")).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    numbered = global_row_number(inst, ["doc_id", "pos"], "gpos")
    firsts = numbered.groupBy("term").agg(F.min("gpos").alias("first_pos"))
    tot = numbered.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ks = spark.range(1, _N_CHECKPOINTS + 1).select(F.col("id").alias("k"))
    cps = ks.crossJoin(F.broadcast(tot)).select(
        "k",
        F.floor(F.col("n") * F.col("k") / F.lit(_N_CHECKPOINTS))
        .cast("long")
        .alias("n_k"),
    )
    vk = (
        firsts.join(F.broadcast(cps), F.col("first_pos") <= F.col("n_k"))
        .groupBy("k", "n_k")
        .agg(F.count(F.lit(1)).cast("long").alias("v_k"))
    )
    pts = vk.select(
        F.floor(F.log(F.col("n_k").cast("double")) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("v_k").cast("double")) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)
    return s.select(
        n.alias("n_points"),
        pround(slope, 4).alias("beta"),
        pround(((sy - slope * sx) / n) / 10000.0, 4).alias("intercept_ln_k"),
    )


# ---------------------------------------------------------------------------
# Streaming near-dup collision monitor (LSH bands over a document stream)
# ---------------------------------------------------------------------------


def _documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (no timestamp
    columns, so the schema passes through as stored)."""
    from cicevse2024_tfm_datapipeline_spark.sources.readers import load_table

    schema = load_table(spark, sf_dir, "documents").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


@register(
    "stream_lsh_collisions",
    oracle=f"""
    WITH {_sig_sql()},
    bands AS ({_band_sql()}),
    bk AS (
        SELECT band_idx, band_key, count(*) AS n_docs
        FROM bands GROUP BY 1, 2
    )
    SELECT band_idx,
           CAST(count(*) AS BIGINT) AS n_collision_buckets,
           CAST(sum(n_docs) AS BIGINT) AS n_docs_in_collisions
    FROM bk WHERE n_docs >= 2
    GROUP BY band_idx
    """,
    doc="STREAMING near-dup monitor: MinHash signatures + LSH band keys "
    "computed statelessly per arriving document, aggregated per "
    "(band_idx, band_key) in complete mode — the live duplicate-"
    "collision dashboard of an ingestion pipeline, hash-checked against "
    "the batch LSH banding SQL (the streaming<->batch equivalence "
    "contract, same rule as every §2.9 query). The per-band collision "
    "counts are exactly the candidate-pair volume the batch "
    "dedup_minhash_lsh_pairs join would see, so the monitor predicts "
    "dedup cost before the batch job runs. State is one row per "
    "occupied band bucket (bounded by corpus bands, uniform md5 keys — "
    "no hot key); at production scale the same plan runs with a "
    "watermarked update sink instead of complete mode.",
    tags=("streaming", "dedup", "lsh"),
)
def stream_lsh_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.dedup import (
        lsh_band_keys,
        minhash_signatures,
    )
    from cicevse2024_tfm_datapipeline_spark.streaming.stream_ops import (
        run_to_completion,
    )

    # repartition inside the stream: the file source yields ONE partition
    # per micro-batch (single-file batches), which would serialize the
    # CPU-dense minhash into one task — the streaming twin of the batch
    # wide-scan opt-in. Stateless, so semantics are untouched; a Kafka
    # source at production scale brings its own partitioning and makes
    # this a cheap pass-through exchange.
    stream = _documents_stream(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    sigs = minhash_signatures(stream, "text", "doc_id", NUM_HASHES, 3)
    keys = lsh_band_keys(sigs, "doc_id", BANDS, NUM_HASHES // BANDS)
    agg = keys.groupBy("band_idx", "band_key").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    out = run_to_completion(agg, "stream_lsh_collisions_out", output_mode="complete")
    return (
        out.filter(F.col("n_docs") >= 2)
        .groupBy("band_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_collision_buckets"),
            F.sum("n_docs").cast("long").alias("n_docs_in_collisions"),
        )
    )
