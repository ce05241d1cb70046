"""Round-10 wave 42: Wasserstein-1 drift distance, blocked
edit-distance linkage, and BM25 ranked retrieval.

Three gaps in the drift / fuzzy-matching / retrieval families (the
sum-weighted sibling of `a_ks_two_sample`'s max-gap statistic, the
classic Levenshtein record-linkage join Spark ships as a JVM built-in,
and the BM25 scorer beside text_tfidf_topk). House rules: exact integer ticks before any double division (the sums are
order-free BIGINT/DECIMAL in both engines), every pair space is a
blocked equi-join, and both engines share every literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Wasserstein-1 (earth mover's) distance between two value distributions
# ---------------------------------------------------------------------------


@register(
    "a_wasserstein_drift",
    oracle="""
    WITH s AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS vt,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS a,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS b
        FROM events WHERE event_type IN ('view', 'error')
    ),
    per AS (SELECT vt, sum(a) AS na, sum(b) AS nb FROM s GROUP BY 1),
    cum AS (
        SELECT vt,
               sum(na) OVER w AS ca, sum(nb) OVER w AS cb,
               sum(na) OVER () AS ta, sum(nb) OVER () AS tb,
               lead(vt) OVER (ORDER BY vt) AS vt_next
        FROM per
        WINDOW w AS (ORDER BY vt ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    segs AS (
        SELECT CAST(abs(ca * tb - cb * ta) AS HUGEINT)
               * (vt_next - vt) AS area_ticks,
               ta, tb
        FROM cum WHERE vt_next IS NOT NULL
    )
    SELECT round(CAST(sum(area_ticks) AS DOUBLE)
                 / CAST(max(ta) * max(tb) * 100 AS DOUBLE), 6)
               AS w1_distance,
           CAST(max(ta) AS BIGINT) AS n_a,
           CAST(max(tb) AS BIGINT) AS n_b
    FROM segs
    """,
    doc="Two-sample Wasserstein-1 (earth mover's) distance between the "
    "value distributions of two event types — the magnitude-aware drift "
    "detector next to a_ks_two_sample's max-gap (KS says two batches "
    "differ; W1 says by how much, in value units). W1 = sum over "
    "consecutive distinct values of |ECDF gap| x value step. Scale "
    "shape: values tick to exact BIGINT hundredths, both samples' "
    "cumulative counts come from ONE two-phase scan over the merged "
    "distinct-value frame (operators/scan.global_cumsum — the scan also "
    "emits the global row number, so the NEXT distinct value is an "
    "equi-join on rn+1, not a window), and each segment's area is the "
    "exact integer |ca*tb - cb*ta| * dv_ticks — summed as DECIMAL(38)/"
    "HUGEINT, perfectly order-free in both engines (the TPC-H Q1 "
    "float-sum lesson); one double division at the very end. No "
    "unpartitioned window, nothing collected.",
    tags=("A", "drift", "scan"),
)
def a_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.scan import global_cumsum

    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isin("view", "error"))
    per = (
        ev.select(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vt"),
            (F.col("event_type") == "view").cast("long").alias("a"),
            (F.col("event_type") == "error").cast("long").alias("b"),
        )
        .groupBy("vt")
        .agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
        .withColumn("one", F.lit(1))
    )
    cum = global_cumsum(per, ["vt"], ["na", "nb", "one"], with_totals=True)
    cur = cum.select(
        F.col("cum_one").alias("rn"),
        "vt",
        "cum_na",
        "cum_nb",
        "tot_na",
        "tot_nb",
    )
    nxt = cum.select((F.col("cum_one") - 1).alias("rn"), F.col("vt").alias("vt_next"))
    # the last distinct value has no successor -> inner join drops it
    # (its segment has zero width); the rn equi-join is one shuffle on a
    # dense integer key — no lead window anywhere
    # every product is lifted to DECIMAL(38,0) BEFORE multiplying (the
    # oracle's HUGEINT placement): at ~1e9 rows per side the LONG products
    # cum*tot (~1e18) and tot_na*tot_nb would overflow and wrap silently
    # under non-ANSI Spark; decimal keeps the 'exact integer' claim true
    segs = cur.join(nxt, "rn").select(
        (
            F.abs(
                F.col("cum_na").cast("decimal(38,0)") * F.col("tot_nb")
                - F.col("cum_nb").cast("decimal(38,0)") * F.col("tot_na")
            )
            * (F.col("vt_next") - F.col("vt"))
        )
        .cast("decimal(38,0)")
        .alias("area_ticks"),
        "tot_na",
        "tot_nb",
    )
    return segs.agg(
        pround(
            F.sum("area_ticks").cast("double")
            / (
                F.max("tot_na").cast("decimal(38,0)")
                * F.max("tot_nb")
                * F.lit(100)
            ).cast("double"),
            6,
        ).alias("w1_distance"),
        F.max("tot_na").cast("long").alias("n_a"),
        F.max("tot_nb").cast("long").alias("n_b"),
    )


# ---------------------------------------------------------------------------
# Blocked Levenshtein (edit-distance) linkage
# ---------------------------------------------------------------------------

_LEV_MAX = 4  # linkage threshold (shared literal)


@register(
    "j_levenshtein_blocked",
    oracle=f"""
    WITH p AS (
        SELECT p_partkey AS id, lower(p_name) AS name,
               p_size AS sz, p_brand AS cont,
               split_part(lower(p_name), ' ', 1) AS w1
        FROM part
    ),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
               levenshtein(a.name, b.name) AS dist
        FROM p a JOIN p b
          ON a.sz = b.sz AND a.cont = b.cont AND a.w1 = b.w1
         AND a.id < b.id
    )
    SELECT dist,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(id_a + id_b) AS BIGINT) AS id_checksum,
           CAST(min(id_a) AS BIGINT) AS min_id_a,
           CAST(max(id_b) AS BIGINT) AS max_id_b
    FROM pairs WHERE dist <= {_LEV_MAX}
    GROUP BY dist
    """,
    doc="Blocked Levenshtein (edit-distance) linkage over part names: "
    "candidate pairs come from a (size, brand, first-token) blocking "
    "equi-join — never all pairs — and each pair is scored with the JVM "
    "built-in levenshtein (Spark passes the threshold argument so the "
    "DP matrix is band-limited to O(k x min(len)) and abandons early; "
    "the oracle computes the full distance and filters — same set). "
    "Output is the bounded per-distance audit (pair counts + id "
    "checksums, <= 5 rows at any corpus size) a linkage "
    "pipeline reads before accepting a merge threshold. Scale note: "
    "with a FIXED blocking-key domain, per-block occupancy grows with "
    "the corpus and pair volume is quadratic in occupancy — at larger "
    "corpora the block key gains bits (length band, second token, "
    "q-gram prefix) exactly like the Fellegi-Sunter and sorted-"
    "neighborhood entries; the join shape is unchanged.",
    tags=("join", "linkage", "dedup"),
)
def j_levenshtein_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.lower(F.col("p_name")).alias("name"),
        F.col("p_size").alias("sz"),
        F.col("p_brand").alias("cont"),
        F.split(F.lower(F.col("p_name")), " ")[0].alias("w1"),
    )
    a = p.select(
        F.col("id").alias("id_a"),
        F.col("name").alias("name_a"),
        "sz",
        "cont",
        "w1",
    )
    b = p.select(
        F.col("id").alias("id_b"),
        F.col("name").alias("name_b"),
        "sz",
        "cont",
        "w1",
    )
    pairs = (
        a.join(b, ["sz", "cont", "w1"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            # threshold arg band-limits the DP and early-abandons; -1
            # marks above-threshold, filtered next
            F.levenshtein(F.col("name_a"), F.col("name_b"), _LEV_MAX).alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= _LEV_MAX))
    )
    return pairs.groupBy("dist").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("id_a") + F.col("id_b")).cast("long").alias("id_checksum"),
        F.min("id_a").cast("long").alias("min_id_a"),
        F.max("id_b").cast("long").alias("max_id_b"),
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("table", "hash", "merge")  # literal query, shared verbatim


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH toksd AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    dl AS (SELECT doc_id, len(toks) AS dl FROM toksd),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(dl) AS BIGINT) AS sum_dl
        FROM dl
    ),
    terms AS (SELECT doc_id, unnest(toks) AS term FROM toksd),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM terms
        WHERE term IN {str(tuple(_BM25_TERMS))}
        GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               sum(ln((n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * ({_BM25_K1} + 1.0)
                   / (tf.tf + {_BM25_K1}
                      * (1.0 - {_BM25_B}
                         + {_BM25_B} * dl.dl
                           / (CAST(sum_dl AS DOUBLE) / n_docs))))
                   AS bm25,
               count(*) AS n_terms_hit
        FROM tf
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, round(bm25, 6) AS bm25,
           CAST(n_terms_hit AS BIGINT) AS n_terms_hit
    FROM scored
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 15
    """,
    doc="BM25 ranked retrieval (Lucene +1 idf form, k1=1.2, b=0.75) for "
    "a literal 3-term query over the documents corpus — the relevance "
    "scorer a retrieval/RAG indexing pipeline runs beside TF-IDF "
    "(text_tfidf_topk), adding the document-length normalization and "
    "term saturation TF-IDF lacks. Scale shape: tf filters to the query "
    "terms BEFORE aggregating (the explode never materializes non-query "
    "terms past the filter), df over the filtered frame is "
    "|query-terms| rows (broadcast), doc length comes from a per-row "
    "size() — no second explode — and the per-doc sum ends in a "
    "TakeOrderedAndProject top-15. All inputs to the score are exact "
    "integers (tf, df, dl, N) so both engines evaluate identical "
    "doubles; ~3 shuffles total (tf agg, dl join, final top-k), each "
    "AQE-replannable.",
    tags=("text", "retrieval"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr

    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_expr("text").alias("toks"))
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    terms = toks.select(
        "doc_id", F.explode("toks").alias("term")
    ).filter(F.col("term").isin(*_BM25_TERMS))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(_BM25_K1) * (
        F.lit(1.0) - F.lit(_BM25_B) + F.lit(_BM25_B) * F.col("dl") / avgdl
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(idf * F.col("tf") * F.lit(_BM25_K1 + 1.0) / denom).alias("bm25"),
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        )
        .select("doc_id", pround("bm25", 6).alias("bm25"), "n_terms_hit")
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(15)


# ---------------------------------------------------------------------------
# Group-median imputation with audit
# ---------------------------------------------------------------------------


@register(
    "f_impute_group_median",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               value,
               substr(md5('imp|' || CAST(event_id AS VARCHAR)), 1, 1) < '2'
                   AS miss
        FROM events
    ),
    g AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN miss THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_missing,
               CAST(sum(CASE WHEN miss THEN 0 ELSE cents END) AS BIGINT)
                   AS surv_cents,
               quantile_cont(CASE WHEN miss THEN NULL ELSE value END, 0.50)
                   AS fill
        FROM s GROUP BY event_type
    )
    SELECT event_type, n_rows, n_missing,
           round(fill, 6) AS fill_value,
           round((CAST(surv_cents AS DOUBLE) / 100.0 + n_missing * fill)
                 / n_rows, 6) AS mean_after_impute
    FROM g
    """,
    doc="Group-median imputation with a per-group audit — the standard "
    "missing-value fill of a training-data pipeline, one step up from "
    "F8's constant fillna: deterministic hash-derived missingness "
    "(~12.5%, the degradation family's md5 idiom — identical rows go "
    "missing in both engines), fill = the EXACT type-7 median of each "
    "group's surviving values (Spark percentile() == DuckDB "
    "quantile_cont, the a_group_median_quartiles parity), and the audit "
    "row carries n_missing, the fill, and the post-impute mean (exact "
    "BIGINT cent sums + the shared fill double — no float drift). "
    "|event types| rows out at any corpus size. Scale note: exact "
    "per-group percentile is the right plan for bounded-cardinality "
    "group keys; for data-sized groups the constant-memory "
    "approx_percentile sketch swaps in (a_approx_sketches), same as the "
    "quartiles query documents.",
    tags=("feature", "impute"),
)
def f_impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    miss = (
        F.md5(F.concat(F.lit("imp|"), F.col("event_id").cast("string"))).substr(1, 1)
        < "2"
    )
    s = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        "value",
        miss.alias("miss"),
    )
    g = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("miss").cast("long")).cast("long").alias("n_missing"),
        F.sum(F.when(F.col("miss"), F.lit(0)).otherwise(F.col("cents")))
        .cast("long")
        .alias("surv_cents"),
        F.percentile(
            F.when(~F.col("miss"), F.col("value")), F.lit(0.5)
        ).alias("fill"),
    )
    return g.select(
        "event_type",
        "n_rows",
        "n_missing",
        pround("fill", 6).alias("fill_value"),
        pround(
            (
                F.col("surv_cents").cast("double") / F.lit(100.0)
                + F.col("n_missing") * F.col("fill")
            )
            / F.col("n_rows"),
            6,
        ).alias("mean_after_impute"),
    )
