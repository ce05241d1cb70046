"""Round-4 wave 22: engine-grade building blocks — TextRank keyword
extraction (PageRank over the word co-occurrence graph), CUPED variance
reduction for A/B metrics, incremental JOIN-view maintenance with the
delta-join identity asserted in the result, a bloom runtime-filter join
(the engine-level semi-join reduction), a product-quantization codebook
audit, and a Merkle-tree corpus content digest.

Scale extensions beyond the reference pipeline surface. House
determinism rules: md5-derived hashes and centroids, exact BIGINT
moments with single closing divisions, 1e-6-ticked distortions, string
aggregation in explicit key order for digests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.extensions import (
    _pr_iter_sql,
    _TOKS,
)
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# TextRank keyword extraction
# ---------------------------------------------------------------------------


@register(
    "text_textrank_keywords",
    oracle=f"""
    WITH toksd AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    adjp AS (
        SELECT unnest(list_transform(range(1, len(toks)),
                   i -> {{'a': toks[i], 'b': toks[i + 1]}})) AS p
        FROM toksd
    ),
    pairs AS (
        SELECT DISTINCT least(p.a, p.b) AS wa, greatest(p.a, p.b) AS wb
        FROM adjp WHERE p.a <> p.b
    ),
    edges AS (
        SELECT wa AS src, wb AS dst FROM pairs
        UNION SELECT wb, wa FROM pairs
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nt AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1 AS DOUBLE) / nt.n AS rank FROM nodes, nt),
    {_pr_iter_sql(1)},
    {_pr_iter_sql(2)},
    {_pr_iter_sql(3)}
    SELECT node AS keyword, rank_rounded, rk FROM (
        SELECT node, round(rank, 6) AS rank_rounded,
               row_number() OVER (ORDER BY round(rank, 6) DESC, node ASC) AS rk
        FROM r3) q
    WHERE rk <= 10
    """,
    doc="TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank "
    "over the corpus word co-occurrence graph — an undirected edge per "
    "distinct adjacent-token pair — with 3 unrolled power iterations "
    "(operators/graph.pagerank_fixed, the same fixed-iteration trick "
    "that makes g_pagerank_lsh fully oracle-checkable). Edge volume is "
    "bounded by observed bigram vocabulary, not corpus size; per "
    "iteration the plan is one edge-rank equi-join + groupBy — the "
    "canonical distributed PageRank shape. Top-10 cut on ROUNDED ranks "
    "with a keyword tiebreak so both engines pick the same boundary.",
    tags=("text", "graph", "pagerank"),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.graph import pagerank_fixed
    from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr
    from cicevse2024_tfm_datapipeline_spark.operators.topk import top_k

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(tokens_expr("text").alias("toks"))
    adj = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))"
            )
        ).alias("p")
    ).filter(F.col("p.a") != F.col("p.b"))
    pairs = adj.select(
        F.least("p.a", "p.b").alias("wa"), F.greatest("p.a", "p.b").alias("wb")
    ).distinct()
    edges = pairs.select(F.col("wa").alias("src"), F.col("wb").alias("dst")).unionByName(
        pairs.select(F.col("wb").alias("src"), F.col("wa").alias("dst"))
    )
    rank = pagerank_fixed(edges, iters=3, damping=0.85)
    scored = rank.select(
        F.col("node").alias("keyword"), pround("rank", 6).alias("rank_rounded")
    )
    top = top_k(scored, [F.desc("rank_rounded"), F.asc("keyword")], 10)
    b = top.select(
        F.col("keyword").alias("__bk"), F.col("rank_rounded").alias("__br")
    )
    earlier = (F.col("__br") > F.col("rank_rounded")) | (
        (F.col("__br") == F.col("rank_rounded")) & (F.col("__bk") < F.col("keyword"))
    )
    return (
        top.join(b, earlier, "left")
        .groupBy("keyword", "rank_rounded")
        .agg((F.count("__bk") + 1).cast("long").alias("rk"))
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction
# ---------------------------------------------------------------------------

_CUPED_SPLIT_US = 1_705_363_200_000_000  # 2024-01-16 UTC


@register(
    "a_cuped_adjustment",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN epoch_us(ts) < {_CUPED_SPLIT_US}
                             THEN CAST(floor(value) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN epoch_us(ts) >= {_CUPED_SPLIT_US}
                             THEN CAST(floor(value) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    assigned AS (
        SELECT x, y,
               CAST(('0x' || substr(md5('cuped|' || CAST(user_id AS VARCHAR)),
                                    1, 8)) AS BIGINT) % 2 AS grp
        FROM per_user
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
               CAST(sum(CASE WHEN grp = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_t,
               CAST(sum(CASE WHEN grp = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_t,
               CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
               CAST(sum(CASE WHEN grp = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_c,
               CAST(sum(CASE WHEN grp = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_c
        FROM assigned
    )
    SELECT n_t AS n_treat, n_c AS n_ctrl,
           round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 4) AS theta,
           round(sy_t * 1.0 / n_t - sy_c * 1.0 / n_c, 4) AS raw_diff,
           round((sy_t * 1.0 / n_t - sy_c * 1.0 / n_c)
                 - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)
                   * (sx_t * 1.0 / n_t - sx_c * 1.0 / n_c), 4) AS adjusted_diff,
           round(((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 4)
               AS var_reduction
    FROM m
    """,
    doc="CUPED variance reduction (Deng et al. 2013) for an A/B metric: "
    "per-user pre-period covariate x and experiment-period metric y "
    "(exact BIGINT sums of floor(value) split at a fixed epoch "
    "boundary), deterministic md5 treatment assignment, theta = "
    "cov(x,y)/var(x) from integer moments, and the adjusted treatment "
    "effect y_adj = y - theta*(x - x_bar). var_reduction = corr^2 is "
    "the fraction of metric variance the covariate removes — the "
    "experiment-sensitivity win. ONE aggregation pass produces every "
    "moment (global + per-arm conditional sums); all downstream algebra "
    "is closed-form on identical operands in both engines.",
    tags=("A", "ab_test", "cuped"),
)
def a_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.plans.wave5 import _US

    ev = t(spark, sf_dir, "events")
    es = F.expr(_US)  # NTZ ts -> exact integer micros, lockstep epoch_us
    fv = F.floor("value").cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(es < _CUPED_SPLIT_US, fv).otherwise(0)).cast("long").alias("x"),
        F.sum(F.when(es >= _CUPED_SPLIT_US, fv).otherwise(0)).cast("long").alias("y"),
    )
    grp = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("cuped|"), F.col("user_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 2
    )
    a = per_user.select("x", "y", grp.alias("grp"))
    m = a.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum((F.col("grp") == 1).cast("long")).cast("long").alias("n_t"),
        F.sum(F.when(F.col("grp") == 1, F.col("x")).otherwise(0)).cast("long").alias("sx_t"),
        F.sum(F.when(F.col("grp") == 1, F.col("y")).otherwise(0)).cast("long").alias("sy_t"),
        F.sum((F.col("grp") == 0).cast("long")).cast("long").alias("n_c"),
        F.sum(F.when(F.col("grp") == 0, F.col("x")).otherwise(0)).cast("long").alias("sx_c"),
        F.sum(F.when(F.col("grp") == 0, F.col("y")).otherwise(0)).cast("long").alias("sy_c"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    theta = (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)
    raw = F.col("sy_t") * 1.0 / F.col("n_t") - F.col("sy_c") * 1.0 / F.col("n_c")
    xdiff = F.col("sx_t") * 1.0 / F.col("n_t") - F.col("sx_c") * 1.0 / F.col("n_c")
    return m.select(
        F.col("n_t").alias("n_treat"),
        F.col("n_c").alias("n_ctrl"),
        pround(theta, 4).alias("theta"),
        pround(raw, 4).alias("raw_diff"),
        pround(raw - theta * xdiff, 4).alias("adjusted_diff"),
        pround(
            ((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)),
            4,
        ).alias("var_reduction"),
    )


# ---------------------------------------------------------------------------
# Incremental JOIN-view maintenance (delta-join identity)
# ---------------------------------------------------------------------------

_OC = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


@register(
    "w_incremental_join_view",
    oracle=f"""
    WITH o AS (
        SELECT o_custkey, {_OC} AS cents,
               CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END AS is_delta
        FROM orders
    ),
    c AS (
        SELECT c_custkey, c_nationkey,
               CASE WHEN c_custkey % 17 = 0 THEN 1 ELSE 0 END AS is_delta
        FROM customer
    ),
    j AS (
        SELECT n.n_name, o.cents, o.is_delta AS od, c.is_delta AS cd
        FROM o JOIN c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    merged AS (
        SELECT n_name,
               CAST(sum(CASE WHEN od = 0 AND cd = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS base_orders,
               CAST(sum(CASE WHEN od = 1 OR cd = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS delta_orders,
               CAST(count(*) AS BIGINT) AS merged_orders,
               CAST(sum(cents) AS BIGINT) AS merged_cents
        FROM j GROUP BY n_name
    ),
    full_v AS (
        SELECT n.n_name, CAST(count(*) AS BIGINT) AS f_orders,
               CAST(sum({_OC}) AS BIGINT) AS f_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    )
    SELECT m.n_name, m.base_orders, m.delta_orders, m.merged_orders,
           m.merged_cents,
           CAST(CASE WHEN m.merged_orders = f.f_orders
                      AND m.merged_cents = f.f_cents
                     THEN 1 ELSE 0 END AS BIGINT) AS consistent
    FROM merged m JOIN full_v f USING (n_name)
    """,
    doc="Incremental JOIN-view maintenance: the per-nation revenue view "
    "V = orders |X| customer |X| nation is maintained under "
    "simultaneous deltas on BOTH join sides via the delta-join identity "
    "dV = dO|X|C_old + O_old|X|dC + dO|X|dC; the merged result is "
    "asserted equal to a full recompute IN the checked row (consistent "
    "flag per nation) — the companion to a_incremental_rollup_merge for "
    "joins, i.e. the streaming-materialized-view contract. Deltas are "
    "deterministic key slices; revenue is exact integer cents. At scale "
    "each delta term joins a small changed slice against the other "
    "side's bucketed base — never a full recompute.",
    tags=("W", "incremental", "view"),
)
def w_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    o = orders.select(
        "o_custkey",
        cents.alias("cents"),
        ((F.col("o_orderkey") % 13) == 0).cast("int").alias("od"),
    )
    c = cust.select(
        "c_custkey",
        "c_nationkey",
        ((F.col("c_custkey") % 17) == 0).cast("int").alias("cd"),
    )

    def view(o_part: DataFrame, c_part: DataFrame) -> DataFrame:
        return (
            o_part.join(c_part, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).cast("long").alias("orders"),
                F.sum("cents").cast("long").alias("cents"),
            )
        )

    # the four delta-join terms, materialized separately and MERGED —
    # the identity under test (not one big join with flags)
    v0 = view(o.filter(F.col("od") == 0), c.filter(F.col("cd") == 0))
    d1 = view(o.filter(F.col("od") == 1), c.filter(F.col("cd") == 0))
    d2 = view(o.filter(F.col("od") == 0), c.filter(F.col("cd") == 1))
    d3 = view(o.filter(F.col("od") == 1), c.filter(F.col("cd") == 1))
    base = v0.select(
        "n_name", F.col("orders").alias("b_orders"), F.col("cents").alias("b_cents")
    )
    deltas = (
        d1.unionByName(d2)
        .unionByName(d3)
        .groupBy("n_name")
        .agg(
            F.sum("orders").cast("long").alias("d_orders"),
            F.sum("cents").cast("long").alias("d_cents"),
        )
    )
    merged = (
        base.join(deltas, "n_name", "full")
        .select(
            "n_name",
            F.coalesce("b_orders", F.lit(0)).alias("base_orders"),
            F.coalesce("d_orders", F.lit(0)).alias("delta_orders"),
            (F.coalesce("b_orders", F.lit(0)) + F.coalesce("d_orders", F.lit(0)))
            .cast("long")
            .alias("merged_orders"),
            (F.coalesce("b_cents", F.lit(0)) + F.coalesce("d_cents", F.lit(0)))
            .cast("long")
            .alias("merged_cents"),
        )
    )
    full_v = view(o, c).select(
        "n_name", F.col("orders").alias("f_orders"), F.col("cents").alias("f_cents")
    )
    return merged.join(full_v, "n_name").select(
        "n_name",
        "base_orders",
        "delta_orders",
        "merged_orders",
        "merged_cents",
        (
            (F.col("merged_orders") == F.col("f_orders"))
            & (F.col("merged_cents") == F.col("f_cents"))
        )
        .cast("long")
        .alias("consistent"),
    )


# ---------------------------------------------------------------------------
# Bloom runtime-filter join
# ---------------------------------------------------------------------------

_BRF_M = 4096
_BRF_K = 4
_BRF_TAG = "bloomrf"
_REV10K = "CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)"


@register(
    "j_bloom_runtime_filter",
    oracle=f"""
    WITH small AS (SELECT p_partkey FROM part WHERE p_size = 15),
    cpos AS (
        SELECT DISTINCT
               CAST(p.pos >> 5 AS INT) AS word_idx,
               (CAST(1 AS BIGINT) << CAST(p.pos & 31 AS INT)) AS bit
        FROM small CROSS JOIN range(0, {_BRF_K}) i
        CROSS JOIN LATERAL (
            SELECT ('0x' || substr(md5('{_BRF_TAG}|' || CAST(i.range AS VARCHAR)
                        || '|' || CAST(p_partkey AS VARCHAR)), 1, 8))::BIGINT
                   % {_BRF_M} AS pos
        ) p
    ),
    bitmap AS (SELECT word_idx, bit_or(bit) AS word FROM cpos GROUP BY 1),
    probe AS (SELECT l_partkey, {_REV10K} AS rev FROM lineitem),
    keys AS (SELECT DISTINCT l_partkey FROM probe),
    kpos AS (
        SELECT l_partkey,
               ('0x' || substr(md5('{_BRF_TAG}|' || CAST(i.range AS VARCHAR)
                    || '|' || CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT
                   % {_BRF_M} AS pos
        FROM keys CROSS JOIN range(0, {_BRF_K}) i
    ),
    passf AS (
        SELECT p.l_partkey,
               min(CASE WHEN coalesce(b.word, 0)
                             & (CAST(1 AS BIGINT) << CAST(p.pos & 31 AS INT)) <> 0
                        THEN 1 ELSE 0 END) AS hit
        FROM kpos p
        LEFT JOIN bitmap b ON CAST(p.pos >> 5 AS INT) = b.word_idx
        GROUP BY 1
    ),
    passed AS (
        SELECT pr.l_partkey, pr.rev
        FROM probe pr JOIN passf f USING (l_partkey) WHERE f.hit = 1
    ),
    matched AS (
        SELECT p.rev FROM passed p JOIN small s
          ON p.l_partkey = s.p_partkey
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM small) AS n_parts,
           (SELECT CAST(count(*) AS BIGINT) FROM passed) AS n_bloom_pass,
           CAST(count(*) AS BIGINT) AS n_matched,
           (SELECT CAST(count(*) AS BIGINT) FROM passed)
               - CAST(count(*) AS BIGINT) AS n_false_pos,
           CAST(sum(rev) AS BIGINT) AS revenue_e4
    FROM matched
    """,
    doc="Bloom runtime-filter join — the engine technique Spark applies "
    "as 'runtime row-group filtering' (spark.sql.optimizer.runtime."
    "bloomFilter), built explicitly so its guarantee is checkable: the "
    "small join side (parts of one size) collapses to a 128-word bloom "
    "bitmap (operators/dedup.bloom_bitmap — md5 k-hash, engine-exact); "
    "the fact side pre-filters on the broadcast bitmap BEFORE the real "
    "join, so at 100 TB the shuffle carries only bloom-passing rows. "
    "No false negatives by construction (asserted: matched revenue "
    "equals the direct join's); the measured false-positive count is "
    "in the result — the m/n/k sizing feedback.",
    tags=("J", "bloom", "runtime_filter"),
)
def j_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.dedup import (
        bloom_bitmap,
        bloom_might_contain,
    )

    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    small = part.filter(F.col("p_size") == 15).select("p_partkey")
    bitmap = bloom_bitmap(
        small, F.col("p_partkey").cast("string"), m_bits=_BRF_M, k=_BRF_K, tag=_BRF_TAG
    )
    probe = li.select(
        "l_partkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("rev"),
    )
    # bloom-check each DISTINCT join key once (the key domain is bounded
    # by the part table), then flag fact rows by key — one probe per key
    # instead of one per fact row, and the fact side never re-shuffles
    keys = probe.select("l_partkey").distinct()
    flagged_keys = bloom_might_contain(
        keys,
        bitmap,
        "l_partkey",
        F.col("l_partkey").cast("string"),
        m_bits=_BRF_M,
        k=_BRF_K,
        tag=_BRF_TAG,
    ).filter(F.col("__might_contain")).select("l_partkey")
    passed = probe.join(F.broadcast(flagged_keys), "l_partkey")
    matched = passed.join(
        F.broadcast(small), passed.l_partkey == small.p_partkey
    ).select("rev")
    n_parts = small.agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    n_pass = passed.agg(F.count(F.lit(1)).cast("long").alias("n_bloom_pass"))
    mt = matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum("rev").cast("long").alias("revenue_e4"),
    )
    return (
        mt.crossJoin(F.broadcast(n_parts))
        .crossJoin(F.broadcast(n_pass))
        .select(
            "n_parts",
            "n_bloom_pass",
            "n_matched",
            (F.col("n_bloom_pass") - F.col("n_matched")).alias("n_false_pos"),
            "revenue_e4",
        )
    )


# ---------------------------------------------------------------------------
# Product-quantization codebook audit
# ---------------------------------------------------------------------------

_PQ_SUBS = 4
_PQ_SUBDIM = 16
_PQ_CELLS = 8


@register(
    "sim_pq_codebook_audit",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (
        SELECT CAST(s.range AS INT) AS sub, CAST(c.range AS INT) AS cell,
               list_transform(range(0, {_PQ_SUBDIM}), d ->
                   (('0x' || substr(md5('pq' || CAST(s.range AS VARCHAR) || '|'
                        || CAST(c.range AS VARCHAR)
                        || '|' || CAST(d AS VARCHAR)), 1, 8))::BIGINT
                    / CAST(4294967296.0 AS DOUBLE)) * 2.0 - 1.0) AS centroid
        FROM range(0, {_PQ_SUBS}) s CROSS JOIN range(0, {_PQ_CELLS}) c
    ),
    sub AS (
        SELECT vec_id, CAST(s.range AS INT) AS sub,
               list_slice(v, s.range * {_PQ_SUBDIM} + 1,
                          s.range * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS sv
        FROM e CROSS JOIN range(0, {_PQ_SUBS}) s
    ),
    adist AS (
        SELECT sub.vec_id, sub.sub, c.cell,
               list_reduce(list_transform(range(1, {_PQ_SUBDIM} + 1),
                   i -> (sv[i] - centroid[i]) * (sv[i] - centroid[i])),
                   (x, y) -> x + y) AS d
        FROM sub JOIN cents c USING (sub)
    ),
    assigned AS (
        SELECT vec_id, sub, cell,
               CAST(floor(d * 1000000 + 0.5) AS BIGINT) AS d_ticks
        FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                         ORDER BY d ASC, cell ASC) AS rn
            FROM adist) WHERE rn = 1
    )
    SELECT sub AS subspace, cell,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(CAST(sum(d_ticks) AS DOUBLE) / 1000000.0 / count(*), 6)
               AS mean_sq_error
    FROM assigned GROUP BY sub, cell
    """,
    doc="Product-quantization codebook audit: each 64-dim vector splits "
    "into 4 subspaces of 16 dims; each subvector is assigned its "
    "nearest of 8 per-subspace centroids (the deterministic md5 "
    "centroid fixture — operators.similarity.fixed_centroid_rows, tag "
    "'pq<s>', same offline-quantizer discipline as sim_ivf_topk). The "
    "audit reports per-(subspace, cell) occupancy and mean quantization "
    "distortion (1e-6-ticked exact sums) — empty/overloaded cells and "
    "high-distortion subspaces are exactly what decides whether a PQ "
    "index is shippable. Assignment is a per-row fold over a literal "
    "32-row codebook: no join, no shuffle beyond the final tiny "
    "aggregate; the same plan scores a 100-TB corpus embarrassingly "
    "parallel.",
    tags=("similarity", "pq", "quantization"),
)
def sim_pq_codebook_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.similarity import (
        as_double_array,
        fixed_centroid_rows,
    )

    emb = t(spark, sf_dir, "embeddings")
    v = as_double_array("embedding")

    def sub_assign(s: int) -> Column:
        cents = fixed_centroid_rows(_PQ_CELLS, _PQ_SUBDIM, tag=f"pq{s}")
        sv = F.slice(v, s * _PQ_SUBDIM + 1, _PQ_SUBDIM)
        dist_structs = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            sv,
                            F.array(*[F.lit(float(x)) for x in cvec]).cast(
                                "array<double>"
                            ),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    F.lit(cell).cast("int").alias("cell"),
                )
                for cell, cvec in cents
            ]
        )
        best = F.array_min(dist_structs)
        return F.struct(
            F.lit(s).cast("int").alias("subspace"),
            best.getField("cell").alias("cell"),
            F.floor(best.getField("d") * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("d_ticks"),
        )

    assigned = emb.select(
        F.explode(F.array(*[sub_assign(s) for s in range(_PQ_SUBS)])).alias("a")
    ).select("a.subspace", "a.cell", "a.d_ticks")
    return assigned.groupBy("subspace", "cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        pround(
            F.sum("d_ticks").cast("double") / 1000000.0 / F.count(F.lit(1)), 6
        ).alias("mean_sq_error"),
    )


# ---------------------------------------------------------------------------
# Merkle corpus content digest
# ---------------------------------------------------------------------------

_MERKLE_FANOUT = 64


@register(
    "a_merkle_corpus_digest",
    oracle=f"""
    WITH l0 AS (
        SELECT doc_id, md5(text) AS dg,
               doc_id // {_MERKLE_FANOUT} AS b1
        FROM documents
    ),
    l1 AS (
        SELECT b1, md5(string_agg(dg, '' ORDER BY doc_id)) AS dg,
               b1 // {_MERKLE_FANOUT} AS b2
        FROM l0 GROUP BY b1
    ),
    l2 AS (
        SELECT b2, md5(string_agg(dg, '' ORDER BY b1)) AS dg
        FROM l1 GROUP BY b2
    )
    SELECT md5(string_agg(dg, '' ORDER BY b2)) AS root_digest,
           (SELECT CAST(count(*) AS BIGINT) FROM l0) AS n_docs,
           (SELECT CAST(count(*) AS BIGINT) FROM l1) AS n_l1_nodes,
           CAST(count(*) AS BIGINT) AS n_l2_nodes
    FROM l2
    """,
    doc="Merkle-tree corpus content digest — the content-addressable "
    "version id of a dataset (what lakehouse snapshots and data-lineage "
    "attestation hash): per-doc md5 leaves combine in fixed fanout-64 "
    "groups through two intermediate levels to one root digest, every "
    "concatenation in explicit key order so the root is bit-identical "
    "in any engine and any partitioning. Changing ONE document changes "
    "the root while recomputing only its log-fanout path at ingest "
    "time. Fanout-64 groups keep every aggregation bounded (no "
    "collect-everything digest); depth grows logarithmically — 3 levels "
    "covers 64^3 docs, production adds levels, never group width.",
    tags=("A", "merkle", "lineage"),
)
def a_merkle_corpus_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    l0 = docs.select(
        "doc_id",
        F.md5("text").alias("dg"),
        F.floor(F.col("doc_id") / _MERKLE_FANOUT).cast("long").alias("b1"),
    )

    # each level: md5 of the children's digests concatenated in explicit
    # child-key order (array_sort on (key, dg) structs = ORDER BY key)
    l1 = (
        l0.groupBy("b1")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("doc_id", "dg"))),
                        lambda x: x.getField("dg"),
                    ),
                    "",
                )
            ).alias("dg")
        )
        .select("b1", "dg", F.floor(F.col("b1") / _MERKLE_FANOUT).cast("long").alias("b2"))
    )
    l2 = l1.groupBy("b2").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("b1", "dg"))),
                    lambda x: x.getField("dg"),
                ),
                "",
            )
        ).alias("dg")
    )
    root = l2.agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("b2", "dg"))),
                    lambda x: x.getField("dg"),
                ),
                "",
            )
        ).alias("root_digest"),
        F.count(F.lit(1)).cast("long").alias("n_l2_nodes"),
    )
    n0 = l0.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    n1 = l1.agg(F.count(F.lit(1)).cast("long").alias("n_l1_nodes"))
    return (
        root.crossJoin(F.broadcast(n0))
        .crossJoin(F.broadcast(n1))
        .select("root_digest", "n_docs", "n_l1_nodes", "n_l2_nodes")
    )
