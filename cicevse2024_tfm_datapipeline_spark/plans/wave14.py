"""Round-3 wave 14: local clustering coefficients on the dedup graph,
log-odds distinctive terms per source, rendezvous-hash shard rebalance
accounting, a train/test entity-leakage audit over the chronological
split, and a Simpson's-paradox stratified-rate screen.

Scale extensions beyond the reference pipeline surface (no reference
twin; the reference is a single-machine pandas/sklearn TFM pipeline).
Determinism contracts follow the house rules (plans/tpch_suite.py
header): selections and ranks are exact-integer or single-division
deterministic, floats are ``pround``-ed, and rankings on log-derived
scores carry exact tiebreaks (equal-count terms produce bit-identical
doubles in both engines; distinct counts differ by far more than the
engines' libm last-ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import (
    POWER_BASE_SQL,
    pround,
    power_view,
    split_sql,
    t,
)
from cicevse2024_tfm_datapipeline_spark.plans.extensions import (
    BANDS,
    NUM_HASHES,
    _band_sql,
    _PR_EDGES,
    _sig_sql,
    _TOKS,
)
from cicevse2024_tfm_datapipeline_spark.plans.registry import register


# ---------------------------------------------------------------------------
# Local clustering coefficient on the LSH candidate graph
# ---------------------------------------------------------------------------


@register(
    "g_clustering_coefficient",
    oracle=f"""
    WITH {_sig_sql()},
    bands AS ({_band_sql()}),
    {_PR_EDGES},
    deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
    tri AS (
        SELECT e1.src AS node, count(*) AS n_tri
        FROM edges e1
        JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
        JOIN pairs p ON p.doc_a = e1.dst AND p.doc_b = e2.dst
        GROUP BY 1
    )
    SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
           CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
           round(2.0 * coalesce(t.n_tri, 0) / (d.deg * (d.deg - 1)), 6)
               AS coeff
    FROM deg d LEFT JOIN tri t ON t.node = d.node
    WHERE d.deg >= 2
    ORDER BY d.deg DESC, d.node ASC LIMIT 20
    """,
    doc="Local clustering coefficient for the 20 highest-degree nodes of "
    "the MinHash-LSH candidate graph: per node, the fraction of its "
    "neighbor pairs that are themselves connected — 2*tri/(deg*(deg-1)). "
    "Near-dup clusters show coefficients near 1 (cliques); bridge "
    "documents that merely share a band key with two unrelated clusters "
    "show near 0 — the signal that separates true duplicate groups from "
    "LSH banding noise before connected components fuses them. The "
    "wedge enumeration joins each node's neighbor list against itself "
    "with dst<dst ordering and closes against the oriented (a<b) pair "
    "list — the standard degree-oriented triangle shape whose work is "
    "sum(deg^2), bounded on LSH graphs because band buckets cap degree. "
    "Selection is the exact (deg DESC, node ASC) order; the coefficient "
    "is one division of exact integers.",
    tags=("graph", "clustering", "dedup"),
)
def g_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
    )
    from cicevse2024_tfm_datapipeline_spark.operators.graph import undirect
    from cicevse2024_tfm_datapipeline_spark.operators.topk import top_k

    docs = t(spark, sf_dir, "documents")
    # three consumers (undirected edge frame twice in the wedge join,
    # oriented pairs once in the closure) — pin the candidate pairs
    pairs = lsh_candidate_pairs(
        docs, "text", "doc_id", NUM_HASHES, BANDS, 3
    ).localCheckpoint(eager=False)
    # r12 (guide §2.4, the pagerank loop-invariant-fold pattern): edges
    # has THREE consumers (deg, both wedge sides) — unpinned, the
    # union+distinct over the pair pin re-executed per branch
    edges = undirect(pairs).localCheckpoint(eager=False)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    e1 = edges.select(F.col("src").alias("node"), F.col("dst").alias("v"))
    e2 = edges.select(F.col("src").alias("node"), F.col("dst").alias("w"))
    wedges = e1.join(e2, "node").filter(F.col("v") < F.col("w"))
    closed = wedges.join(
        pairs,
        (F.col("v") == F.col("doc_a")) & (F.col("w") == F.col("doc_b")),
    )
    tri = closed.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    scored = (
        deg.join(tri, "node", "left")
        .filter(F.col("deg") >= 2)
        .select(
            "node",
            "deg",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
        )
        .withColumn(
            "coeff",
            pround(
                F.lit(2.0)
                * F.col("n_tri")
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ),
        )
    )
    return top_k(scored, [F.desc("deg"), F.asc("node")], 20)


# ---------------------------------------------------------------------------
# Distinctive terms per source (log-odds ratio with Dirichlet prior)
# ---------------------------------------------------------------------------


@register(
    "text_distinctive_terms",
    oracle=f"""
    WITH toksd AS (SELECT source, {_TOKS} AS toks FROM documents),
    tf AS (SELECT source, unnest(toks) AS term FROM toksd),
    csw AS (SELECT source, term, count(*) AS c FROM tf GROUP BY 1, 2),
    cw AS (SELECT term, sum(c) AS cwt FROM csw GROUP BY 1),
    ns AS (SELECT source, sum(c) AS nst FROM csw GROUP BY 1),
    nv AS (SELECT sum(cwt) AS n, count(*) AS v FROM cw),
    sc AS (
        SELECT s.source, s.term, s.c,
               w.cwt - s.c AS crest, ns.nst, nv.n, nv.v
        FROM csw s
        JOIN cw w USING (term)
        JOIN ns USING (source)
        CROSS JOIN nv
        WHERE s.c >= 5
    ),
    z AS (
        SELECT source, term, c,
               (ln((c + 0.5) / (nst + 0.5 * v - c - 0.5))
              - ln((crest + 0.5) / (n - nst + 0.5 * v - crest - 0.5)))
              / sqrt(1.0 / (c + 0.5) + 1.0 / (crest + 0.5)) AS z
        FROM sc
    ),
    r AS (
        SELECT source, term, c, z,
               row_number() OVER (PARTITION BY source
                                  ORDER BY z DESC, term ASC) AS rk
        FROM z
    )
    SELECT source, term, CAST(c AS BIGINT) AS c_source,
           round(z, 4) AS z_score, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 3
    """,
    doc="Distinctive terms per source via the log-odds ratio with an "
    "informative Dirichlet prior (Monroe et al.'s weighted log-odds, "
    "alpha_w = 0.5): for each source, the 3 terms whose usage rate most "
    "exceeds the rest-of-corpus rate, z-scored by the delta's variance "
    "1/(c+a) + 1/(c_rest+a) — the corpus-comparison statistic that "
    "beats raw TF-IDF for 'what makes this source different', because "
    "the prior shrinks rare-term noise and the variance term downweights "
    "small counts. All counts come from one token aggregation; the "
    "z computation is per-(source,term) arithmetic on identical exact "
    "integers in both engines (each division and ln applied in the same "
    "order), and the per-source top-3 is a PARTITIONED window with a "
    "term-name tiebreak. The c >= 5 support floor is an integer cut.",
    tags=("text", "log-odds", "distinctive"),
)
def text_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr

    csw = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(tokens_expr(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    cw = csw.groupBy("term").agg(F.sum("c").alias("cwt"))
    ns = csw.groupBy("source").agg(F.sum("c").alias("nst"))
    nv = cw.agg(F.sum("cwt").alias("n"), F.count(F.lit(1)).alias("v"))
    sc = (
        csw.filter(F.col("c") >= 5)
        .join(cw, "term")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nv))
        .select(
            "source",
            "term",
            "c",
            (F.col("cwt") - F.col("c")).alias("crest"),
            "nst",
            "n",
            "v",
        )
    )
    delta = F.log(
        (F.col("c") + 0.5) / (F.col("nst") + 0.5 * F.col("v") - F.col("c") - 0.5)
    ) - F.log(
        (F.col("crest") + 0.5)
        / (F.col("n") - F.col("nst") + 0.5 * F.col("v") - F.col("crest") - 0.5)
    )
    z = delta / F.sqrt(
        F.lit(1.0) / (F.col("c") + 0.5) + F.lit(1.0) / (F.col("crest") + 0.5)
    )
    ranked = sc.withColumn("z", z).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("source").orderBy(F.desc("z"), F.asc("term"))
        ),
    )
    return ranked.filter(F.col("rk") <= 3).select(
        "source",
        "term",
        F.col("c").cast("long").alias("c_source"),
        pround(F.col("z"), 4).alias("z_score"),
        F.col("rk").cast("long").alias("rk"),
    )


# ---------------------------------------------------------------------------
# Rendezvous-hash (HRW) shard rebalance accounting
# ---------------------------------------------------------------------------


@register(
    "a_shard_rebalance_moves",
    oracle="""
    WITH keys AS (SELECT DISTINCT user_id FROM events),
    o AS (
        SELECT user_id,
               arg_max(s, md5(CAST(user_id AS VARCHAR) || ':'
                              || CAST(s AS VARCHAR))) AS shard
        FROM keys CROSS JOIN (SELECT unnest(range(0, 8)) AS s)
        GROUP BY user_id
    ),
    n AS (
        SELECT user_id,
               arg_max(s, md5(CAST(user_id AS VARCHAR) || ':'
                              || CAST(s AS VARCHAR))) AS shard
        FROM keys CROSS JOIN (SELECT unnest(range(0, 9)) AS s)
        GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN o.shard <> n.shard THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved,
           CAST(sum(CASE WHEN o.shard <> n.shard AND n.shard = 8
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_to_new,
           round(sum(CASE WHEN o.shard <> n.shard THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS move_frac
    FROM o JOIN n USING (user_id)
    """,
    doc="Rendezvous (highest-random-weight) hashing rebalance audit: "
    "assign every distinct user to the shard with the maximal "
    "md5(user:shard) weight under 8 shards and again under 9, and count "
    "the keys that move. HRW's minimal-disruption guarantee says EVERY "
    "moved key lands on the new shard (n_moved = n_moved_to_new — the "
    "result exhibits the theorem) and the expected move fraction is "
    "1/9 — the property that makes consistent assignment the right "
    "partitioner for stateful services and shard-local caches, vs "
    "mod-N hashing which moves ~8/9 of all keys. The argmax per key is "
    "a 9-row max_by over a generated shard axis (map-side, no shuffle "
    "beyond the distinct); the weight strings are engine-portable md5.",
    tags=("A", "sharding", "rendezvous"),
)
def a_shard_rebalance_moves(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = t(spark, sf_dir, "events").select("user_id").distinct()

    def assign(n_shards: int, out: str) -> DataFrame:
        shards = spark.range(n_shards).select(F.col("id").alias("s"))
        return (
            keys.crossJoin(F.broadcast(shards))
            .select(
                "user_id",
                "s",
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("user_id").cast("string"),
                        F.col("s").cast("string"),
                    )
                ).alias("h"),
            )
            .groupBy("user_id")
            .agg(F.max_by("s", "h").alias(out))
        )

    o = assign(8, "old_shard")
    n = assign(9, "new_shard")
    joined = o.join(n, "user_id")
    moved = F.when(F.col("old_shard") != F.col("new_shard"), 1).otherwise(0)
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(moved).cast("long").alias("n_moved"),
        F.sum(
            F.when(
                (F.col("old_shard") != F.col("new_shard"))
                & (F.col("new_shard") == 8),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_moved_to_new"),
        pround(F.sum(moved) * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
            "move_frac"
        ),
    )


# ---------------------------------------------------------------------------
# Train/test entity-leakage audit over the chronological split
# ---------------------------------------------------------------------------


@register(
    "w_split_leakage_audit",
    oracle=f"""
    WITH base AS ({POWER_BASE_SQL}),
    {split_sql(0.7, 0.15)},
    tr AS (SELECT DISTINCT user_id FROM tagged WHERE split = 'train'),
    te AS (SELECT DISTINCT user_id FROM tagged WHERE split = 'test')
    SELECT CAST((SELECT count(*) FROM tr) AS BIGINT) AS n_train_users,
           CAST((SELECT count(*) FROM te) AS BIGINT) AS n_test_users,
           CAST((SELECT count(*) FROM tr JOIN te USING (user_id))
                AS BIGINT) AS n_overlap,
           round((SELECT count(*) FROM tr JOIN te USING (user_id)) * 1.0
                 / (SELECT count(*) FROM te), 6) AS overlap_rate
    """,
    doc="Entity-leakage audit of the W1 chronological split: how many "
    "users appear in BOTH the train and test partitions. A chronological "
    "split guarantees no TIME leakage but not entity independence — a "
    "user active on both sides lets a model memorize user-level "
    "idiosyncrasies, inflating test scores; this is the report that "
    "decides whether a group-aware split (partition by user) is needed. "
    "Reuses the exact reference split arithmetic (floor fractions + "
    "small-group guard) via the shared split machinery, then two "
    "distinct-user projections and one equi-join — all shuffles keyed "
    "by user_id. Output is the single audit row: side cardinalities, "
    "overlap count, and overlap rate (one exact-integer division).",
    tags=("W", "split", "leakage-audit"),
)
def w_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.split import chrono_split

    tagged = chrono_split(
        power_view(spark, sf_dir), ["attack", "state"], "ts", "event_id"
    )
    tr = tagged.filter(F.col("split") == "train").select("user_id").distinct()
    te = tagged.filter(F.col("split") == "test").select("user_id").distinct()
    ntr = tr.agg(F.count(F.lit(1)).cast("long").alias("n_train_users"))
    nte = te.agg(F.count(F.lit(1)).cast("long").alias("n_test_users"))
    nov = (
        tr.join(te, "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    return (
        ntr.crossJoin(F.broadcast(nte))
        .crossJoin(F.broadcast(nov))
        .select(
            "n_train_users",
            "n_test_users",
            "n_overlap",
            pround(
                F.col("n_overlap") * F.lit(1.0) / F.col("n_test_users"), 6
            ).alias("overlap_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Simpson's-paradox screen: pooled vs stratified rate differences
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


@register(
    "a_simpson_stratified_rates",
    oracle=f"""
    WITH base AS ({POWER_BASE_SQL}),
    b AS (
        SELECT (epoch_us(ts) // {_DAY_US} + 4) % 7 AS dow, state,
               CASE WHEN label = 'attack' THEN 1 ELSE 0 END AS y
        FROM base
    ),
    pooled AS (
        SELECT sum(CASE WHEN state = 'charging' THEN y ELSE 0 END) * 1.0
               / nullif(sum(CASE WHEN state = 'charging' THEN 1 ELSE 0 END), 0)
             - sum(CASE WHEN state = 'idle' THEN y ELSE 0 END) * 1.0
               / nullif(sum(CASE WHEN state = 'idle' THEN 1 ELSE 0 END), 0)
               AS pooled_diff
        FROM b
    ),
    st AS (
        SELECT dow,
               sum(CASE WHEN state = 'charging' THEN y ELSE 0 END) AS yc,
               sum(CASE WHEN state = 'charging' THEN 1 ELSE 0 END) AS nc,
               sum(CASE WHEN state = 'idle' THEN y ELSE 0 END) AS yi,
               sum(CASE WHEN state = 'idle' THEN 1 ELSE 0 END) AS ni
        FROM b GROUP BY 1
    )
    SELECT dow, CAST(nc + ni AS BIGINT) AS n_rows,
           round(yc * 1.0 / nullif(nc, 0), 6) AS rate_charging,
           round(yi * 1.0 / nullif(ni, 0), 6) AS rate_idle,
           round(yc * 1.0 / nullif(nc, 0) - yi * 1.0 / nullif(ni, 0), 6)
               AS diff,
           CAST(CASE WHEN (yc * 1.0 / nullif(nc, 0)
                           - yi * 1.0 / nullif(ni, 0)) * pooled_diff < 0
                     THEN 1 ELSE 0 END AS BIGINT) AS flipped,
           round(pooled_diff, 6) AS pooled_diff
    FROM st CROSS JOIN pooled
    """,
    doc="Simpson's-paradox screen: the attack rate difference between "
    "charging and idle states, pooled over the corpus AND within each "
    "day-of-week stratum, with a flag for strata whose difference has "
    "the OPPOSITE sign from the pooled difference — the aggregation "
    "reversal that makes pooled rates misleading when strata sizes are "
    "imbalanced (the canonical screen before reporting any pooled rate "
    "comparison). One grouped aggregation builds all stratum cells, the "
    "pooled difference rides as a broadcast scalar, and every rate is "
    "one division of exact integers with nullif guards (ANSI-safe in "
    "both engines). The flip flag compares the product's sign — "
    "bit-identical doubles on both sides, so the integer flag cannot "
    "disagree.",
    tags=("A", "simpson", "stratified"),
)
def a_simpson_stratified_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.plans.wave5 import _US

    b = power_view(spark, sf_dir).select(
        (((F.expr(_US) / F.lit(_DAY_US)).cast("long") + 4) % 7).alias("dow"),
        "state",
        F.when(F.col("label") == "attack", 1).otherwise(0).alias("y"),
    )
    yc_all = F.sum(F.when(F.col("state") == "charging", F.col("y")).otherwise(0))
    nc_all = F.sum(F.when(F.col("state") == "charging", 1).otherwise(0))
    yi_all = F.sum(F.when(F.col("state") == "idle", F.col("y")).otherwise(0))
    ni_all = F.sum(F.when(F.col("state") == "idle", 1).otherwise(0))
    pooled = b.agg(
        (
            yc_all * F.lit(1.0) / F.nullif(nc_all, F.lit(0))
            - yi_all * F.lit(1.0) / F.nullif(ni_all, F.lit(0))
        ).alias("pooled_diff")
    )
    st = b.groupBy("dow").agg(
        yc_all.alias("yc"),
        nc_all.alias("nc"),
        yi_all.alias("yi"),
        ni_all.alias("ni"),
    )
    rc = F.col("yc") * F.lit(1.0) / F.nullif(F.col("nc"), F.lit(0))
    ri = F.col("yi") * F.lit(1.0) / F.nullif(F.col("ni"), F.lit(0))
    return st.crossJoin(F.broadcast(pooled)).select(
        "dow",
        (F.col("nc") + F.col("ni")).cast("long").alias("n_rows"),
        pround(rc, 6).alias("rate_charging"),
        pround(ri, 6).alias("rate_idle"),
        pround(rc - ri, 6).alias("diff"),
        F.when((rc - ri) * F.col("pooled_diff") < 0, 1)
        .otherwise(0)
        .cast("long")
        .alias("flipped"),
        pround(F.col("pooled_diff"), 6).alias("pooled_diff"),
    )
