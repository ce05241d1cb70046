"""Round-4 wave 26: retrieval-quality metric battery (nDCG@10 / MRR /
recall@10) over the exact cosine ranking, a k-anonymity / l-diversity
privacy audit of a released join table, and DoReMi-style domain mixture
reweighting (excess-unigram-NLL exponential weights).

Scale extensions beyond the reference pipeline surface. House rules:
per-rank discount factors are precomputed integer tick literals (no
cross-engine log2 at query time), per-query/per-domain quantities sum as
BIGINT/DECIMAL(38,0) ticks before any division, closing expressions are
identical double arithmetic on identical operands, and the only windows
are partitioned per-query top-k ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.similarity import brute_force_topk
from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr
from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.extensions import _DOT, _NQ, _NV, _TOKS
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Retrieval-quality metrics: nDCG@10, MRR@10, recall@10
# ---------------------------------------------------------------------------

_K = 10
#: 1e6-tick DCG discount per rank i (floor(1e6/log2(i+1)+0.5)) and its
#: prefix sums (ideal DCG for m relevant hits) — computed once in Python
#: and embedded as identical literals in BOTH engines, so no runtime
#: log2 can diverge.
_DCG_TICKS = [1000000, 630930, 500000, 430677, 386853, 356207, 333333, 315465, 301030, 289065]
_IDCG_CUM = [1000000, 1630930, 2130930, 2561607, 2948460, 3304667, 3638000, 3953465, 4254495, 4543560]
_DCG_SQL = "[" + ", ".join(str(v) for v in _DCG_TICKS) + "]"
_IDCG_SQL = "[" + ", ".join(str(v) for v in _IDCG_CUM) + "]"


@register(
    "sim_ranking_metrics",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv, label AS q_label
          FROM e WHERE vec_id < 20),
    scored AS (
        SELECT q.query_id, q.q_label, c.vec_id AS neighbor_id,
               c.label AS n_label, {_DOT} / ({_NQ} * {_NV}) AS cosine
        FROM e c, q WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC)
                      AS rnk
        FROM scored
    ),
    top AS (SELECT * FROM ranked WHERE rnk <= {_K}),
    hist AS (SELECT label, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1),
    perq AS (
        SELECT t.query_id, t.q_label,
               CAST(sum(CASE WHEN t.n_label = t.q_label
                             THEN {_DCG_SQL}[t.rnk] ELSE 0 END) AS BIGINT)
                   AS dcg_ticks,
               min(CASE WHEN t.n_label = t.q_label THEN t.rnk END)
                   AS first_rel,
               CAST(sum(CASE WHEN t.n_label = t.q_label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rel_top
        FROM top t GROUP BY 1, 2
    ),
    wrel AS (
        SELECT p.*, h.cnt - 1 AS n_rel
        FROM perq p JOIN hist h ON h.label = p.q_label
    )
    SELECT query_id, CAST(q_label AS BIGINT) AS q_label,
           CAST(n_rel AS BIGINT) AS n_rel,
           CAST(n_rel_top AS BIGINT) AS n_rel_top,
           round(CASE WHEN n_rel > 0
                      THEN CAST(dcg_ticks AS DOUBLE)
                           / {_IDCG_SQL}[CAST(least({_K}, n_rel) AS INT)]
                      ELSE 0.0 END, 6) AS ndcg10,
           round(coalesce(1.0 / first_rel, 0.0), 6) AS rr10,
           round(CASE WHEN n_rel > 0
                      THEN CAST(n_rel_top AS DOUBLE) / n_rel
                      ELSE 0.0 END, 6) AS recall10
    FROM wrel
    """,
    doc="Retrieval-quality metric battery per query: nDCG@10, reciprocal "
    "rank and recall@10 of the exact cosine ranking, graded against "
    "label agreement. The DCG discounts and ideal-DCG prefix sums are "
    "precomputed 1e6-tick integer literals shared by both engines, so "
    "every per-query metric is a ratio of exact integers; the relevant-"
    "pool size comes from the label histogram (|label|-sized frame), "
    "not a second pass over the pairs. The ranking itself reuses the "
    "broadcast-queries brute-force scan — candidates never shuffle; "
    "per-query ranks are a partitioned window over k*|queries| rows. "
    "This is the eval harness a retrieval/embedding pipeline grades "
    "index changes with before shipping them at corpus scale.",
    tags=("similarity", "eval", "ranking"),
)
def sim_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    topk = brute_force_topk(emb, queries, "vec_id", "embedding", k=_K)
    qlab = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    ).filter(F.col("query_id") < 20)
    nlab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    hits = (
        topk.join(F.broadcast(qlab), "query_id")
        .join(nlab, "neighbor_id")
    )
    rel = F.col("n_label") == F.col("q_label")
    perq = hits.groupBy("query_id", "q_label").agg(
        F.sum(
            F.when(rel, F.element_at(F.lit(_DCG_TICKS), F.col("rank").cast("int")))
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("dcg_ticks"),
        F.min(F.when(rel, F.col("rank"))).alias("first_rel"),
        F.sum(rel.cast("int")).cast("long").alias("n_rel_top"),
    )
    hist = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wrel = perq.join(
        F.broadcast(hist), perq["q_label"] == hist["label"]
    ).withColumn("n_rel", F.col("cnt") - 1)
    idcg = F.element_at(
        F.lit(_IDCG_CUM), F.least(F.lit(_K), F.col("n_rel")).cast("int")
    )
    return wrel.select(
        "query_id",
        F.col("q_label").cast("long").alias("q_label"),
        F.col("n_rel").cast("long").alias("n_rel"),
        F.col("n_rel_top").cast("long").alias("n_rel_top"),
        pround(
            F.when(
                F.col("n_rel") > 0,
                F.col("dcg_ticks").cast("double") / idcg,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ndcg10"),
        pround(
            F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)), 6
        ).alias("rr10"),
        pround(
            F.when(
                F.col("n_rel") > 0,
                F.col("n_rel_top").cast("double") / F.col("n_rel"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("recall10"),
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity privacy audit
# ---------------------------------------------------------------------------


@register(
    "p_k_anonymity_audit",
    oracle="""
    WITH rel AS (
        SELECT c.c_nationkey AS nat, c.c_mktsegment AS seg,
               CAST(year(o.o_orderdate) AS BIGINT) AS yr,
               o.o_orderpriority AS sens
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    grp AS (
        SELECT nat, seg, yr, CAST(count(*) AS BIGINT) AS k,
               CAST(count(DISTINCT sens) AS BIGINT) AS l
        FROM rel GROUP BY 1, 2, 3
    ),
    tot AS (
        SELECT CAST(sum(k) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(min(k) AS BIGINT) AS min_k,
               CAST(min(l) AS BIGINT) AS min_l,
               CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS groups_l_below_3
        FROM grp
    ),
    th AS (SELECT * FROM (VALUES (2), (5), (10)) AS v(k_threshold)),
    risk AS (
        SELECT th.k_threshold,
               CAST(sum(CASE WHEN g.k < th.k_threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS groups_failing,
               CAST(sum(CASE WHEN g.k < th.k_threshold THEN g.k ELSE 0 END)
                    AS BIGINT) AS rows_at_risk
        FROM grp g CROSS JOIN th GROUP BY 1
    )
    SELECT CAST(r.k_threshold AS BIGINT) AS k_threshold,
           t.n_groups, r.groups_failing, r.rows_at_risk,
           round(CAST(r.rows_at_risk AS DOUBLE) / t.n_rows, 6)
               AS frac_rows_at_risk,
           t.min_k, t.min_l, t.groups_l_below_3
    FROM risk r CROSS JOIN tot t
    """,
    doc="k-anonymity / l-diversity audit of a released join table "
    "(orders enriched with customer attributes): quasi-identifier = "
    "(nation, market segment, order year), sensitive attribute = order "
    "priority. Per QI-group size k and distinct-sensitive count l come "
    "from ONE map-side-combined groupBy; the k in {2,5,10} risk rows "
    "(groups failing, rows re-identifiable, fraction at risk) are "
    "conditional sums inside a single scalar aggregate over the group "
    "frame — no threshold cross join ever touches row-scale data, so "
    "the audit costs one equi-join plus one shuffle at any corpus "
    "size. This is the release gate a privacy-aware pipeline runs "
    "before publishing joined training tables.",
    tags=("profile", "privacy"),
)
def p_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    rel = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.col("o_orderpriority").alias("sens"),
    )
    grp = rel.groupBy("nat", "seg", "yr").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.countDistinct("sens").cast("long").alias("l"),
    )
    aggs = [
        F.sum("k").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("k").cast("long").alias("min_k"),
        F.min("l").cast("long").alias("min_l"),
        F.sum((F.col("l") < 3).cast("int")).cast("long").alias("groups_l_below_3"),
    ]
    for kth in (2, 5, 10):
        aggs += [
            F.sum((F.col("k") < kth).cast("int"))
            .cast("long")
            .alias(f"gf_{kth}"),
            F.sum(F.when(F.col("k") < kth, F.col("k")).otherwise(0))
            .cast("long")
            .alias(f"rr_{kth}"),
        ]
    stats = grp.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(kth).cast("long").alias("k_threshold"),
                F.col(f"gf_{kth}").alias("groups_failing"),
                F.col(f"rr_{kth}").alias("rows_at_risk"),
            )
            for kth in (2, 5, 10)
        ]
    )
    exploded = stats.select(
        "n_rows", "n_groups", "min_k", "min_l", "groups_l_below_3",
        F.explode(rows).alias("r"),
    )
    return exploded.select(
        F.col("r.k_threshold").alias("k_threshold"),
        "n_groups",
        F.col("r.groups_failing").alias("groups_failing"),
        F.col("r.rows_at_risk").alias("rows_at_risk"),
        pround(F.col("r.rows_at_risk").cast("double") / F.col("n_rows"), 6).alias(
            "frac_rows_at_risk"
        ),
        "min_k",
        "min_l",
        "groups_l_below_3",
    )


# ---------------------------------------------------------------------------
# DoReMi-style domain mixture reweighting
# ---------------------------------------------------------------------------


@register(
    "sample_doremi_weights",
    oracle=f"""
    WITH toksd AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    inst AS (SELECT doc_id, source, unnest(toks) AS term FROM toksd),
    cd AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
           FROM inst GROUP BY 1, 2),
    td AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM cd GROUP BY 1),
    gt AS (SELECT term, CAST(sum(c) AS BIGINT) AS gc FROM cd GROUP BY 1),
    gl AS (SELECT CAST(count(*) AS BIGINT) AS v,
                  CAST(sum(gc) AS BIGINT) AS gtot FROM gt),
    terms AS (
        SELECT cd.source, cd.c,
               CAST(floor(ln(((cd.c + 1.0) / (td.tot + gl.v))
                             / ((gt.gc + 1.0) / (gl.gtot + gl.v)))
                          * 10000 + 0.5) AS BIGINT) AS tick
        FROM cd JOIN td USING (source) JOIN gt USING (term) CROSS JOIN gl
    ),
    dom AS (
        SELECT source,
               sum(CAST(c AS DECIMAL(38,0)) * CAST(tick AS DECIMAL(38,0)))
                   AS sticks
        FROM terms GROUP BY 1
    ),
    docs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
             FROM documents GROUP BY 1),
    ex AS (
        SELECT d.source, docs.n_docs, td.tot AS n_tokens,
               CAST(floor(CAST(d.sticks AS DOUBLE) / td.tot / 10000.0
                          * 1000000 + 0.5) AS BIGINT) AS excess_ticks
        FROM dom d JOIN td USING (source) JOIN docs USING (source)
    ),
    wt AS (
        SELECT *, CAST(floor(exp(excess_ticks / 1000000.0) * 1000000 + 0.5)
                       AS BIGINT) AS wt_ticks
        FROM ex
    ),
    norm AS (SELECT CAST(sum(wt_ticks) AS BIGINT) AS z FROM wt)
    SELECT w.source, w.n_docs, w.n_tokens,
           round(w.excess_ticks / 1000000.0, 6) AS excess_nll,
           round(CAST(w.wt_ticks AS DOUBLE) / n.z, 6) AS mixture_weight
    FROM wt w CROSS JOIN norm n
    """,
    doc="DoReMi-style domain mixture reweighting: each source domain's "
    "excess loss is its mean per-token log-likelihood ratio between its "
    "own add-1 unigram LM and the global one (= a smoothed "
    "KL(domain || corpus)); mixture weights are the normalized "
    "exponentials, so domains the global distribution explains poorly "
    "get upweighted for the next training round. Everything reduces to "
    "ONE (source, term) count aggregation reused three ways (domain "
    "totals, global term counts, vocabulary) — the term-level join is "
    "an equi-join on term, per-term contributions tick to 1e-4 nats "
    "and sum as DECIMAL(38,0) (order-free exact), and the exp/"
    "normalize closing step runs on the |domains|-sized frame. The "
    "shape a data-mixture optimizer needs at 100 TB: no second corpus "
    "pass, no driver-side loss loop.",
    tags=("sampling", "mixture", "text"),
)
def sample_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    inst = docs.select(
        "source", F.explode(tokens_expr("text")).alias("term")
    )
    # (source, term) counts feed THREE branches (per-source totals, the
    # global term counts, and the per-term log-ratio frame) — pin the
    # vocabulary×sources-sized frame so the corpus tokenize+explode scan,
    # the only data-sized work here, executes once instead of per branch
    cd = (
        inst.groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    td = cd.groupBy("source").agg(F.sum("c").cast("long").alias("tot"))
    gt = cd.groupBy("term").agg(F.sum("c").cast("long").alias("gc"))
    gl = gt.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum("gc").cast("long").alias("gtot"),
    )
    terms = (
        cd.join(F.broadcast(td), "source")
        .join(gt, "term")
        .crossJoin(F.broadcast(gl))
        .select(
            "source",
            "c",
            F.floor(
                F.log(
                    ((F.col("c") + F.lit(1.0)) / (F.col("tot") + F.col("v")))
                    / ((F.col("gc") + F.lit(1.0)) / (F.col("gtot") + F.col("v")))
                )
                * 10000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("tick"),
        )
    )
    dom = terms.groupBy("source").agg(
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("tick").cast("decimal(38,0)")
        ).alias("sticks")
    )
    ndocs = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    ex = (
        dom.join(F.broadcast(td), "source")
        .join(F.broadcast(ndocs), "source")
        .select(
            "source",
            "n_docs",
            F.col("tot").alias("n_tokens"),
            F.floor(
                F.col("sticks").cast("double")
                / F.col("tot")
                / F.lit(10000.0)
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("excess_ticks"),
        )
    )
    wt = ex.withColumn(
        "wt_ticks",
        F.floor(F.exp(F.col("excess_ticks") / F.lit(1000000.0)) * 1000000 + F.lit(0.5))
        .cast("long"),
    )
    norm = wt.agg(F.sum("wt_ticks").cast("long").alias("z"))
    return wt.crossJoin(F.broadcast(norm)).select(
        "source",
        "n_docs",
        "n_tokens",
        pround(F.col("excess_ticks") / F.lit(1000000.0), 6).alias("excess_nll"),
        pround(F.col("wt_ticks").cast("double") / F.col("z"), 6).alias(
            "mixture_weight"
        ),
    )
