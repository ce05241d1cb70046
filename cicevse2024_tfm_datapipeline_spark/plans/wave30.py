"""Round-4 wave 30: weight-of-evidence / information-value feature
screening, a blocking-quality audit (reduction ratio / pair completeness
/ pairs quality vs exact Jaccard ground truth on a bounded sample), and
closed-form ridge regression solved by Cramer's rule on exact integer
moments.

Scale extensions beyond the reference pipeline surface. House rules:
all sums that cross row scale are exact integer ticks (cents, counts,
contribution ticks), the WOE log runs on exact integer-ratio operands,
Jaccard threshold checks are pure integer compares (2*|intersect| >=
|union|), and the ridge solve is identical double arithmetic on identical
exact moments — the row scans are single map-side-combined aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr
from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Weight of evidence / information value
# ---------------------------------------------------------------------------


@register(
    "f_binned_woe_iv",
    oracle="""
    WITH rel AS (
        SELECT greatest(CAST(0 AS BIGINT),
                 least(CAST(9 AS BIGINT),
                   CAST(floor(floor(c.c_acctbal * 100 + 0.5) / 100000.0)
                        AS BIGINT))) AS bin,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    bins AS (
        SELECT bin, CAST(sum(pos) AS BIGINT) AS n_pos,
               CAST(sum(1 - pos) AS BIGINT) AS n_neg
        FROM rel GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n_pos) AS BIGINT) AS tp,
               CAST(sum(n_neg) AS BIGINT) AS tn
        FROM bins
    ),
    woe AS (
        SELECT b.bin, b.n_pos, b.n_neg,
               CAST(floor(ln(((b.n_pos + 0.5) * t.tn)
                             / ((b.n_neg + 0.5) * t.tp))
                          * 1000000 + 0.5) AS BIGINT) AS woe_ticks,
               CAST(b.n_pos AS DOUBLE) / t.tp
                   - CAST(b.n_neg AS DOUBLE) / t.tn AS share_diff
        FROM bins b CROSS JOIN tot t
    ),
    contrib AS (
        SELECT *, CAST(floor(share_diff * woe_ticks + 0.5) AS BIGINT)
                      AS iv_ticks
        FROM woe
    ),
    total_iv AS (SELECT CAST(sum(iv_ticks) AS BIGINT) AS ivt FROM contrib)
    SELECT c.bin, c.n_pos, c.n_neg,
           round(c.woe_ticks / 1000000.0, 6) AS woe,
           round(c.iv_ticks / 1000000.0, 6) AS iv_contribution,
           round(t.ivt / 1000000.0, 6) AS total_iv
    FROM contrib c CROSS JOIN total_iv t
    """,
    doc="Weight-of-evidence / information-value screening of a binned "
    "feature (customer balance in $1000 bands, capped to 10 bins) "
    "against a binary target (finalized order): WOE_b = "
    "ln((pos_b+0.5)tn / ((neg_b+0.5)tp)) on exact integer-count "
    "operands (add-0.5 smoothing keeps empty cells finite), ticked to "
    "1e6; the IV is the tick-exact sum of (share diff x WOE) over the "
    "|bins| frame. The classic credit-scoring feature screen, and at "
    "100 TB it costs ONE map-side-combined aggregate over the join — "
    "the WOE/IV closing arithmetic runs on 10 rows regardless of "
    "corpus size.",
    tags=("feature", "stats"),
)
def f_binned_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
    rel = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        F.greatest(
            F.lit(0).cast("long"),
            F.least(
                F.lit(9).cast("long"),
                F.floor(cents / F.lit(100000.0)).cast("long"),
            ),
        ).alias("bin"),
        (F.col("o_orderstatus") == "F").cast("int").alias("pos"),
    )
    bins = rel.groupBy("bin").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("pos")).cast("long").alias("n_neg"),
    )
    tot = bins.agg(
        F.sum("n_pos").cast("long").alias("tp"),
        F.sum("n_neg").cast("long").alias("tn"),
    )
    woe_ticks = (
        F.floor(
            F.log(
                ((F.col("n_pos") + F.lit(0.5)) * F.col("tn"))
                / ((F.col("n_neg") + F.lit(0.5)) * F.col("tp"))
            )
            * 1000000
            + F.lit(0.5)
        )
    ).cast("long")
    share_diff = F.col("n_pos").cast("double") / F.col("tp") - F.col("n_neg").cast(
        "double"
    ) / F.col("tn")
    contrib = (
        bins.crossJoin(F.broadcast(tot))
        .withColumn("woe_ticks", woe_ticks)
        .withColumn("share_diff", share_diff)
        .withColumn(
            "iv_ticks",
            F.floor(F.col("share_diff") * F.col("woe_ticks") + F.lit(0.5)).cast(
                "long"
            ),
        )
    )
    total_iv = contrib.agg(F.sum("iv_ticks").cast("long").alias("ivt"))
    return contrib.crossJoin(F.broadcast(total_iv)).select(
        "bin",
        "n_pos",
        "n_neg",
        pround(F.col("woe_ticks") / F.lit(1000000.0), 6).alias("woe"),
        pround(F.col("iv_ticks") / F.lit(1000000.0), 6).alias("iv_contribution"),
        pround(F.col("ivt") / F.lit(1000000.0), 6).alias("total_iv"),
    )


# ---------------------------------------------------------------------------
# Blocking-quality audit (reduction ratio / pair completeness)
# ---------------------------------------------------------------------------

_AUDIT_N = 200  # bounded audit sample: doc_id < 200


@register(
    "dedup_blocking_quality_audit",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang,
               CAST(n_chars // 50 AS BIGINT) AS len_bucket,
               list_distinct(list_filter(
                   regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS toks
        FROM documents WHERE doc_id < {_AUDIT_N}
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CASE WHEN a.lang = b.lang
                         AND a.len_bucket = b.len_bucket
                    THEN 1 ELSE 0 END AS in_block,
               CASE WHEN 2 * len(list_intersect(a.toks, b.toks))
                         >= len(a.toks) + len(b.toks)
                              - len(list_intersect(a.toks, b.toks))
                    THEN 1 ELSE 0 END AS is_dup
        FROM d a JOIN d b ON a.doc_id < b.doc_id
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_all_pairs,
               CAST(sum(in_block) AS BIGINT) AS n_cand,
               CAST(sum(is_dup) AS BIGINT) AS n_truth,
               CAST(sum(in_block * is_dup) AS BIGINT) AS n_cand_truth
        FROM pairs
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d)
    SELECT nd.n_docs, a.n_all_pairs, a.n_cand, a.n_truth, a.n_cand_truth,
           round(1.0 - CAST(a.n_cand AS DOUBLE) / a.n_all_pairs, 6)
               AS reduction_ratio,
           round(CASE WHEN a.n_truth > 0
                      THEN CAST(a.n_cand_truth AS DOUBLE) / a.n_truth
                      ELSE 1.0 END, 6) AS pair_completeness,
           round(CASE WHEN a.n_cand > 0
                      THEN CAST(a.n_cand_truth AS DOUBLE) / a.n_cand
                      ELSE 0.0 END, 6) AS pairs_quality
    FROM agg a CROSS JOIN nd
    """,
    doc="Blocking-quality audit for a dedup blocking scheme ((lang, "
    "50-char length bucket) blocks): on a bounded audit sample the "
    "exact all-pairs ground truth (distinct-token Jaccard >= 0.5 — a "
    "pure integer compare, 2|A∩B| >= |A∪B|) grades the blocking with "
    "the three standard metrics: reduction ratio (pair-space shrink), "
    "pair completeness (recall of true dups) and pairs quality "
    "(precision). This is how a dedup pipeline validates its blocking "
    "key BEFORE trusting it on the full corpus — the quadratic truth "
    "pass runs only on the fixed-size sample (the production pairs "
    "remain equi-joins), so the audit cost is constant at any corpus "
    "scale.",
    tags=("dedup", "eval", "blocking"),
)
def dedup_blocking_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _AUDIT_N)
        .select(
            "doc_id",
            "lang",
            F.floor(F.col("n_chars") / 50).cast("long").alias("len_bucket"),
            F.array_distinct(tokens_expr("text")).alias("toks"),
        )
    )
    a = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("lang").alias("lang_a"),
        F.col("len_bucket").alias("lb_a"),
        F.col("toks").alias("toks_a"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("len_bucket").alias("lb_b"),
        F.col("toks").alias("toks_b"),
    )
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    union = F.size("toks_a") + F.size("toks_b") - inter
    pairs = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            (
                (F.col("lang_a") == F.col("lang_b"))
                & (F.col("lb_a") == F.col("lb_b"))
            )
            .cast("int")
            .alias("in_block"),
            (F.lit(2) * inter >= union).cast("int").alias("is_dup"),
        )
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_all_pairs"),
        F.sum("in_block").cast("long").alias("n_cand"),
        F.sum("is_dup").cast("long").alias("n_truth"),
        F.sum(F.col("in_block") * F.col("is_dup")).cast("long").alias("n_cand_truth"),
    )
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return agg.crossJoin(F.broadcast(nd)).select(
        "n_docs",
        "n_all_pairs",
        "n_cand",
        "n_truth",
        "n_cand_truth",
        pround(
            F.lit(1.0) - F.col("n_cand").cast("double") / F.col("n_all_pairs"), 6
        ).alias("reduction_ratio"),
        pround(
            F.when(
                F.col("n_truth") > 0,
                F.col("n_cand_truth").cast("double") / F.col("n_truth"),
            ).otherwise(F.lit(1.0)),
            6,
        ).alias("pair_completeness"),
        pround(
            F.when(
                F.col("n_cand") > 0,
                F.col("n_cand_truth").cast("double") / F.col("n_cand"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("pairs_quality"),
    )


# ---------------------------------------------------------------------------
# Closed-form ridge regression (Cramer on exact moments)
# ---------------------------------------------------------------------------

_RIDGE_LAMBDA = 1000

#: Cramer's-rule solve of (A + lambda*I) beta = b for the 3x3 normal
#: equations, written ONCE as SQL expression text and evaluated by BOTH
#: engines (F.expr on the Spark side) — identical text, identical exact
#: integer moment operands, identical double results.
_A00 = f"(CAST(s00 AS DOUBLE) + {_RIDGE_LAMBDA})"
_A11 = f"(CAST(s11 AS DOUBLE) + {_RIDGE_LAMBDA})"
_A22 = f"(CAST(s22 AS DOUBLE) + {_RIDGE_LAMBDA})"
_A01 = "CAST(s01 AS DOUBLE)"
_A02 = "CAST(s02 AS DOUBLE)"
_A12 = "CAST(s12 AS DOUBLE)"
_B0 = "CAST(b0 AS DOUBLE)"
_B1 = "CAST(b1 AS DOUBLE)"
_B2 = "CAST(b2 AS DOUBLE)"


def _det3(
    m00: str, m01: str, m02: str, m10: str, m11: str, m12: str, m20: str, m21: str, m22: str
) -> str:
    return (
        f"({m00} * ({m11} * {m22} - {m12} * {m21})"
        f" - {m01} * ({m10} * {m22} - {m12} * {m20})"
        f" + {m02} * ({m10} * {m21} - {m11} * {m20}))"
    )


_DET = _det3(_A00, _A01, _A02, _A01, _A11, _A12, _A02, _A12, _A22)
_DET0 = _det3(_B0, _A01, _A02, _B1, _A11, _A12, _B2, _A12, _A22)
_DET1 = _det3(_A00, _B0, _A02, _A01, _B1, _A12, _A02, _B2, _A22)
_DET2 = _det3(_A00, _A01, _B0, _A01, _A11, _B1, _A02, _A12, _B2)


@register(
    "ml_ridge_closed_form",
    oracle=f"""
    WITH li AS (
        SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
               CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS s00,
               CAST(sum(q) AS BIGINT) AS s01,
               CAST(sum(d) AS BIGINT) AS s02,
               CAST(sum(q * q) AS BIGINT) AS s11,
               CAST(sum(q * d) AS BIGINT) AS s12,
               CAST(sum(d * d) AS BIGINT) AS s22,
               CAST(sum(y) AS BIGINT) AS b0,
               CAST(sum(q * y) AS BIGINT) AS b1,
               CAST(sum(d * y) AS BIGINT) AS b2
        FROM li
    ),
    beta AS (
        SELECT s00,
               {_DET0} / {_DET} AS beta0,
               {_DET1} / {_DET} AS beta1,
               {_DET2} / {_DET} AS beta2,
               CAST(b0 AS DOUBLE) / s00 AS ybar
        FROM m
    ),
    resid AS (
        SELECT b.s00, b.beta0, b.beta1, b.beta2,
               CAST(sum(CAST(floor(
                   (li.y - (b.beta0 + b.beta1 * li.q + b.beta2 * li.d))
                   * (li.y - (b.beta0 + b.beta1 * li.q + b.beta2 * li.d))
                   / 10000.0 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS sse_t,
               CAST(sum(CAST(floor((li.y - b.ybar) * (li.y - b.ybar)
                   / 10000.0 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS sst_t
        FROM li CROSS JOIN beta b
        GROUP BY 1, 2, 3, 4
    )
    SELECT s00 AS n_rows,
           round(beta0 / 100.0, 6) AS intercept,
           round(beta1 / 100.0, 6) AS coef_quantity,
           round(beta2 / 100.0, 6) AS coef_discount_pct,
           round(1.0 - CAST(sse_t AS DOUBLE) / CAST(sst_t AS DOUBLE), 6)
               AS r2
    FROM resid
    """,
    doc="Closed-form ridge regression (lambda=1000 on the tick scale) of "
    "line-item price on quantity and discount, solved in-engine by "
    "Cramer's rule on the 3x3 normal equations: the X'X / X'y moments "
    "are EXACT integer tick sums from ONE map-side-combined scan "
    "(order-free at any parallelism), and the solve is a fixed double "
    "expression evaluated from identical SQL text in both engines "
    "(shared via F.expr). A second scan scores R^2 with residual "
    "squares ticked before summation, so the cross-row sums stay "
    "order-free. This is the distributed-normal-equations shape linear "
    "models take at 100 TB: two scans, two 9-number frames, zero "
    "iterations, no driver-side matrix library.",
    tags=("ml", "regression"),
)
def ml_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("q"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("d"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    m = li.agg(
        F.count(F.lit(1)).cast("long").alias("s00"),
        F.sum("q").cast("long").alias("s01"),
        F.sum("d").cast("long").alias("s02"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("s11"),
        F.sum(F.col("q") * F.col("d")).cast("long").alias("s12"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("s22"),
        F.sum("y").cast("long").alias("b0"),
        F.sum(F.col("q") * F.col("y")).cast("long").alias("b1"),
        F.sum(F.col("d") * F.col("y")).cast("long").alias("b2"),
    )
    beta = m.select(
        "s00",
        F.expr(f"{_DET0} / {_DET}").alias("beta0"),
        F.expr(f"{_DET1} / {_DET}").alias("beta1"),
        F.expr(f"{_DET2} / {_DET}").alias("beta2"),
        (F.col("b0").cast("double") / F.col("s00")).alias("ybar"),
    )
    pred = F.col("beta0") + F.col("beta1") * F.col("q") + F.col("beta2") * F.col("d")
    res = F.col("y") - pred
    dev = F.col("y") - F.col("ybar")
    resid = (
        li.crossJoin(F.broadcast(beta))
        .groupBy("s00", "beta0", "beta1", "beta2")
        .agg(
            F.sum(
                F.floor(res * res / F.lit(10000.0) + F.lit(0.5))
                .cast("long")
                .cast("decimal(38,0)")
            ).alias("sse_t"),
            F.sum(
                F.floor(dev * dev / F.lit(10000.0) + F.lit(0.5))
                .cast("long")
                .cast("decimal(38,0)")
            ).alias("sst_t"),
        )
    )
    return resid.select(
        F.col("s00").alias("n_rows"),
        pround(F.col("beta0") / F.lit(100.0), 6).alias("intercept"),
        pround(F.col("beta1") / F.lit(100.0), 6).alias("coef_quantity"),
        pround(F.col("beta2") / F.lit(100.0), 6).alias("coef_discount_pct"),
        pround(
            F.lit(1.0)
            - F.col("sse_t").cast("double") / F.col("sst_t").cast("double"),
            6,
        ).alias("r2"),
    )
