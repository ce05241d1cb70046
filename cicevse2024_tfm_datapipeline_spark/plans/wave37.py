"""Round-4 wave 37: a group-fairness parity audit (selection rate / TPR
/ FPR per protected group + disparate-impact and equal-opportunity
gaps), a Cramér's V categorical-association matrix, and a per-document
lexical-diversity battery (TTR / root-TTR / Herdan's C).

Scale extensions beyond the reference pipeline surface. House rules:
group confusion cells and contingency tables are ONE exact integer
aggregate each; chi-square contributions and per-doc diversity scores
tick to integers before cross-row summation; closing ratios run on
|groups| / |column-pairs| / |sources| frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr
from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Group-fairness parity audit
# ---------------------------------------------------------------------------


@register(
    "a_fairness_parity_audit",
    oracle="""
    WITH ev AS (
        SELECT user_id % 3 AS grp,
               CASE WHEN value >= 100.0 THEN 1 ELSE 0 END AS pred,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
        FROM events
    ),
    cells AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pred) AS BIGINT) AS n_sel,
               CAST(sum(pred * label) AS BIGINT) AS tp,
               CAST(sum(label) AS BIGINT) AS pos,
               CAST(sum(pred * (1 - label)) AS BIGINT) AS fp
        FROM ev GROUP BY 1
    ),
    rates AS (
        SELECT grp, n, n_sel,
               CAST(n_sel AS DOUBLE) / n AS sel_rate,
               CASE WHEN pos > 0 THEN CAST(tp AS DOUBLE) / pos
                    ELSE 0.0 END AS tpr,
               CASE WHEN n - pos > 0 THEN CAST(fp AS DOUBLE) / (n - pos)
                    ELSE 0.0 END AS fpr
        FROM cells
    ),
    gaps AS (
        SELECT min(sel_rate) / max(sel_rate) AS di_ratio,
               max(tpr) - min(tpr) AS eo_gap,
               max(fpr) - min(fpr) AS fpr_gap
        FROM rates
    )
    SELECT CAST(r.grp AS BIGINT) AS grp, r.n, r.n_sel,
           round(r.sel_rate, 6) AS selection_rate,
           round(r.tpr, 6) AS tpr,
           round(r.fpr, 6) AS fpr,
           round(g.di_ratio, 6) AS disparate_impact_ratio,
           round(g.eo_gap, 6) AS equal_opportunity_gap,
           round(g.fpr_gap, 6) AS fpr_gap
    FROM rates r CROSS JOIN gaps g
    """,
    doc="Group-fairness parity audit of a threshold classifier "
    "(flag = value >= 100) against the purchase label across protected-"
    "group proxies (user id mod 3): per-group selection rate, TPR and "
    "FPR from ONE exact integer confusion aggregate, plus the "
    "cross-group disparate-impact ratio (min/max selection — the "
    "four-fifths rule reads this), the equal-opportunity gap (TPR "
    "spread) and the FPR spread. The audit a model-release pipeline "
    "runs before shipping anything that scores people; at 100 TB it "
    "costs one map-side-combined aggregate, and the gap algebra runs "
    "on the |groups| frame.",
    tags=("stats", "fairness", "eval"),
)
def a_fairness_parity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 3).alias("grp"),
        (F.col("value") >= 100.0).cast("int").alias("pred"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    cells = ev.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pred").cast("long").alias("n_sel"),
        F.sum(F.col("pred") * F.col("label")).cast("long").alias("tp"),
        F.sum("label").cast("long").alias("pos"),
        F.sum(F.col("pred") * (F.lit(1) - F.col("label")))
        .cast("long")
        .alias("fp"),
    )
    rates = cells.select(
        "grp",
        "n",
        "n_sel",
        (F.col("n_sel").cast("double") / F.col("n")).alias("sel_rate"),
        F.when(F.col("pos") > 0, F.col("tp").cast("double") / F.col("pos"))
        .otherwise(F.lit(0.0))
        .alias("tpr"),
        F.when(
            F.col("n") - F.col("pos") > 0,
            F.col("fp").cast("double") / (F.col("n") - F.col("pos")),
        )
        .otherwise(F.lit(0.0))
        .alias("fpr"),
    )
    gaps = rates.agg(
        (F.min("sel_rate") / F.max("sel_rate")).alias("di_ratio"),
        (F.max("tpr") - F.min("tpr")).alias("eo_gap"),
        (F.max("fpr") - F.min("fpr")).alias("fpr_gap"),
    )
    return rates.crossJoin(F.broadcast(gaps)).select(
        F.col("grp").cast("long").alias("grp"),
        "n",
        "n_sel",
        pround("sel_rate", 6).alias("selection_rate"),
        pround("tpr", 6).alias("tpr"),
        pround("fpr", 6).alias("fpr"),
        pround("di_ratio", 6).alias("disparate_impact_ratio"),
        pround("eo_gap", 6).alias("equal_opportunity_gap"),
        pround("fpr_gap", 6).alias("fpr_gap"),
    )


# ---------------------------------------------------------------------------
# Cramér's V categorical-association matrix
# ---------------------------------------------------------------------------

_CV_PAIRS = (
    ("segment", "priority"),
    ("segment", "status"),
    ("priority", "status"),
)


@register(
    "a_cramers_v_matrix",
    oracle="""
    WITH rel AS (
        SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
               o.o_orderstatus AS status
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    melted AS (
        SELECT 'segment|priority' AS pair, segment AS x, priority AS y
        FROM rel
        UNION ALL
        SELECT 'segment|status', segment, status FROM rel
        UNION ALL
        SELECT 'priority|status', priority, status FROM rel
    ),
    cells AS (
        SELECT pair, x, y, CAST(count(*) AS BIGINT) AS o
        FROM melted GROUP BY 1, 2, 3
    ),
    rows_m AS (SELECT pair, x, CAST(sum(o) AS BIGINT) AS rx
               FROM cells GROUP BY 1, 2),
    cols_m AS (SELECT pair, y, CAST(sum(o) AS BIGINT) AS cy
               FROM cells GROUP BY 1, 2),
    tot AS (SELECT pair, CAST(sum(o) AS BIGINT) AS n,
                   CAST(count(DISTINCT x) AS BIGINT) AS r,
                   CAST(count(DISTINCT y) AS BIGINT) AS c
            FROM cells GROUP BY 1),
    grid AS (
        SELECT rm.pair, rm.x, cm.y, rm.rx, cm.cy,
               coalesce(ce.o, 0) AS o
        FROM rows_m rm
        JOIN cols_m cm ON cm.pair = rm.pair
        LEFT JOIN cells ce ON ce.pair = rm.pair AND ce.x = rm.x
                          AND ce.y = cm.y
    ),
    chi AS (
        SELECT g.pair,
               CAST(sum(CAST(floor(
                   (g.o - CAST(g.rx AS DOUBLE) * g.cy / tt.n)
                   * (g.o - CAST(g.rx AS DOUBLE) * g.cy / tt.n)
                   / (CAST(g.rx AS DOUBLE) * g.cy / tt.n)
                   * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS chi2_ticks
        FROM grid g
        JOIN tot tt ON tt.pair = g.pair
        GROUP BY 1
    )
    SELECT t.pair, t.n, t.r AS card_x, t.c AS card_y,
           round(ch.chi2_ticks / 1000000.0, 6) AS chi2,
           round(sqrt(ch.chi2_ticks / 1000000.0
                      / (t.n * (least(t.r, t.c) - 1))), 6) AS cramers_v
    FROM chi ch JOIN tot t USING (pair)
    """,
    doc="Cramér's V association matrix over categorical column pairs "
    "(segment/priority/status on the order-customer join) — the "
    "categorical complement to the numeric correlation matrix in the "
    "profiling battery: each pair's chi-square comes from exact "
    "integer contingency cells and margins (expected counts are exact "
    "ratios; per-cell contributions tick to 1e6 so the sum is "
    "order-free), normalized to [0,1] by n*(min(r,c)-1). One melt pass "
    "over the join feeds all pairs; contingency frames are bounded by "
    "category cardinalities. The screen that tells a feature engineer "
    "which categoricals are redundant before encoding them.",
    tags=("stats", "profile"),
)
def a_cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    rel = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    )
    melted = None
    for a, b in _CV_PAIRS:
        part = rel.select(
            F.lit(f"{a}|{b}").alias("pair"),
            F.col(a).alias("x"),
            F.col(b).alias("y"),
        )
        melted = part if melted is None else melted.unionAll(part)
    cells = melted.groupBy("pair", "x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rows_m = cells.groupBy("pair", "x").agg(F.sum("o").cast("long").alias("rx"))
    cols_m = cells.groupBy("pair", "y").agg(F.sum("o").cast("long").alias("cy"))
    tot = melted.groupBy("pair").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("x").cast("long").alias("r"),
        F.countDistinct("y").cast("long").alias("c"),
    )
    e = F.col("rx").cast("double") * F.col("cy") / F.col("n")
    grid = (
        rows_m.join(cols_m, "pair")
        .join(cells, ["pair", "x", "y"], "left")
        .select(
            "pair", "rx", "cy", F.coalesce(F.col("o"), F.lit(0)).alias("o")
        )
    )
    chi = (
        grid.join(F.broadcast(tot.select("pair", "n")), "pair")
        .groupBy("pair")
        .agg(
            F.sum(
                F.floor(
                    (F.col("o") - e) * (F.col("o") - e) / e * 1000000 + F.lit(0.5)
                ).cast("long")
            )
            .cast("long")
            .alias("chi2_ticks")
        )
    )
    return chi.join(F.broadcast(tot), "pair").select(
        "pair",
        "n",
        F.col("r").alias("card_x"),
        F.col("c").alias("card_y"),
        pround(F.col("chi2_ticks") / F.lit(1000000.0), 6).alias("chi2"),
        pround(
            F.sqrt(
                F.col("chi2_ticks")
                / F.lit(1000000.0)
                / (F.col("n") * (F.least(F.col("r"), F.col("c")) - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Lexical-diversity battery
# ---------------------------------------------------------------------------


@register(
    "text_lexical_diversity",
    oracle=r"""
    WITH d AS (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    per_doc AS (
        SELECT source,
               CAST(len(toks) AS BIGINT) AS n,
               CAST(len(list_distinct(toks)) AS BIGINT) AS v
        FROM d WHERE len(toks) > 1
    ),
    ticked AS (
        SELECT source,
               CAST(floor(CAST(v AS DOUBLE) / n * 1000000 + 0.5) AS BIGINT)
                   AS ttr_t,
               CAST(floor(CAST(v AS DOUBLE) / sqrt(CAST(n AS DOUBLE))
                          * 1000000 + 0.5) AS BIGINT) AS rttr_t,
               CAST(floor(ln(CAST(v AS DOUBLE)) / ln(CAST(n AS DOUBLE))
                          * 1000000 + 0.5) AS BIGINT) AS herdan_t
        FROM per_doc
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(ttr_t) AS DOUBLE) / count(*) / 1000000.0, 6)
               AS avg_ttr,
           round(CAST(sum(rttr_t) AS DOUBLE) / count(*) / 1000000.0, 6)
               AS avg_root_ttr,
           round(CAST(sum(herdan_t) AS DOUBLE) / count(*) / 1000000.0, 6)
               AS avg_herdan_c
    FROM ticked GROUP BY 1
    """,
    doc="Per-document lexical-diversity battery aggregated per source: "
    "type-token ratio V/N, Guiraud's root TTR V/sqrt(N) (less "
    "length-biased), and Herdan's C = ln V / ln N (scale-invariant) — "
    "the per-document counterparts of the corpus-level Heaps/Zipf "
    "profiles, and standard quality features for filtering repetitive "
    "or template text. Token and type counts are exact integers per "
    "doc (one codegen'd expression in the scan — no explode), each "
    "score ticks to 1e6 before the per-source sum, and the "
    "transcendentals run on exact integer operands. One scan, one "
    "aggregate.",
    tags=("text", "quality"),
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "source", tokens_expr("text").alias("toks")
    )
    per_doc = d.filter(F.size("toks") > 1).select(
        "source",
        F.size("toks").cast("long").alias("n"),
        F.size(F.array_distinct("toks")).cast("long").alias("v"),
    )
    ttr_t = F.floor(
        F.col("v").cast("double") / F.col("n") * 1000000 + F.lit(0.5)
    ).cast("long")
    rttr_t = F.floor(
        F.col("v").cast("double") / F.sqrt(F.col("n").cast("double")) * 1000000
        + F.lit(0.5)
    ).cast("long")
    herdan_t = F.floor(
        F.log(F.col("v").cast("double")) / F.log(F.col("n").cast("double")) * 1000000
        + F.lit(0.5)
    ).cast("long")
    ticked = per_doc.select(
        "source",
        ttr_t.alias("ttr_t"),
        rttr_t.alias("rttr_t"),
        herdan_t.alias("herdan_t"),
    )
    return ticked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        pround(
            F.sum("ttr_t").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0), 6
        ).alias("avg_ttr"),
        pround(
            F.sum("rttr_t").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0),
            6,
        ).alias("avg_root_ttr"),
        pround(
            F.sum("herdan_t").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0),
            6,
        ).alias("avg_herdan_c"),
    )
