"""Round-4 wave 32: gradient-boosted stumps trained IN the engine (two
unrolled boosting rounds, exact-integer split search), interpolated
Kneser–Ney bigram language-model scoring, and empirical-Bayes
beta-binomial shrinkage of per-key rates.

Scale extensions beyond the reference pipeline surface. House rules:
split-candidate statistics are exact integer sums from one scan per
boosting round (the candidate grid is a literal — explode x 19, fold
map-side), every argmax runs as one max_by over the lexicographic
(gain, key...) struct on the bounded candidate frame (no unpartitioned
window, no float-ordering ambiguity — gains are identical doubles from
identical exact operands, and the grouping key breaks ties), KN
probabilities tick to 1e6 nats before cross-row summation, and the
shrinkage moments are exact tick sums. All closing double arithmetic is
shared SQL text evaluated by BOTH engines (F.expr on the Spark side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.functions.literals import literal_df
from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Gradient-boosted stumps (two unrolled rounds)
# ---------------------------------------------------------------------------

_CANDS = [("q", thr) for thr in (5, 10, 15, 20, 25, 30, 35, 40, 45)] + [
    ("d", thr) for thr in range(0, 10)
]
_CAND_VALUES = ", ".join(f"('{f}', {v})" for f, v in _CANDS)

# shared closing arithmetic — identical SQL text in both engines
_F0 = "(CAST(sy AS DOUBLE) / n)"
_GAIN1 = (
    "(CAST(syl AS DOUBLE) * syl / nl"
    " + CAST(sy - syl AS DOUBLE) * (sy - syl) / (n - nl))"
)
_G1L = f"(0.5 * (CAST(syl AS DOUBLE) / nl - {_F0}))"
_G1R = f"(0.5 * (CAST(sy - syl AS DOUBLE) / (n - nl) - {_F0}))"
_SR2L = (
    "(CAST(syl AS DOUBLE)"
    " - (nl1l * (f0 + g1l) + (nl - nl1l) * (f0 + g1r)))"
)
_SR2R = (
    "(CAST(sy - syl AS DOUBLE)"
    " - ((nl1tot - nl1l) * (f0 + g1l)"
    "    + ((n - nl) - (nl1tot - nl1l)) * (f0 + g1r)))"
)
_GAIN2 = "(sr2l * sr2l / nl + sr2r * sr2r / (n - nl))"
_G2L = "(0.5 * (sr2l / nl))"
_G2R = "(0.5 * (sr2r / (n - nl)))"
_SIDE1 = "((CASE WHEN bf1 = 'q' THEN q ELSE d END) <= bt1)"
_SIDE2 = "((CASE WHEN bf2 = 'q' THEN q ELSE d END) <= bt2)"
_PRED = (
    f"(f0 + (CASE WHEN {_SIDE1} THEN g1l ELSE g1r END)"
    f" + (CASE WHEN {_SIDE2} THEN g2l ELSE g2r END))"
)


@register(
    "ml_gbm_two_stumps",
    oracle=f"""
    WITH li AS (
        SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
               CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        FROM lineitem
    ),
    cands AS (SELECT * FROM (VALUES {_CAND_VALUES}) AS v(feat, thr)),
    gstats AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
        FROM li
    ),
    cand1 AS (
        SELECT c.feat, c.thr,
               CAST(sum(CASE WHEN (CASE WHEN c.feat = 'q' THEN li.q
                                        ELSE li.d END) <= c.thr
                             THEN 1 ELSE 0 END) AS BIGINT) AS nl,
               CAST(sum(CASE WHEN (CASE WHEN c.feat = 'q' THEN li.q
                                        ELSE li.d END) <= c.thr
                             THEN li.y ELSE 0 END) AS BIGINT) AS syl
        FROM li CROSS JOIN cands c GROUP BY 1, 2
    ),
    cand1v AS (
        SELECT c.*, g.n, g.sy, {_GAIN1} AS gain1
        FROM cand1 c CROSS JOIN gstats g
        WHERE c.nl > 0 AND c.nl < g.n
    ),
    m1 AS (SELECT max(gain1) AS m FROM cand1v),
    t1a AS (SELECT c.* FROM cand1v c, m1 WHERE c.gain1 = m1.m),
    mf1 AS (SELECT max(feat) AS bf FROM t1a),
    t1b AS (SELECT t1a.* FROM t1a, mf1 WHERE t1a.feat = mf1.bf),
    mt1 AS (SELECT max(thr) AS bt FROM t1b),
    best1 AS (
        SELECT feat AS bf1, thr AS bt1, nl AS nl1tot, n, sy,
               {_F0} AS f0, {_G1L} AS g1l, {_G1R} AS g1r
        FROM t1b, mt1 WHERE t1b.thr = mt1.bt
    ),
    cand2 AS (
        SELECT c.feat, c.thr, b.f0, b.g1l, b.g1r, b.n, b.sy, b.nl1tot,
               b.bf1, b.bt1,
               CAST(sum(CASE WHEN (CASE WHEN c.feat = 'q' THEN li.q
                                        ELSE li.d END) <= c.thr
                             THEN 1 ELSE 0 END) AS BIGINT) AS nl,
               CAST(sum(CASE WHEN (CASE WHEN c.feat = 'q' THEN li.q
                                        ELSE li.d END) <= c.thr
                             THEN li.y ELSE 0 END) AS BIGINT) AS syl,
               CAST(sum(CASE WHEN (CASE WHEN c.feat = 'q' THEN li.q
                                        ELSE li.d END) <= c.thr
                             AND (CASE WHEN b.bf1 = 'q' THEN li.q
                                       ELSE li.d END) <= b.bt1
                             THEN 1 ELSE 0 END) AS BIGINT) AS nl1l
        FROM li CROSS JOIN best1 b CROSS JOIN cands c
        GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10
    ),
    cand2s AS (
        SELECT *, {_SR2L} AS sr2l, {_SR2R} AS sr2r
        FROM cand2 WHERE nl > 0 AND nl < n
    ),
    cand2v AS (SELECT *, {_GAIN2} AS gain2 FROM cand2s),
    m2 AS (SELECT max(gain2) AS m FROM cand2v),
    t2a AS (SELECT c.* FROM cand2v c, m2 WHERE c.gain2 = m2.m),
    mf2 AS (SELECT max(feat) AS bf FROM t2a),
    t2b AS (SELECT t2a.* FROM t2a, mf2 WHERE t2a.feat = mf2.bf),
    mt2 AS (SELECT max(thr) AS bt FROM t2b),
    best2 AS (
        SELECT feat AS bf2, thr AS bt2, {_G2L} AS g2l, {_G2R} AS g2r
        FROM t2b, mt2 WHERE t2b.thr = mt2.bt
    ),
    model AS (SELECT * FROM best1 CROSS JOIN best2),
    fin AS (
        SELECT m.bf1, m.bt1, m.g1l, m.g1r, m.bf2, m.bt2, m.g2l, m.g2r,
               m.f0, m.n,
               CAST(sum(CAST(floor((li.y - {_PRED}) * (li.y - {_PRED})
                                   / 10000.0 + 0.5) AS BIGINT))
                    AS DECIMAL(38,0)) AS sse_t,
               CAST(sum(CAST(floor((li.y - m.f0) * (li.y - m.f0)
                                   / 10000.0 + 0.5) AS BIGINT))
                    AS DECIMAL(38,0)) AS sse0_t
        FROM li CROSS JOIN model m
        GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10
    )
    SELECT n AS n_rows, bf1 AS feature_1, CAST(bt1 AS BIGINT) AS threshold_1,
           round(g1l / 100.0, 6) AS gamma1_left,
           round(g1r / 100.0, 6) AS gamma1_right,
           bf2 AS feature_2, CAST(bt2 AS BIGINT) AS threshold_2,
           round(g2l / 100.0, 6) AS gamma2_left,
           round(g2r / 100.0, 6) AS gamma2_right,
           round(f0 / 100.0, 6) AS base_prediction,
           round(sqrt(CAST(sse_t AS DOUBLE) / n), 6) AS train_rmse,
           round(1.0 - CAST(sse_t AS DOUBLE) / CAST(sse0_t AS DOUBLE), 6)
               AS r2_vs_mean
    FROM fin
    """,
    doc="Gradient boosting trained IN the engine: two unrolled boosting "
    "rounds of depth-1 regression stumps (squared loss, learning rate "
    "0.5) predicting line-item price from quantity and discount. Each "
    "round is ONE scan: the 19-candidate (feature, threshold) grid "
    "explodes against the rows, per-candidate left-side counts and "
    "exact integer y-sums fold map-side, and the variance-reduction "
    "gain sum_L^2/n_L + sum_R^2/n_R closes per candidate — round 2's "
    "residual sums come in closed form from the round-1 leaf values "
    "and the (candidate-side x round-1-side) contingency counts, so "
    "residuals are never materialized per row. The argmax is a "
    "single max_by over the lexicographic (gain, feat, thr) struct on "
    "the 19-row frame — the same selection as a max ladder, one "
    "aggregate (identical doubles in both engines — no float-ordering "
    "window). A final scan scores "
    "train RMSE/R^2 with residual squares ticked before summation. "
    "This is the distributed-histogram split search every scalable GBM "
    "(XGBoost/LightGBM) runs, expressed as three aggregates.",
    tags=("ml", "regression", "boosting"),
)
def ml_gbm_two_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # wide=True: each boosting round folds the 19-candidate grid against
    # every row (|rows| x 19 expanded aggregate inputs) before its first
    # exchange — CPU-dense narrow work that a single-split scan would
    # serialize, the same tradeoff call as the shingle tier (cheap-per-row
    # lineitem queries do NOT opt in)
    li = t(spark, sf_dir, "lineitem", wide=True).select(
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("q"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("d"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    cands = literal_df(spark, list(_CANDS), "feat string, thr long")
    glob = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    fval = F.when(F.col("feat") == "q", F.col("q")).otherwise(F.col("d"))
    side = fval <= F.col("thr")
    cand1 = (
        li.crossJoin(F.broadcast(cands))
        .groupBy("feat", "thr")
        .agg(
            F.sum(side.cast("int")).cast("long").alias("nl"),
            F.sum(F.when(side, F.col("y")).otherwise(0)).cast("long").alias("syl"),
        )
    )
    # r11 restructure (guide §1.2 "don't compute things you throw
    # away" / §2.4): the argmax used to be a three-step max ladder —
    # 3 scalar aggregates + 3 equality self-joins per round — which
    # consumed its input 2^3 ways and forced a lazy localCheckpoint on
    # each candidate frame just to stop the plan growing
    # multiplicatively (Catalyst analysis alone measured ~7 s unpinned,
    # round 4). The ladder's selection — max gain, then max feat among
    # those, then max thr among those — IS the lexicographic maximum of
    # the struct (gain, feat, thr), because (feat, thr) is the
    # grouping key (unique, so trailing value fields can never affect
    # the ordering). ONE max_by aggregate replaces the six plan nodes,
    # the candidate frames become single-consumer (their pins and the
    # per-pin Catalyst planning passes are deleted), and doubles are
    # still compared exactly (no float-ordering ambiguity: identical
    # gains fall through to the exact-integer feat/thr tiebreak, as
    # before). The candidate frames become single-consumer and lose
    # their pins; the two cross-round 1-row frames keep theirs (best1
    # has two consumers; best2's trade is measured in its comment).
    cand1v = (
        cand1.crossJoin(F.broadcast(glob))
        .filter((F.col("nl") > 0) & (F.col("nl") < F.col("n")))
        .withColumn("gain1", F.expr(_GAIN1))
    )

    def argmax(df: DataFrame, gain: str, fields: list[str]) -> DataFrame:
        pick = F.max_by(
            F.struct(*[F.col(c) for c in fields]),
            F.struct(F.col(gain), F.col("feat"), F.col("thr")),
        ).alias("__b")
        # degenerate-input guard (r11 ADVICE): a global agg emits one row
        # even over an empty candidate frame, where max_by yields NULL —
        # the oracle's CTE chain yields zero rows there. Unreachable on
        # real fixtures (lineitem non-empty); the filter restores the
        # zero-row behavior without touching any non-degenerate result.
        return df.agg(pick).where(F.col("__b").isNotNull()).select("__b.*")

    best1 = argmax(
        cand1v, "gain1", ["feat", "thr", "nl", "syl", "n", "sy"]
    ).select(
        F.col("feat").alias("bf1"),
        F.col("thr").alias("bt1"),
        F.col("nl").alias("nl1tot"),
        "n",
        "sy",
        F.expr(_F0).alias("f0"),
        F.expr(_G1L).alias("g1l"),
        F.expr(_G1R).alias("g1r"),
    ).localCheckpoint(eager=False)
    l1 = F.expr(_SIDE1)
    cand2 = (
        li.crossJoin(F.broadcast(best1))
        .crossJoin(F.broadcast(cands))
        .groupBy(
            "feat", "thr", "f0", "g1l", "g1r", "n", "sy", "nl1tot", "bf1", "bt1"
        )
        .agg(
            F.sum(side.cast("int")).cast("long").alias("nl"),
            F.sum(F.when(side, F.col("y")).otherwise(0)).cast("long").alias("syl"),
            F.sum((side & l1).cast("int")).cast("long").alias("nl1l"),
        )
    )
    cand2v = (
        cand2.filter((F.col("nl") > 0) & (F.col("nl") < F.col("n")))
        .withColumn("sr2l", F.expr(_SR2L))
        .withColumn("sr2r", F.expr(_SR2R))
        .withColumn("gain2", F.expr(_GAIN2))
    )
    # best2 keeps its pin: dropping it was measured FLAT on a fresh
    # build+action (the checkpoint's Catalyst pass just moves into the
    # action's planning) while tripling pure re-execution (the round-2
    # expansion scan re-runs on every later action instead of reading
    # the 1-row checkpoint) — the pin is the better trade for any
    # multi-action consumer
    best2 = argmax(
        cand2v, "gain2", ["feat", "thr", "sr2l", "sr2r", "nl", "n"]
    ).select(
        F.col("feat").alias("bf2"),
        F.col("thr").alias("bt2"),
        F.expr(_G2L).alias("g2l"),
        F.expr(_G2R).alias("g2r"),
    ).localCheckpoint(eager=False)
    model = best1.crossJoin(best2)
    fin = (
        li.crossJoin(F.broadcast(model))
        .groupBy(
            "bf1", "bt1", "g1l", "g1r", "bf2", "bt2", "g2l", "g2r", "f0", "n"
        )
        .agg(
            F.sum(
                F.floor(
                    F.expr(f"(y - {_PRED}) * (y - {_PRED})") / F.lit(10000.0)
                    + F.lit(0.5)
                )
                .cast("long")
                .cast("decimal(38,0)")
            ).alias("sse_t"),
            F.sum(
                F.floor(
                    F.expr("(y - f0) * (y - f0)") / F.lit(10000.0) + F.lit(0.5)
                )
                .cast("long")
                .cast("decimal(38,0)")
            ).alias("sse0_t"),
        )
    )
    return fin.select(
        F.col("n").alias("n_rows"),
        F.col("bf1").alias("feature_1"),
        F.col("bt1").cast("long").alias("threshold_1"),
        pround(F.col("g1l") / F.lit(100.0), 6).alias("gamma1_left"),
        pround(F.col("g1r") / F.lit(100.0), 6).alias("gamma1_right"),
        F.col("bf2").alias("feature_2"),
        F.col("bt2").cast("long").alias("threshold_2"),
        pround(F.col("g2l") / F.lit(100.0), 6).alias("gamma2_left"),
        pround(F.col("g2r") / F.lit(100.0), 6).alias("gamma2_right"),
        pround(F.col("f0") / F.lit(100.0), 6).alias("base_prediction"),
        pround(F.sqrt(F.col("sse_t").cast("double") / F.col("n")), 6).alias(
            "train_rmse"
        ),
        pround(
            F.lit(1.0)
            - F.col("sse_t").cast("double") / F.col("sse0_t").cast("double"),
            6,
        ).alias("r2_vs_mean"),
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser–Ney bigram LM scoring
# ---------------------------------------------------------------------------

_TOKS = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"
#: P_KN per bigram instance on exact integer count operands (D = 0.75)
_PKN = (
    "(greatest(cb - 0.75, 0.0) / cc"
    " + (0.75 * n1fwd / cc) * (CAST(n1back AS DOUBLE) / bt))"
)


@register(
    "text_kneser_ney_bigram",
    oracle=f"""
    WITH toksd AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    tok AS (
        SELECT doc_id, source, toks[i] AS w,
               CASE WHEN i > 1 THEN toks[i - 1] END AS prev
        FROM toksd, unnest(range(1, len(toks) + 1)) AS u(i)
    ),
    bi AS (
        SELECT prev, w, CAST(count(*) AS BIGINT) AS cb
        FROM tok WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    ctx AS (
        SELECT prev, CAST(sum(cb) AS BIGINT) AS cc,
               CAST(count(*) AS BIGINT) AS n1fwd
        FROM bi GROUP BY 1
    ),
    cont AS (SELECT w, CAST(count(*) AS BIGINT) AS n1back FROM bi GROUP BY 1),
    btot AS (SELECT CAST(count(*) AS BIGINT) AS bt FROM bi),
    inst AS (
        SELECT t.source,
               CAST(floor(ln({_PKN}) * 1000000 + 0.5) AS BIGINT) AS lp_ticks
        FROM tok t
        JOIN bi ON bi.prev = t.prev AND bi.w = t.w
        JOIN ctx ON ctx.prev = t.prev
        JOIN cont ON cont.w = t.w
        CROSS JOIN btot
        WHERE t.prev IS NOT NULL
    ),
    per_source AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(lp_ticks) AS BIGINT) AS slp
        FROM inst GROUP BY 1
    )
    SELECT source, n_bigrams,
           round(-(CAST(slp AS DOUBLE) / 1000000.0 / n_bigrams), 6) AS avg_nll,
           round(exp(-(CAST(slp AS DOUBLE) / 1000000.0 / n_bigrams)), 6)
               AS perplexity
    FROM per_source
    """,
    doc="Interpolated Kneser–Ney bigram LM scoring per source — the "
    "proper-smoothing upgrade of the 0.7/0.3-interpolated bigram LM: "
    "P_KN(w|prev) = max(c(prev,w)-D, 0)/c(prev) + (D·N1+(prev·)/"
    "c(prev)) · N1+(·w)/|bigrams| with absolute discount D=0.75 and "
    "CONTINUATION counts (in how many distinct contexts a word appears "
    "— the KN insight that makes 'Francisco' cheap after anything but "
    "'San'). All counts are exact integers from three groupBys over "
    "one position-exploded pass; per-instance log-probs tick to 1e6 "
    "nats so the per-source sums are order-free; perplexity closes on "
    "the |sources| frame. Token-key equi-joins are Zipf-skewed — AQE "
    "skew split or a top-V broadcast cap at 100 TB, same as the "
    "sibling LM queries.",
    tags=("text", "lm", "quality"),
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(
            F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))
        ).alias("pos", "w"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    tok = (
        toks.withColumn("prev", F.lag("w").over(wdoc))
        .localCheckpoint(eager=False)
    )
    bi = (
        tok.filter(F.col("prev").isNotNull())
        .groupBy("prev", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    ctx = bi.groupBy("prev").agg(
        F.sum("cb").cast("long").alias("cc"),
        F.count(F.lit(1)).cast("long").alias("n1fwd"),
    )
    cont = bi.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n1back"))
    btot = bi.agg(F.count(F.lit(1)).cast("long").alias("bt"))
    inst = (
        tok.filter(F.col("prev").isNotNull())
        .join(bi, ["prev", "w"])
        .join(ctx, "prev")
        .join(cont, "w")
        .crossJoin(F.broadcast(btot))
        .select(
            "source",
            F.floor(F.log(F.expr(_PKN)) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("lp_ticks"),
        )
    )
    per_source = inst.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("lp_ticks").cast("long").alias("slp"),
    )
    avg_nll = -(F.col("slp").cast("double") / F.lit(1000000.0) / F.col("n_bigrams"))
    return per_source.select(
        "source",
        "n_bigrams",
        pround(avg_nll, 6).alias("avg_nll"),
        pround(F.exp(avg_nll), 6).alias("perplexity"),
    )


# ---------------------------------------------------------------------------
# Empirical-Bayes beta-binomial shrinkage
# ---------------------------------------------------------------------------

#: method-of-moments alpha/beta and the shrunk rate — shared SQL text
_KAPPA = "(m * (1.0 - m) / v - 1.0)"
_SHRUNK = "((x + alpha) / (n_ev + alpha + beta))"


@register(
    "a_empirical_bayes_shrinkage",
    oracle=f"""
    WITH u AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    tick AS (
        SELECT *, CAST(floor(CAST(x AS DOUBLE) / n_ev * 1000000 + 0.5)
                       AS BIGINT) AS rt
        FROM u
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS nu,
               CAST(sum(rt) AS BIGINT) AS sr,
               CAST(sum(CAST(rt AS DECIMAL(18,0)) * CAST(rt AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS sr2
        FROM tick
    ),
    ab AS (
        SELECT nu,
               CAST(sr AS DOUBLE) / nu / 1000000.0 AS m,
               (CAST(sr2 AS DOUBLE) / nu
                - (CAST(sr AS DOUBLE) / nu) * (CAST(sr AS DOUBLE) / nu))
               / 1000000.0 / 1000000.0 AS v
        FROM mom
    ),
    prior AS (
        SELECT nu, m, v,
               m * {_KAPPA} AS alpha,
               (1.0 - m) * {_KAPPA} AS beta
        FROM ab
    )
    SELECT t.user_id, t.n_ev AS n_events, t.x AS n_pos,
           round(CAST(t.x AS DOUBLE) / t.n_ev, 6) AS raw_rate,
           round({_SHRUNK.replace('x', 't.x').replace('n_ev', 't.n_ev')}, 6)
               AS shrunk_rate,
           round(p.alpha, 6) AS alpha,
           round(p.beta, 6) AS beta
    FROM tick t CROSS JOIN prior p
    """,
    doc="Empirical-Bayes beta-binomial shrinkage of per-user purchase "
    "rates (the 'batting average' estimator): the Beta prior's "
    "alpha/beta come from method-of-moments on the observed rate "
    "distribution — rates tick to 1e6 so the first two moments are "
    "exact integer sums from ONE pass over the per-user frame — and "
    "each user's posterior mean (x+alpha)/(n+alpha+beta) shrinks "
    "small-sample rates toward the population mean while leaving "
    "high-volume users almost untouched. The hierarchical-stats "
    "primitive every per-key metric pipeline needs before ranking "
    "keys by rate; costs one row-scan aggregate + one broadcast of "
    "two scalars at any corpus size.",
    tags=("stats", "bayes"),
)
def a_empirical_bayes_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("long")
        .alias("x"),
    )
    tick = u.withColumn(
        "rt",
        F.floor(F.col("x").cast("double") / F.col("n_ev") * 1000000 + F.lit(0.5))
        .cast("long"),
    )
    mom = tick.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("rt").cast("long").alias("sr"),
        F.sum(F.col("rt").cast("decimal(18,0)") * F.col("rt").cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("sr2"),
    )
    m = F.col("sr").cast("double") / F.col("nu") / F.lit(1000000.0)
    v = (
        F.col("sr2").cast("double") / F.col("nu")
        - (F.col("sr").cast("double") / F.col("nu"))
        * (F.col("sr").cast("double") / F.col("nu"))
    ) / F.lit(1000000.0) / F.lit(1000000.0)
    prior = mom.select(
        m.alias("m"), v.alias("v")
    ).select(
        "m",
        "v",
        F.expr(f"m * {_KAPPA}").alias("alpha"),
        F.expr(f"(1.0 - m) * {_KAPPA}").alias("beta"),
    )
    return tick.crossJoin(F.broadcast(prior)).select(
        "user_id",
        F.col("n_ev").alias("n_events"),
        F.col("x").alias("n_pos"),
        pround(F.col("x").cast("double") / F.col("n_ev"), 6).alias("raw_rate"),
        pround(F.expr(_SHRUNK), 6).alias("shrunk_rate"),
        pround("alpha", 6).alias("alpha"),
        pround("beta", 6).alias("beta"),
    )
