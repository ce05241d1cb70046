"""Round-4 wave 35: the log-rank test comparing two survival curves
(the inference companion to the Kaplan–Meier estimator), first-occurrence
sequential-pattern mining (A-then-B support/confidence), and DAU/MAU
stickiness.

Scale extensions beyond the reference pipeline surface. House rules: the
row scan reduces to per-user / per-(time, group) aggregates before
anything quadratic; risk sets come from the grouped two-phase cumsum
(never an unpartitioned window on the Spark side); per-time log-rank
contributions tick to integers so the chi-square sums are order-free;
ordered-pair supports are exact integer counts over a |event-types|^2
frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.scan import grouped_cumsum
from cicevse2024_tfm_datapipeline_spark.plans.wave5 import _US
from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Log-rank test between two survival arms
# ---------------------------------------------------------------------------


@register(
    "a_logrank_test",
    oracle="""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS arm,
               min(epoch_us(ts)) AS t0,
               min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS tp,
               max(epoch_us(ts)) AS tl
        FROM events GROUP BY 1, 2
    ),
    obs AS (
        SELECT arm,
               CASE WHEN tp IS NOT NULL THEN (tp - t0) // 1000
                    ELSE (tl - t0) // 1000 END AS t_ms,
               CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM per_user
    ),
    cells AS (
        SELECT arm, t_ms, CAST(sum(ev) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS leave_cnt
        FROM obs GROUP BY 1, 2
    ),
    arm_n AS (SELECT arm, CAST(count(*) AS BIGINT) AS na FROM obs GROUP BY 1),
    grid AS (
        SELECT a.arm, tt.t_ms,
               coalesce(c.d, 0) AS d, coalesce(c.leave_cnt, 0) AS leave_cnt
        FROM (SELECT DISTINCT t_ms FROM cells) tt
        CROSS JOIN (SELECT DISTINCT arm FROM arm_n) a
        LEFT JOIN cells c ON c.arm = a.arm AND c.t_ms = tt.t_ms
    ),
    risk AS (
        SELECT g.arm, g.t_ms, g.d,
               an.na - coalesce(sum(g.leave_cnt) OVER (
                   PARTITION BY g.arm ORDER BY g.t_ms
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
        FROM grid g JOIN arm_n an ON an.arm = g.arm
    ),
    times AS (
        SELECT t_ms,
               CAST(sum(d) AS BIGINT) AS dt,
               CAST(sum(n_risk) AS BIGINT) AS nt,
               CAST(sum(CASE WHEN arm = 1 THEN d ELSE 0 END) AS BIGINT)
                   AS d1,
               CAST(sum(CASE WHEN arm = 1 THEN n_risk ELSE 0 END) AS BIGINT)
                   AS n1
        FROM risk GROUP BY 1
    ),
    contrib AS (
        SELECT CAST(floor((d1 - CAST(dt AS DOUBLE) * n1 / nt) * 1000000
                          + 0.5) AS BIGINT) AS ome_t,
               CAST(floor(CASE WHEN nt > 1 THEN
                          CAST(dt AS DOUBLE) * n1 / nt
                          * (1.0 - CAST(n1 AS DOUBLE) / nt)
                          * (nt - dt) / (nt - 1) ELSE 0.0 END
                          * 1000000 + 0.5) AS BIGINT) AS var_t
        FROM times WHERE dt > 0
    ),
    stat AS (
        SELECT CAST(count(*) AS BIGINT) AS n_times,
               CAST(sum(ome_t) AS BIGINT) AS ome,
               CAST(sum(var_t) AS BIGINT) AS var
        FROM contrib
    ),
    arms AS (
        SELECT CAST(max(CASE WHEN arm = 0 THEN na END) AS BIGINT) AS n_arm0,
               CAST(max(CASE WHEN arm = 1 THEN na END) AS BIGINT) AS n_arm1
        FROM arm_n
    )
    SELECT a.n_arm0, a.n_arm1, s.n_times,
           round(s.ome / 1000000.0, 6) AS observed_minus_expected,
           round(s.var / 1000000.0, 6) AS variance,
           round((s.ome / 1000000.0) / sqrt(s.var / 1000000.0), 6) AS z,
           round((s.ome / 1000000.0) * (s.ome / 1000000.0)
                 / (s.var / 1000000.0), 6) AS chi2
    FROM stat s CROSS JOIN arms a
    """,
    doc="Log-rank test between two survival arms (users split by id "
    "parity; time-to-first-purchase with censoring at last activity — "
    "the same survival frame as the Kaplan–Meier query, now with "
    "INFERENCE): at each event time the arm-1 observed deaths compare "
    "against the hypergeometric expectation d*n1/n, variance "
    "d*(n1/n)*(1-n1/n)*(n-d)/(n-1); per-time contributions tick to "
    "1e6 so the O-E and variance sums are order-free, closing to the "
    "z and chi-square(1) statistic. Risk sets come from the grouped "
    "cumulative scan over the (time, arm) grid — a frame bounded by "
    "distinct event times, never raw rows. The A/B readout for "
    "retention/churn experiments where means lie and curves matter.",
    tags=("stats", "survival", "testing"),
)
def a_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    us = F.expr(_US)
    per_user = ev.groupBy("user_id", (F.col("user_id") % 2).alias("arm")).agg(
        F.min(us).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("tp"),
        F.max(us).alias("tl"),
    )
    obs = per_user.select(
        "arm",
        F.when(
            F.col("tp").isNotNull(),
            F.floor((F.col("tp") - F.col("t0")) / 1000),
        )
        .otherwise(F.floor((F.col("tl") - F.col("t0")) / 1000))
        .cast("long")
        .alias("t_ms"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    cells = obs.groupBy("arm", "t_ms").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leave_cnt"),
    )
    arm_n = obs.groupBy("arm").agg(F.count(F.lit(1)).cast("long").alias("na"))
    tt = cells.select("t_ms").distinct()
    grid = (
        tt.crossJoin(F.broadcast(arm_n.select("arm")))
        .join(cells, ["arm", "t_ms"], "left")
        .select(
            "arm",
            "t_ms",
            F.coalesce(F.col("d"), F.lit(0)).alias("d"),
            F.coalesce(F.col("leave_cnt"), F.lit(0)).alias("leave_cnt"),
        )
    )
    cum = grouped_cumsum(grid, ["arm"], ["t_ms"], ["leave_cnt"])
    risk = cum.join(F.broadcast(arm_n), "arm").select(
        "arm",
        "t_ms",
        "d",
        (F.col("na") - (F.col("cum_leave_cnt") - F.col("leave_cnt"))).alias(
            "n_risk"
        ),
    )
    times = risk.groupBy("t_ms").agg(
        F.sum("d").cast("long").alias("dt"),
        F.sum("n_risk").cast("long").alias("nt"),
        F.sum(F.when(F.col("arm") == 1, F.col("d")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_risk")).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    e1 = F.col("dt").cast("double") * F.col("n1") / F.col("nt")
    var_t = F.when(
        F.col("nt") > 1,
        F.col("dt").cast("double")
        * F.col("n1")
        / F.col("nt")
        * (F.lit(1.0) - F.col("n1").cast("double") / F.col("nt"))
        * (F.col("nt") - F.col("dt"))
        / (F.col("nt") - 1),
    ).otherwise(F.lit(0.0))
    contrib = times.filter(F.col("dt") > 0).select(
        F.floor((F.col("d1") - e1) * 1000000 + F.lit(0.5)).cast("long").alias(
            "ome_t"
        ),
        F.floor(var_t * 1000000 + F.lit(0.5)).cast("long").alias("var_t"),
    )
    stat = contrib.agg(
        F.count(F.lit(1)).cast("long").alias("n_times"),
        F.sum("ome_t").cast("long").alias("ome"),
        F.sum("var_t").cast("long").alias("var"),
    )
    arms = arm_n.agg(
        F.max(F.when(F.col("arm") == 0, F.col("na"))).cast("long").alias("n_arm0"),
        F.max(F.when(F.col("arm") == 1, F.col("na"))).cast("long").alias("n_arm1"),
    )
    ome_d = F.col("ome") / F.lit(1000000.0)
    var_d = F.col("var") / F.lit(1000000.0)
    return stat.crossJoin(F.broadcast(arms)).select(
        "n_arm0",
        "n_arm1",
        "n_times",
        pround(ome_d, 6).alias("observed_minus_expected"),
        pround(var_d, 6).alias("variance"),
        pround(ome_d / F.sqrt(var_d), 6).alias("z"),
        pround(ome_d * ome_d / var_d, 6).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# First-occurrence sequential patterns
# ---------------------------------------------------------------------------


@register(
    "a_sequential_patterns",
    oracle="""
    WITH firsts AS (
        SELECT user_id, event_type,
               min(epoch_us(ts)) AS ft,
               min(event_id) AS tie
        FROM events GROUP BY 1, 2
    ),
    users AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
              FROM events),
    pairs AS (
        SELECT a.event_type AS antecedent, b.event_type AS consequent,
               CAST(count(*) AS BIGINT) AS n_both,
               CAST(sum(CASE WHEN a.ft < b.ft
                             OR (a.ft = b.ft AND a.tie < b.tie)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_ordered
        FROM firsts a JOIN firsts b
          ON b.user_id = a.user_id AND b.event_type <> a.event_type
        GROUP BY 1, 2
    )
    SELECT p.antecedent, p.consequent, p.n_both, p.n_ordered,
           round(CAST(p.n_ordered AS DOUBLE) / u.nu, 6) AS support,
           round(CAST(p.n_ordered AS DOUBLE) / p.n_both, 6) AS confidence
    FROM pairs p CROSS JOIN users u
    """,
    doc="First-occurrence sequential-pattern mining: for every ordered "
    "pair of event types (A -> B), in how many user histories does the "
    "first A precede the first B (support over all users, confidence "
    "over users having both) — the ordered complement to the "
    "unordered Apriori basket mining, and the signal a funnel designer "
    "mines to find the ACTUAL order users do things in. ONE per-(user, "
    "type) first-occurrence aggregate (exact integer micros + event-id "
    "tiebreak so simultaneous firsts order deterministically), then a "
    "per-user self-join bounded by |event types|^2 per user. Counts "
    "are exact integers end-to-end.",
    tags=("stats", "mining", "sequence"),
)
def a_sequential_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id", "event_type").agg(
        F.min(F.expr(_US)).alias("ft"),
        F.min("event_id").alias("tie"),
    )
    users = ev.agg(F.countDistinct("user_id").cast("long").alias("nu"))
    a = firsts.select(
        "user_id",
        F.col("event_type").alias("antecedent"),
        F.col("ft").alias("fa"),
        F.col("tie").alias("ta"),
    )
    b = firsts.select(
        "user_id",
        F.col("event_type").alias("consequent"),
        F.col("ft").alias("fb"),
        F.col("tie").alias("tb"),
    )
    ordered = (
        (F.col("fa") < F.col("fb"))
        | ((F.col("fa") == F.col("fb")) & (F.col("ta") < F.col("tb")))
    )
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_both"),
            F.sum(ordered.cast("int")).cast("long").alias("n_ordered"),
        )
    )
    return pairs.crossJoin(F.broadcast(users)).select(
        "antecedent",
        "consequent",
        "n_both",
        "n_ordered",
        pround(F.col("n_ordered").cast("double") / F.col("nu"), 6).alias("support"),
        pround(F.col("n_ordered").cast("double") / F.col("n_both"), 6).alias(
            "confidence"
        ),
    )


# ---------------------------------------------------------------------------
# DAU / MAU stickiness
# ---------------------------------------------------------------------------


@register(
    "a_dau_mau_stickiness",
    oracle="""
    WITH ev AS (
        SELECT CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS mon,
               CAST(ts AS DATE) AS day, user_id
        FROM events
    ),
    dau AS (
        SELECT mon, day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM ev GROUP BY 1, 2
    ),
    mau AS (
        SELECT mon, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        FROM ev GROUP BY 1
    ),
    agg AS (
        SELECT mon, CAST(count(*) AS BIGINT) AS active_days,
               CAST(sum(dau) AS BIGINT) AS dau_sum
        FROM dau GROUP BY 1
    )
    SELECT strftime(a.mon, '%Y-%m') AS month, a.active_days, m.mau,
           round(CAST(a.dau_sum AS DOUBLE) / a.active_days, 6) AS avg_dau,
           round(CAST(a.dau_sum AS DOUBLE) / a.active_days / m.mau, 6)
               AS stickiness
    FROM agg a JOIN mau m USING (mon)
    """,
    doc="DAU/MAU stickiness per calendar month: average daily active "
    "users over the month's active days divided by monthly actives — "
    "the engagement ratio product teams track (stickiness 1.0 = every "
    "monthly user shows up daily). Exact distinct counts at day and "
    "month grain (two groupBys over one scan), exact integer sums, "
    "closing ratios on the |months| frame. Complements the weekly "
    "cohort retention and growth-accounting queries.",
    tags=("stats", "engagement"),
)
def a_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        F.date_trunc("month", F.col("ts").cast("date"))
        .cast("date")
        .alias("mon"),
        F.col("ts").cast("date").alias("day"),
        "user_id",
    )
    dau = ev.groupBy("mon", "day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    mau = ev.groupBy("mon").agg(
        F.countDistinct("user_id").cast("long").alias("mau")
    )
    agg = dau.groupBy("mon").agg(
        F.count(F.lit(1)).cast("long").alias("active_days"),
        F.sum("dau").cast("long").alias("dau_sum"),
    )
    return agg.join(F.broadcast(mau), "mon").select(
        F.date_format("mon", "yyyy-MM").alias("month"),
        "active_days",
        "mau",
        pround(F.col("dau_sum").cast("double") / F.col("active_days"), 6).alias(
            "avg_dau"
        ),
        pround(
            F.col("dau_sum").cast("double") / F.col("active_days") / F.col("mau"),
            6,
        ).alias("stickiness"),
    )
