"""Round-4 wave 29: pinball-loss evaluation of quantile forecasts on a
chronological split, linear-time MMD two-sample test between embedding
groups, and Mann–Kendall trend detection over daily aggregates.

Scale extensions beyond the reference pipeline surface. House rules:
pinball losses are exact integer tick sums (q in tenths x cents), kernel
values tick to 1e6 before row-order-dependent summation, daily means tick
to 1e6 so Mann–Kendall sign comparisons are pure integer compares, and
every quadratic step runs on a bounded frame (|days| per series, paired
samples) — never row-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.functions.literals import literal_df
from cicevse2024_tfm_datapipeline_spark.operators.similarity import (
    as_double_array,
    dot_expr,
)
from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Pinball-loss evaluation of quantile forecasts
# ---------------------------------------------------------------------------

_QS = (1, 5, 9)  # quantiles in tenths: 0.1, 0.5, 0.9


@register(
    "a_pinball_loss_quantile_eval",
    oracle=f"""
    WITH ev AS (
        SELECT event_type, ts, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    idx AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id) AS rn,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM ev
    ),
    train AS (SELECT * FROM idx WHERE rn <= n // 2),
    test AS (SELECT * FROM idx WHERE rn > n // 2),
    tr_rank AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents, event_id) AS vr,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_train
        FROM train
    ),
    qs AS (SELECT * FROM (VALUES (1), (5), (9)) AS v(q10)),
    fc AS (
        SELECT r.event_type, q.q10, r.n_train, r.cents AS forecast_cents
        FROM tr_rank r JOIN qs q
          ON r.vr = CAST(ceil(q.q10 * r.n_train / 10.0) AS BIGINT)
    ),
    loss AS (
        SELECT f.event_type, f.q10, f.n_train, f.forecast_cents,
               CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN te.cents >= f.forecast_cents
                             THEN f.q10 * (te.cents - f.forecast_cents)
                             ELSE (10 - f.q10) * (f.forecast_cents - te.cents)
                        END) AS BIGINT) AS loss_ticks
        FROM fc f JOIN test te ON te.event_type = f.event_type
        GROUP BY 1, 2, 3, 4
    )
    SELECT event_type, round(q10 / 10.0, 6) AS quantile,
           n_train, n_test,
           round(forecast_cents / 100.0, 6) AS forecast,
           round(CAST(loss_ticks AS DOUBLE) / 10.0 / 100.0 / n_test, 6)
               AS pinball_loss
    FROM loss
    """,
    doc="Pinball (quantile) loss evaluation of per-series quantile "
    "forecasts on a chronological split: the first half of each event "
    "series trains exact empirical quantiles (0.1/0.5/0.9 via the "
    "ceil(q*n) order statistic — a rank filter, no approx sketch), the "
    "second half scores them with the pinball loss, the proper scoring "
    "rule for quantile forecasts. Everything is integer end-to-end: "
    "values tick to cents, q to tenths, so each test row contributes an "
    "exact BIGINT loss tick and the per-(series, q) sums are order-"
    "free. Windows are partitioned per series; the loss pass is one "
    "broadcast join of the |series| x 3 forecast frame against the test "
    "scan. The readout a forecasting pipeline gates its quantile models "
    "on.",
    tags=("stats", "eval", "forecast"),
)
def a_pinball_loss_quantile_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    wt = Window.partitionBy("event_type")
    idx = ev.select(
        "*",
        F.row_number().over(wt.orderBy("ts", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wt).cast("long").alias("n"),
    )
    train = idx.filter(F.col("rn") <= F.floor(F.col("n") / 2))
    test = idx.filter(F.col("rn") > F.floor(F.col("n") / 2))
    tr_rank = train.select(
        "event_type",
        "cents",
        F.row_number().over(wt.orderBy("cents", "event_id")).alias("vr"),
        F.count(F.lit(1)).over(wt).cast("long").alias("n_train"),
    )
    qs = literal_df(spark, [(q,) for q in _QS], "q10 int")
    fc = tr_rank.join(
        F.broadcast(qs),
        F.col("vr")
        == F.ceil(F.col("q10") * F.col("n_train") / F.lit(10.0)).cast("long"),
    ).select("event_type", "q10", "n_train", F.col("cents").alias("forecast_cents"))
    te = test.select("event_type", F.col("cents").alias("t_cents"))
    loss = (
        te.join(F.broadcast(fc), "event_type")
        .groupBy("event_type", "q10", "n_train", "forecast_cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.col("t_cents") >= F.col("forecast_cents"),
                    F.col("q10") * (F.col("t_cents") - F.col("forecast_cents")),
                ).otherwise(
                    (F.lit(10) - F.col("q10"))
                    * (F.col("forecast_cents") - F.col("t_cents"))
                )
            )
            .cast("long")
            .alias("loss_ticks"),
        )
    )
    return loss.select(
        "event_type",
        pround(F.col("q10") / F.lit(10.0), 6).alias("quantile"),
        "n_train",
        "n_test",
        pround(F.col("forecast_cents") / F.lit(100.0), 6).alias("forecast"),
        pround(
            F.col("loss_ticks").cast("double")
            / F.lit(10.0)
            / F.lit(100.0)
            / F.col("n_test"),
            6,
        ).alias("pinball_loss"),
    )


# ---------------------------------------------------------------------------
# Linear-time MMD two-sample test
# ---------------------------------------------------------------------------


def _poly_kernel_sql(u: str, w: str) -> str:
    dot = (
        f"list_reduce(list_transform(range(1, len({u}) + 1), "
        f"i -> {u}[i] * {w}[i]), (x, y) -> x + y)"
    )
    return f"((1.0 + {dot} / len({u})) * (1.0 + {dot} / len({u})))"


@register(
    "a_mmd_linear_two_sample",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
        WHERE label IN (0, 1)
    ),
    idx AS (
        SELECT label, v,
               row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM e
    ),
    paired AS (
        SELECT label, CAST((rn - 1) // 2 AS BIGINT) AS pid,
               min_by(v, rn) AS v1, max_by(v, rn) AS v2,
               CAST(count(*) AS BIGINT) AS cnt
        FROM idx GROUP BY 1, 2
    ),
    full_pairs AS (SELECT * FROM paired WHERE cnt = 2),
    h AS (
        SELECT a.pid,
               CAST(floor(({_poly_kernel_sql('a.v1', 'a.v2')}
                           + {_poly_kernel_sql('b.v1', 'b.v2')}
                           - {_poly_kernel_sql('a.v1', 'b.v2')}
                           - {_poly_kernel_sql('a.v2', 'b.v1')})
                          * 1000000 + 0.5) AS BIGINT) AS h_ticks
        FROM full_pairs a JOIN full_pairs b ON a.pid = b.pid
        WHERE a.label = 0 AND b.label = 1
    ),
    ns AS (
        SELECT CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
               CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b
        FROM e
    )
    SELECT ns.n_a, ns.n_b,
           CAST(count(*) AS BIGINT) AS m_pairs,
           round(CAST(sum(h_ticks) AS DOUBLE) / count(*) / 1000000.0, 6)
               AS mmd2_linear
    FROM h CROSS JOIN ns
    GROUP BY 1, 2
    """,
    doc="Linear-time MMD two-sample test (Gretton et al.) between two "
    "embedding populations (labels 0 vs 1): samples in each group pair "
    "up consecutively by id, and each pair index contributes "
    "h = k(x1,x2) + k(y1,y2) - k(x1,y2) - k(x2,y1) with the degree-2 "
    "polynomial kernel (1 + <u,w>/d)^2 — exact sequential-fold dot "
    "products, h ticked to 1e6 so the cross-row sum is an order-free "
    "BIGINT. The estimator is O(n) in kernel evaluations (the quadratic "
    "all-pairs MMD is exactly what does NOT survive 100 TB) and the "
    "pair join is an equi-join on pair index. The drift gate an "
    "embedding pipeline runs between training batches.",
    tags=("stats", "similarity", "drift"),
)
def a_mmd_linear_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("label").isin(0, 1))
        .select("vec_id", as_double_array("embedding").alias("v"), "label")
    )
    rn = F.row_number().over(Window.partitionBy("label").orderBy("vec_id"))
    idx = e.select("label", "v", rn.alias("rn"))
    paired = (
        idx.withColumn("pid", F.floor((F.col("rn") - 1) / 2).cast("long"))
        .groupBy("label", "pid")
        .agg(
            F.min_by("v", "rn").alias("v1"),
            F.max_by("v", "rn").alias("v2"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
        .filter(F.col("cnt") == 2)
    )

    def k(u, w):
        d = dot_expr(u, w)
        base = F.lit(1.0) + d / F.size(u)
        return base * base

    a = paired.filter(F.col("label") == 0).select(
        F.col("pid").alias("pa"), F.col("v1").alias("a1"), F.col("v2").alias("a2")
    )
    b = paired.filter(F.col("label") == 1).select(
        F.col("pid").alias("pb"), F.col("v1").alias("b1"), F.col("v2").alias("b2")
    )
    h = a.join(b, F.col("pa") == F.col("pb")).select(
        F.floor(
            (
                k(F.col("a1"), F.col("a2"))
                + k(F.col("b1"), F.col("b2"))
                - k(F.col("a1"), F.col("b2"))
                - k(F.col("a2"), F.col("b1"))
            )
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("h_ticks")
    )
    ns = e.agg(
        F.sum((F.col("label") == 0).cast("int")).cast("long").alias("n_a"),
        F.sum((F.col("label") == 1).cast("int")).cast("long").alias("n_b"),
    )
    return (
        h.crossJoin(F.broadcast(ns))
        .groupBy("n_a", "n_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m_pairs"),
            pround(
                F.sum("h_ticks").cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0),
                6,
            ).alias("mmd2_linear"),
        )
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend test over daily aggregates
# ---------------------------------------------------------------------------


@register(
    "a_mann_kendall_trend",
    oracle="""
    WITH ev AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    daily AS (
        SELECT event_type, day,
               CAST(floor(CAST(sum(cents) AS DOUBLE) / count(*) * 10000 + 0.5)
                    AS BIGINT) AS mean_ticks
        FROM ev GROUP BY 1, 2
    ),
    s AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN b.mean_ticks > a.mean_ticks THEN 1
                             WHEN b.mean_ticks < a.mean_ticks THEN -1
                             ELSE 0 END) AS BIGINT) AS s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
        GROUP BY 1
    ),
    nd AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1
    ),
    ties AS (
        SELECT event_type,
               CAST(coalesce(sum(tc * (tc - 1) * (2 * tc + 5)), 0) AS BIGINT)
                   AS tie_term
        FROM (
            SELECT event_type, mean_ticks, CAST(count(*) AS BIGINT) AS tc
            FROM daily GROUP BY 1, 2
        ) WHERE tc > 1
        GROUP BY 1
    ),
    z AS (
        SELECT s.event_type, nd.n, s.s_stat,
               (nd.n * (nd.n - 1) * (2 * nd.n + 5)
                - coalesce(t.tie_term, 0)) / 18.0 AS var_s
        FROM s JOIN nd USING (event_type)
        LEFT JOIN ties t USING (event_type)
    )
    SELECT event_type, n AS n_days, s_stat,
           round(var_s, 6) AS var_s,
           round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                      WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                      ELSE 0.0 END, 6) AS z,
           CASE WHEN s_stat > 0 AND (s_stat - 1) / sqrt(var_s) > 1.959964
                    THEN 'increasing'
                WHEN s_stat < 0 AND (s_stat + 1) / sqrt(var_s) < -1.959964
                    THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM z
    """,
    doc="Mann–Kendall non-parametric trend test per event series over its "
    "daily mean value: S = sum of pairwise signs across days, variance "
    "with the exact tie correction, continuity-corrected z, and the "
    "5%-level monotone-trend verdict. Daily means tick to 1e6 so every "
    "pairwise comparison is an integer compare (no float sign flips "
    "between engines). The row scan reduces to ONE daily aggregate; the "
    "quadratic sign sum runs on the |days|-per-series frame — bounded "
    "by the calendar, not the corpus, so 100 TB of events costs the "
    "same O(days^2) tail as 1 GB. The drift detector a metrics "
    "warehouse runs across every series nightly.",
    tags=("stats", "trend", "timeseries"),
)
def a_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.floor(
            F.sum("cents").cast("double") / F.count(F.lit(1)) * 10000 + F.lit(0.5)
        )
        .cast("long")
        .alias("mean_ticks")
    )
    a = daily.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("da"),
        F.col("mean_ticks").alias("ma"),
    )
    b = daily.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("db"),
        F.col("mean_ticks").alias("mb"),
    )
    s = (
        a.join(b, "et")
        .filter(F.col("da") < F.col("db"))
        .groupBy("et")
        .agg(
            F.sum(
                F.when(F.col("mb") > F.col("ma"), 1)
                .when(F.col("mb") < F.col("ma"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nd = daily.groupBy(F.col("event_type").alias("et")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ties = (
        daily.groupBy("event_type", "mean_ticks")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .filter(F.col("tc") > 1)
        .groupBy(F.col("event_type").alias("et"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    z = (
        s.join(nd, "et")
        .join(ties, "et", "left")
        .select(
            "et",
            "n",
            "s_stat",
            (
                (
                    F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                    - F.coalesce(F.col("tie_term"), F.lit(0))
                )
                / F.lit(18.0)
            ).alias("var_s"),
        )
    )
    zval = (
        F.when(
            F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(F.col("var_s"))
        )
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    return z.select(
        F.col("et").alias("event_type"),
        F.col("n").alias("n_days"),
        "s_stat",
        pround("var_s", 6).alias("var_s"),
        pround(zval, 6).alias("z"),
        F.when(
            (F.col("s_stat") > 0)
            & ((F.col("s_stat") - 1) / F.sqrt(F.col("var_s")) > 1.959964),
            F.lit("increasing"),
        )
        .when(
            (F.col("s_stat") < 0)
            & ((F.col("s_stat") + 1) / F.sqrt(F.col("var_s")) < -1.959964),
            F.lit("decreasing"),
        )
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )
