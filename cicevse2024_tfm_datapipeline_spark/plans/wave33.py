"""Round-4 wave 33: classical seasonal decomposition (trend / day-of-week
seasonal / residual), average-treatment-effect-on-treated via exact
subclassification, and lagged cross-correlation between two event series.

Scale extensions beyond the reference pipeline surface. House rules: the
row scan always reduces to ONE aggregate (daily means / stratum moments)
before any quadratic or windowed step; daily means tick to 1e6 and all
correlation/effect sums are exact integer (DECIMAL where products can
overflow); windows are partitioned per series over calendar-bounded
frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.functions.literals import literal_df
from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Classical seasonal decomposition
# ---------------------------------------------------------------------------


@register(
    "a_classical_decomposition",
    oracle="""
    WITH ev AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    daily AS (
        SELECT event_type, day, dayofweek(day) AS dow,
               CAST(floor(CAST(sum(cents) AS DOUBLE) / count(*) * 10000 + 0.5)
                    AS BIGINT) AS mt
        FROM ev GROUP BY 1, 2
    ),
    trended AS (
        SELECT *,
               CAST(sum(mt) OVER w AS BIGINT) AS s7,
               CAST(count(*) OVER w AS BIGINT) AS c7
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detr AS (
        SELECT event_type, dow,
               CAST(mt AS DOUBLE) - CAST(s7 AS DOUBLE) / c7 AS d
        FROM trended WHERE c7 = 7
    ),
    seas AS (
        SELECT event_type, CAST(dow AS BIGINT) AS dow,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(floor(sum(d) / count(*) + 0.5) AS BIGINT) AS si_ticks
        FROM detr GROUP BY 1, 2
    ),
    spread AS (
        SELECT event_type,
               CAST(max(si_ticks) - min(si_ticks) AS BIGINT) AS rng
        FROM seas GROUP BY 1
    )
    SELECT s.event_type, s.dow, s.n_days,
           round(s.si_ticks / 1000000.0, 6) AS seasonal_index,
           round(p.rng / 1000000.0, 6) AS seasonal_range
    FROM seas s JOIN spread p USING (event_type)
    """,
    doc="Classical (moving-average) seasonal decomposition of each event "
    "series' daily mean: trend = centered 7-day moving average "
    "(full-window rows only), seasonal index = mean detrended value per "
    "day-of-week, plus the per-series seasonal range as an amplitude "
    "readout. The row scan reduces to ONE daily aggregate; the MA "
    "window is partitioned per series over the calendar-bounded daily "
    "frame; daily means tick to 1e-4 before the window sum so the "
    "detrended values are identical doubles in both engines, and the "
    "seasonal means floor back to ticks. The decomposition a metrics "
    "warehouse runs before anomaly thresholds, so weekday structure "
    "doesn't trip the alerts.",
    tags=("stats", "timeseries", "seasonality"),
)
def a_classical_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .alias("mt")
    # Spark dayofweek is 1-based (Sunday=1); DuckDB is 0-based — align.
    ).withColumn("dow", F.dayofweek("day") - F.lit(1))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    trended = daily.select(
        "*",
        F.sum("mt").over(w).cast("long").alias("s7"),
        F.count(F.lit(1)).over(w).cast("long").alias("c7"),
    )
    detr = trended.filter(F.col("c7") == 7).select(
        "event_type",
        "dow",
        (F.col("mt").cast("double") - F.col("s7").cast("double") / F.col("c7")).alias(
            "d"
        ),
    )
    seas = detr.groupBy("event_type", F.col("dow").cast("long").alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.floor(F.sum("d") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("si_ticks"),
    )
    spread = seas.groupBy("event_type").agg(
        (F.max("si_ticks") - F.min("si_ticks")).cast("long").alias("rng")
    )
    return seas.join(F.broadcast(spread), "event_type").select(
        "event_type",
        "dow",
        "n_days",
        pround(F.col("si_ticks") / F.lit(1000000.0), 6).alias("seasonal_index"),
        pround(F.col("rng") / F.lit(1000000.0), 6).alias("seasonal_range"),
    )


# ---------------------------------------------------------------------------
# ATT via exact subclassification
# ---------------------------------------------------------------------------


@register(
    "a_att_subclassification",
    oracle="""
    WITH rel AS (
        SELECT c.c_mktsegment AS seg,
               CAST(floor(floor(c.c_acctbal * 100 + 0.5) / 250000.0)
                    AS BIGINT) AS band,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS treated,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    strata AS (
        SELECT seg, band,
               CAST(sum(treated) AS BIGINT) AS nt,
               CAST(sum(1 - treated) AS BIGINT) AS nc,
               CAST(sum(CASE WHEN treated = 1 THEN y ELSE 0 END) AS BIGINT)
                   AS syt,
               CAST(sum(CASE WHEN treated = 0 THEN y ELSE 0 END) AS BIGINT)
                   AS syc
        FROM rel GROUP BY 1, 2
    ),
    valid AS (SELECT * FROM strata WHERE nt > 0 AND nc > 0),
    tot AS (
        SELECT CAST(sum(nt) AS BIGINT) AS ntt FROM valid
    ),
    effects AS (
        SELECT v.seg, v.band, v.nt, v.nc,
               (CAST(v.syt AS DOUBLE) / v.nt - CAST(v.syc AS DOUBLE) / v.nc)
                   AS diff,
               CAST(v.nt AS DOUBLE) / t.ntt AS w
        FROM valid v CROSS JOIN tot t
    ),
    att AS (
        SELECT CAST(sum(CAST(floor(diff * w * 10000 + 0.5) AS BIGINT))
                    AS BIGINT) AS att_ticks
        FROM effects
    ),
    naive AS (
        SELECT (CAST(sum(CASE WHEN treated = 1 THEN y ELSE 0 END) AS DOUBLE)
                / sum(treated)
                - CAST(sum(CASE WHEN treated = 0 THEN y ELSE 0 END) AS DOUBLE)
                  / sum(1 - treated)) AS nd
        FROM rel
    )
    SELECT e.seg, e.band, e.nt AS n_treated, e.nc AS n_control,
           round(e.diff / 100.0, 6) AS stratum_diff,
           round(e.w, 6) AS stratum_weight,
           round(a.att_ticks / 10000.0 / 100.0, 6) AS att,
           round(n.nd / 100.0, 6) AS naive_diff
    FROM effects e CROSS JOIN att a CROSS JOIN naive n
    """,
    doc="Average treatment effect on the treated via exact "
    "subclassification: units (orders) stratify on observed covariates "
    "(customer segment x $2500 balance band), the per-stratum "
    "treated-vs-control outcome gap weights by the stratum's share of "
    "treated units, and only strata with common support (both groups "
    "present) contribute — the textbook Cochran adjustment that removes "
    "confounding carried by the stratification variables, shown next "
    "to the naive unadjusted difference. Stratum moments are ONE exact "
    "integer aggregate over the join; per-stratum contributions tick "
    "to 1e-4 cents so the ATT sum is order-free; everything after the "
    "scan runs on the |strata| frame.",
    tags=("stats", "causal"),
)
def a_att_subclassification(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
    rel = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(cents / F.lit(250000.0)).cast("long").alias("band"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("treated"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    strata = rel.groupBy("seg", "band").agg(
        F.sum("treated").cast("long").alias("nt"),
        F.sum(F.lit(1) - F.col("treated")).cast("long").alias("nc"),
        F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("syt"),
        F.sum(F.when(F.col("treated") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("syc"),
    )
    valid = strata.filter((F.col("nt") > 0) & (F.col("nc") > 0))
    tot = valid.agg(F.sum("nt").cast("long").alias("ntt"))
    effects = valid.crossJoin(F.broadcast(tot)).select(
        "seg",
        "band",
        "nt",
        "nc",
        (
            F.col("syt").cast("double") / F.col("nt")
            - F.col("syc").cast("double") / F.col("nc")
        ).alias("diff"),
        (F.col("nt").cast("double") / F.col("ntt")).alias("w"),
    )
    att = effects.agg(
        F.sum(
            F.floor(F.col("diff") * F.col("w") * 10000 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("att_ticks")
    )
    naive = rel.agg(
        (
            F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(0)).cast(
                "double"
            )
            / F.sum("treated")
            - F.sum(F.when(F.col("treated") == 0, F.col("y")).otherwise(0)).cast(
                "double"
            )
            / F.sum(F.lit(1) - F.col("treated"))
        ).alias("nd")
    )
    return (
        effects.crossJoin(F.broadcast(att))
        .crossJoin(F.broadcast(naive))
        .select(
            "seg",
            "band",
            F.col("nt").alias("n_treated"),
            F.col("nc").alias("n_control"),
            pround(F.col("diff") / F.lit(100.0), 6).alias("stratum_diff"),
            pround("w", 6).alias("stratum_weight"),
            pround(F.col("att_ticks") / F.lit(10000.0) / F.lit(100.0), 6).alias(
                "att"
            ),
            pround(F.col("nd") / F.lit(100.0), 6).alias("naive_diff"),
        )
    )


# ---------------------------------------------------------------------------
# Lagged cross-correlation between two series
# ---------------------------------------------------------------------------

_XC_LAGS = list(range(-3, 4))
_PEARSON = (
    "((n * sxy - sx * sy)"
    " / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))"
)


@register(
    "a_cross_correlation_lags",
    oracle=f"""
    WITH ev AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    daily AS (
        SELECT event_type, day,
               CAST(floor(CAST(sum(cents) AS DOUBLE) / count(*) * 10000 + 0.5)
                    AS BIGINT) AS mt
        FROM ev GROUP BY 1, 2
    ),
    a AS (SELECT day, mt AS xa FROM daily WHERE event_type = 'purchase'),
    b AS (SELECT day, mt AS xb FROM daily WHERE event_type = 'view'),
    lags AS (SELECT * FROM (VALUES {", ".join(f"({v})" for v in _XC_LAGS)})
             AS v(lag)),
    paired AS (
        SELECT l.lag, a.xa, b.xb
        FROM lags l
        JOIN a ON TRUE
        JOIN b ON b.day = a.day + CAST(l.lag AS INTEGER)
    ),
    mom AS (
        SELECT lag,
               CAST(count(*) AS BIGINT) AS nd,
               CAST(sum(xa) AS BIGINT) AS sxr,
               CAST(sum(xb) AS BIGINT) AS syr,
               CAST(sum(CAST(xa AS DECIMAL(18,0)) * CAST(xa AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS sxx_d,
               CAST(sum(CAST(xb AS DECIMAL(18,0)) * CAST(xb AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS syy_d,
               CAST(sum(CAST(xa AS DECIMAL(18,0)) * CAST(xb AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS sxy_d
        FROM paired GROUP BY 1
    ),
    c AS (
        SELECT CAST(lag AS BIGINT) AS lag, nd,
               CAST(nd AS DOUBLE) AS n,
               CAST(sxr AS DOUBLE) AS sx, CAST(syr AS DOUBLE) AS sy,
               CAST(sxx_d AS DOUBLE) AS sxx, CAST(syy_d AS DOUBLE) AS syy,
               CAST(sxy_d AS DOUBLE) AS sxy
        FROM mom
    )
    SELECT lag, nd AS n_days, round({_PEARSON}, 6) AS cross_corr
    FROM c WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    doc="Lagged cross-correlation between two event series' daily means "
    "(does the purchase series lead or lag the view series?): Pearson r "
    "at each lag in [-3, +3], computed from exact integer/DECIMAL "
    "moment sums over day-aligned pairs — the row scan is ONE daily "
    "aggregate, the lag alignment is a date equi-join against the "
    "7-row literal lag table, and the closing Pearson expression is "
    "shared SQL text on identical exact operands. The lead/lag "
    "diagnostic a forecasting pipeline checks before declaring one "
    "metric a predictor of another; cost is calendar-bounded after "
    "the scan regardless of corpus size.",
    tags=("stats", "timeseries", "correlation"),
)
def a_cross_correlation_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.floor(
            F.sum("cents").cast("double") / F.count(F.lit(1)) * 10000 + F.lit(0.5)
        )
        .cast("long")
        .alias("mt")
    )
    a = daily.filter(F.col("event_type") == "purchase").select(
        "day", F.col("mt").alias("xa")
    )
    b = daily.filter(F.col("event_type") == "view").select(
        F.col("day").alias("day_b"), F.col("mt").alias("xb")
    )
    lags = literal_df(spark, [(v,) for v in _XC_LAGS], "lag int")
    paired = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("day_b")
            == F.date_add(F.col("day"), F.col("lag")),
        )
        .select("lag", "xa", "xb")
    )
    d18 = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
    mom = paired.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("xa").cast("long").alias("sxr"),
        F.sum("xb").cast("long").alias("syr"),
        F.sum(d18("xa") * d18("xa")).cast("decimal(38,0)").alias("sxx_d"),
        F.sum(d18("xb") * d18("xb")).cast("decimal(38,0)").alias("syy_d"),
        F.sum(d18("xa") * d18("xb")).cast("decimal(38,0)").alias("sxy_d"),
    )
    c = mom.select(
        F.col("lag").cast("long").alias("lag"),
        "nd",
        F.col("nd").cast("double").alias("n"),
        F.col("sxr").cast("double").alias("sx"),
        F.col("syr").cast("double").alias("sy"),
        F.col("sxx_d").cast("double").alias("sxx"),
        F.col("syy_d").cast("double").alias("syy"),
        F.col("sxy_d").cast("double").alias("sxy"),
    )
    return c.filter(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
    ).select("lag", F.col("nd").alias("n_days"), pround(F.expr(_PEARSON), 6).alias("cross_corr"))
