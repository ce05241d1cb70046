"""Round-3 wave 20: retention half-life from an exponential-decay fit
over the cohort matrix, and the Fano/burstiness profile of daily
event arrivals.

Scale extensions beyond the reference pipeline surface (no reference
twin; the reference is a single-machine pandas/sklearn TFM pipeline).
Determinism contracts follow the house rules: the decay fit runs on
1e-4-ticked ln values summed as exact BIGINTs (the wave-15 Zipf OLS
machinery applied to retention), and the burstiness statistics are
exact integer moment arithmetic with single closing divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register
from cicevse2024_tfm_datapipeline_spark.plans.wave5 import _US

_DAY_US = 86_400_000_000
_WEEK_US = 604_800_000_000
_EPOCH0 = 1_704_067_200_000_000  # 2024-01-01 UTC, the week origin


# ---------------------------------------------------------------------------
# Retention half-life (exponential decay fit over the cohort matrix)
# ---------------------------------------------------------------------------


@register(
    "a_retention_half_life",
    oracle=f"""
    WITH wk AS (
        SELECT user_id,
               CAST((epoch_us(ts) - {_EPOCH0}) // {_WEEK_US} AS BIGINT)
                   AS week,
               count(*) AS n_ev
        FROM events GROUP BY 1, 2
    ),
    eng AS (SELECT user_id, week FROM wk WHERE n_ev >= 15),
    cohort AS (SELECT user_id, min(week) AS cohort_week FROM eng GROUP BY 1),
    cells AS (
        SELECT a.week - c.cohort_week AS woff,
               CAST(count(*) AS BIGINT) AS n_active
        FROM eng a JOIN cohort c USING (user_id)
        GROUP BY 1
    ),
    base AS (SELECT n_active AS n0 FROM cells WHERE woff = 0),
    pts AS (
        SELECT CAST(woff AS BIGINT) AS x,
               CAST(floor(ln(n_active * 1.0 / n0) * 10000 + 0.5) AS BIGINT)
                   AS y
        FROM cells CROSS JOIN base
        WHERE woff >= 1 AND n_active > 0
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM pts
    )
    SELECT n AS n_offsets,
           round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) / 10000.0,
                 6) AS decay_per_week,
           round(-0.6931471805599453
                 / nullif((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)
                          / 10000.0, 0),
                 4) AS half_life_weeks
    FROM s
    """,
    doc="Retention half-life: fit ln(retention) ~ offset over the "
    "pooled ENGAGED-user cohort-decay curve (engaged = at least 15 "
    "events in the week — the activity-threshold retention definition "
    "product analytics uses when raw presence never churns) and "
    "report the exponential decay rate and its half-life "
    "ln(2)/(-slope) — the single product-analytics number that "
    "compresses a retention matrix into 'how fast do we lose users'. "
    "A zero slope (no decay) yields NULL half-life via nullif in both "
    "engines. The fit is the wave-15 ticked-OLS "
    "machinery: ln ratios round to exact 1e-4 BIGINT ticks before the "
    "moment sums (order-free), x is the raw integer offset, and the "
    "closing arithmetic divides the y-tick scale back out with "
    "identical single divisions in both engines. Offsets with zero "
    "active users drop out identically on both sides. The cohort "
    "matrix is (weeks x weeks)-sized regardless of corpus scale.",
    tags=("A", "retention", "decay"),
)
def a_retention_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    week = F.expr(
        f"(unix_micros(to_utc_timestamp(ts, 'UTC')) - {_EPOCH0})"
        f" div {_WEEK_US}"
    )
    wk = (
        ev.select("user_id", week.alias("week"))
        .groupBy("user_id", "week")
        .agg(F.count(F.lit(1)).alias("n_ev"))
    )
    eng = wk.filter(F.col("n_ev") >= 15).select("user_id", "week")
    eng = eng.localCheckpoint(eager=False)
    cohort = eng.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cells = (
        eng.join(cohort, "user_id")
        .select((F.col("week") - F.col("cohort_week")).alias("offset"))
        .groupBy("offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .localCheckpoint(eager=False)
    )
    base = cells.filter(F.col("offset") == 0).select(
        F.col("n_active").alias("n0")
    )
    pts = (
        cells.filter((F.col("offset") >= 1) & (F.col("n_active") > 0))
        .crossJoin(F.broadcast(base))
        .select(
            F.col("offset").cast("long").alias("x"),
            F.floor(
                F.log(F.col("n_active") * F.lit(1.0) / F.col("n0")) * 10000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("y"),
        )
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (
        (n * sxy - sx * sy) * F.lit(1.0) / (n * sxx - sx * sx) / F.lit(10000.0)
    )
    return s.select(
        n.alias("n_offsets"),
        pround(slope, 6).alias("decay_per_week"),
        pround(
            F.lit(-0.6931471805599453) / F.nullif(slope, F.lit(0.0)), 4
        ).alias("half_life_weeks"),
    )


# ---------------------------------------------------------------------------
# Burstiness / Fano-factor profile of daily arrivals
# ---------------------------------------------------------------------------


@register(
    "a_burstiness_fano",
    oracle=f"""
    WITH d AS (
        SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(c * c) AS BIGINT) AS q
        FROM d GROUP BY 1
    )
    SELECT event_type, n AS n_days,
           round(s * 1.0 / n, 6) AS mean_per_day,
           round((n * q - s * s) * 1.0 / (n * 1.0 * s), 6) AS fano,
           round((sqrt((n * q - s * s) * 1.0) - s)
                 / (sqrt((n * q - s * s) * 1.0) + s), 6) AS burstiness
    FROM m
    """,
    doc="Burstiness profile of daily arrivals per event type: the Fano "
    "factor (variance/mean of daily counts — 1 for a Poisson process, "
    ">1 overdispersed/bursty, <1 regular) and the Goh-Barabasi "
    "burstiness index (sigma-mu)/(sigma+mu) in [-1, 1] — the two "
    "standard dispersion diagnostics that decide whether rate limits, "
    "capacity plans, and anomaly thresholds can assume Poisson "
    "arrivals. All moments are exact integers from one grouped "
    "aggregation (population variance via n*Q - S^2, scale factors "
    "folded so each output is arithmetic over exact operands: Fano = "
    "(nQ-S^2)/(nS), burstiness uses sigma*n = sqrt(nQ-S^2) against "
    "mu*n = S — the n's cancel identically in both engines).",
    tags=("A", "burstiness", "dispersion"),
)
def a_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.expr(_US) / F.lit(_DAY_US)).cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    var_xn2 = n * q - s * s
    sig_xn = F.sqrt(var_xn2 * F.lit(1.0))
    return m.select(
        "event_type",
        n.alias("n_days"),
        pround(s * F.lit(1.0) / n, 6).alias("mean_per_day"),
        pround(var_xn2 * F.lit(1.0) / (n * F.lit(1.0) * s), 6).alias("fano"),
        pround((sig_xn - s) / (sig_xn + s), 6).alias("burstiness"),
    )
