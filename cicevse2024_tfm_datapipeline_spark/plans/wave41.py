"""Round-4 wave 41 (closing mini-wave): peak interval concurrency via
the +1/-1 boundary sweep, and Laspeyres/Paasche/Fisher price indices
between two periods.

House rules: the boundary sweep's running sum rides the two-phase global
cumsum (no unpartitioned window); index numerators/denominators are
exact DECIMAL tick sums from one scan each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.scan import global_cumsum
from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register
from cicevse2024_tfm_datapipeline_spark.plans.wave5 import _US


@register(
    "a_peak_concurrency",
    oracle="""
    WITH iv AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               min(epoch_us(ts)) AS s, max(epoch_us(ts)) + 1 AS e
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT s AS t, 1 AS delta, user_id, day FROM iv
        UNION ALL
        SELECT e AS t, -1 AS delta, user_id, day FROM iv
    ),
    swept AS (
        SELECT t, delta,
               CAST(sum(delta) OVER (ORDER BY t, delta, user_id, day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS conc
        FROM bounds
    ),
    peak AS (SELECT max(conc) AS pk FROM swept),
    att AS (
        SELECT min(t) AS t_first FROM swept, peak WHERE conc = peak.pk
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_intervals FROM iv)
    SELECT n.n_intervals, CAST(p.pk AS BIGINT) AS peak_concurrency,
           CAST(a.t_first AS BIGINT) AS peak_at_us
    FROM peak p CROSS JOIN att a CROSS JOIN n
    """,
    doc="Peak interval concurrency via the classic +1/-1 boundary sweep: "
    "each (user, day) activity interval contributes a start(+1) and an "
    "exclusive end(-1) boundary; the running sum over the globally "
    "time-ordered boundary stream is the live concurrency, and its max "
    "(with the first instant attaining it) is the capacity-planning "
    "number ('how many sessions were ever open at once'). The running "
    "sum rides the two-phase global cumsum — boundary order is made "
    "total with a (time, -1-before-+1, user, day) tiebreak, i.e. at "
    "equal timestamps an exclusive end closes before a new start opens, "
    "so an interval starting exactly where another ends is NOT counted "
    "as concurrent with it; the row scan reduces to one interval "
    "aggregate, and the sweep is 2x|intervals| rows. Complements the "
    "interval-coverage (union length) query with the max-overlap "
    "readout.",
    tags=("stats", "intervals", "capacity"),
)
def a_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    us = F.expr(_US)
    iv = t(spark, sf_dir, "events").groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.min(us).alias("s"),
        (F.max(us) + 1).alias("e"),
    )
    bounds = iv.select(
        F.col("s").alias("t"), F.lit(1).alias("delta"), "user_id", "day"
    ).unionAll(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("delta"), "user_id", "day")
    )
    # total order: time, ends before starts (delta asc: -1 < +1) — the
    # correct tiebreak for exclusive ends, so touching intervals never
    # overlap — then user/day to make the order total
    swept = global_cumsum(
        bounds,
        ["t", "delta", "user_id", "day"],
        ["delta"],
    ).select("t", F.col("cum_delta").cast("long").alias("conc"))
    peak = swept.agg(F.max("conc").alias("pk"))
    att = (
        swept.join(F.broadcast(peak), F.col("conc") == F.col("pk"))
        .agg(F.min("t").alias("t_first"))
    )
    n = iv.agg(F.count(F.lit(1)).cast("long").alias("n_intervals"))
    return (
        peak.crossJoin(att)
        .crossJoin(F.broadcast(n))
        .select(
            "n_intervals",
            F.col("pk").cast("long").alias("peak_concurrency"),
            F.col("t_first").cast("long").alias("peak_at_us"),
        )
    )


@register(
    "a_price_index_fisher",
    oracle="""
    WITH li AS (
        SELECT l.l_orderkey, p.p_brand AS item,
               CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS q,
               CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS spend
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    dated AS (
        SELECT li.item, li.q, li.spend,
               CASE WHEN o.o_orderdate < (SELECT min(o_orderdate)
                                          + (max(o_orderdate)
                                             - min(o_orderdate)) / 2
                                          FROM orders)
                    THEN 0 ELSE 1 END AS period
        FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
    ),
    cell AS (
        SELECT item, period,
               CAST(sum(q) AS BIGINT) AS tq,
               CAST(sum(spend) AS BIGINT) AS tspend
        FROM dated GROUP BY 1, 2
    ),
    wide AS (
        SELECT item,
               CAST(max(CASE WHEN period = 0 THEN tq END) AS BIGINT) AS q0,
               CAST(max(CASE WHEN period = 0 THEN tspend END) AS BIGINT)
                   AS s0,
               CAST(max(CASE WHEN period = 1 THEN tq END) AS BIGINT) AS q1,
               CAST(max(CASE WHEN period = 1 THEN tspend END) AS BIGINT)
                   AS s1
        FROM cell GROUP BY 1
        HAVING q0 IS NOT NULL AND q1 IS NOT NULL AND q0 > 0 AND q1 > 0
    ),
    terms AS (
        SELECT item,
               CAST(floor(CAST(s0 AS DOUBLE) / q0 * 10000 + 0.5) AS BIGINT)
                   AS p0_t,
               CAST(floor(CAST(s1 AS DOUBLE) / q1 * 10000 + 0.5) AS BIGINT)
                   AS p1_t,
               q0, q1
        FROM wide
    ),
    sums AS (
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(p1_t AS DECIMAL(18,0)) * CAST(q0 AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS l_num,
               CAST(sum(CAST(p0_t AS DECIMAL(18,0)) * CAST(q0 AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS l_den,
               CAST(sum(CAST(p1_t AS DECIMAL(18,0)) * CAST(q1 AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS p_num,
               CAST(sum(CAST(p0_t AS DECIMAL(18,0)) * CAST(q1 AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS p_den
        FROM terms
    )
    SELECT n_items,
           round(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE), 6)
               AS laspeyres,
           round(CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE), 6)
               AS paasche,
           round(sqrt((CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE))
                      * (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE))), 6)
               AS fisher
    FROM sums
    """,
    doc="Laspeyres, Paasche and Fisher price indices between the first "
    "and second half of the order history (per-brand unit prices = "
    "spend/quantity, 1e-4-ticked): base-weighted vs current-weighted "
    "inflation and their geometric mean — the canonical economic index "
    "battery, and in a data-pipeline context the price-drift monitor "
    "between two snapshot periods. Cell quantities and spends are "
    "exact integer sums from ONE scan of the join; index numerators "
    "fold as DECIMAL(38,0) tick products over the |items| frame; only "
    "items present in both periods enter (standard matched-item "
    "index).",
    tags=("stats", "index", "econ"),
)
def a_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "l_orderkey",
            F.col("p_brand").alias("item"),
            F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("q"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("spend"),
        )
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    bounds = orders.agg(
        (
            F.min("o_orderdate")
            + (F.max("o_orderdate") - F.min("o_orderdate")) / 2
        ).alias("mid")
    )
    dated = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .crossJoin(F.broadcast(bounds))
        .select(
            "item",
            "q",
            "spend",
            F.when(F.col("o_orderdate") < F.col("mid"), 0).otherwise(1).alias(
                "period"
            ),
        )
    )
    cell = dated.groupBy("item", "period").agg(
        F.sum("q").cast("long").alias("tq"),
        F.sum("spend").cast("long").alias("tspend"),
    )
    wide = (
        cell.groupBy("item")
        .agg(
            F.max(F.when(F.col("period") == 0, F.col("tq"))).cast("long").alias("q0"),
            F.max(F.when(F.col("period") == 0, F.col("tspend")))
            .cast("long")
            .alias("s0"),
            F.max(F.when(F.col("period") == 1, F.col("tq"))).cast("long").alias("q1"),
            F.max(F.when(F.col("period") == 1, F.col("tspend")))
            .cast("long")
            .alias("s1"),
        )
        .filter(
            F.col("q0").isNotNull()
            & F.col("q1").isNotNull()
            & (F.col("q0") > 0)
            & (F.col("q1") > 0)
        )
    )
    terms = wide.select(
        F.floor(F.col("s0").cast("double") / F.col("q0") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("p0_t"),
        F.floor(F.col("s1").cast("double") / F.col("q1") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("p1_t"),
        "q0",
        "q1",
    )
    d18 = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
    sums = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(d18("p1_t") * d18("q0")).cast("decimal(38,0)").alias("l_num"),
        F.sum(d18("p0_t") * d18("q0")).cast("decimal(38,0)").alias("l_den"),
        F.sum(d18("p1_t") * d18("q1")).cast("decimal(38,0)").alias("p_num"),
        F.sum(d18("p0_t") * d18("q1")).cast("decimal(38,0)").alias("p_den"),
    )
    lasp = F.col("l_num").cast("double") / F.col("l_den").cast("double")
    paas = F.col("p_num").cast("double") / F.col("p_den").cast("double")
    return sums.select(
        "n_items",
        pround(lasp, 6).alias("laspeyres"),
        pround(paas, 6).alias("paasche"),
        pround(F.sqrt(lasp * paas), 6).alias("fisher"),
    )
