"""Round-3 wave 12: incremental aggregate maintenance by merging
sufficient statistics, and a composed data-quality gate.

The IVM query states the algebra every incremental rollup and every
map-side combine relies on — (n, sum, sum2, min, max) partial states
merge associatively, so yesterday's rollup plus today's delta equals a
full recompute WITHOUT rescanning history — and verifies the identity
per key against the full recompute inside one hash-checked result.
The quality gate composes four independent audit angles into the one
verdict frame a pipeline actually gates on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

_CUT = "2024-01-20 00:00:00"


@register(
    "a_incremental_rollup_merge",
    oracle=f"""
    WITH scaled AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '{_CUT}' THEN 0 ELSE 1 END AS part,
               CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v
        FROM events
    ),
    states AS (
        SELECT event_type, part,
               count(*) AS n, sum(v) AS s, sum(v * v) AS s2,
               min(v) AS mn, max(v) AS mx
        FROM scaled GROUP BY 1, 2
    ),
    merged AS (
        SELECT event_type,
               sum(n) AS n, sum(s) AS s, sum(s2) AS s2,
               min(mn) AS mn, max(mx) AS mx
        FROM states GROUP BY 1
    ),
    full_agg AS (
        SELECT event_type,
               count(*) AS n, sum(v) AS s, sum(v * v) AS s2,
               min(v) AS mn, max(v) AS mx
        FROM scaled GROUP BY 1
    )
    SELECT m.event_type,
           CAST(m.n AS BIGINT) AS n_rows,
           round(m.s / (10000.0 * m.n), 6) AS mean_value,
           round(sqrt(greatest(m.s2 * 1.0 / m.n - (m.s * 1.0 / m.n) * (m.s * 1.0 / m.n), 0))
                 / 10000.0, 6) AS std_pop,
           CAST(m.mn AS BIGINT) AS min_ticks,
           CAST(m.mx AS BIGINT) AS max_ticks,
           (m.n = f.n AND m.s = f.s AND m.s2 = f.s2
            AND m.mn = f.mn AND m.mx = f.mx) AS matches_recompute
    FROM merged m JOIN full_agg f USING (event_type)
    """,
    doc="Incremental aggregate maintenance: the per-key sufficient "
    "statistics (n, Σv, Σv², min, max) are computed SEPARATELY for the "
    "history partition (before a cutoff) and the delta partition, then "
    "merged by pure addition/min/max — the associative state algebra "
    "that lets a daily rollup absorb a new batch without rescanning "
    "history, and the exact algebra Spark's map-side partial "
    "aggregation uses internally. Mean and population std derive from "
    "the merged moments. The hash-checked matches_recompute flag "
    "asserts the merged state EQUALS a full recompute — exactly, "
    "because every statistic is an integer of 1e-4 ticks (Σv² ≤ "
    "rows·max_tick², comfortably inside BIGINT at this data's "
    "magnitudes; a production-scale state widens Σv² to DECIMAL(38,0), "
    "the same algebra). Two group-partitioned aggregations + one "
    "5-row join.",
    tags=("A", "incremental", "ivm"),
)
def a_incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    scaled = t(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("ts") < F.lit(_CUT).cast("timestamp"), 0).otherwise(1).alias("part"),
        F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long").alias("v"),
    )
    states = scaled.groupBy("event_type", "part").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    merged = states.groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    full_agg = scaled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("fn"),
        F.sum("v").alias("fs"),
        F.sum(F.col("v") * F.col("v")).alias("fs2"),
        F.min("v").alias("fmn"),
        F.max("v").alias("fmx"),
    )
    mean_ticks = F.col("s") * F.lit(1.0) / F.col("n")
    var_ticks = F.greatest(
        F.col("s2") * F.lit(1.0) / F.col("n") - mean_ticks * mean_ticks, F.lit(0.0)
    )
    return merged.join(full_agg, "event_type").select(
        "event_type",
        F.col("n").cast("long").alias("n_rows"),
        pround(F.col("s") / (F.lit(10000.0) * F.col("n")), 6).alias("mean_value"),
        pround(F.sqrt(var_ticks) / F.lit(10000.0), 6).alias("std_pop"),
        F.col("mn").cast("long").alias("min_ticks"),
        F.col("mx").cast("long").alias("max_ticks"),
        (
            (F.col("n") == F.col("fn"))
            & (F.col("s") == F.col("fs"))
            & (F.col("s2") == F.col("fs2"))
            & (F.col("mn") == F.col("fmn"))
            & (F.col("mx") == F.col("fmx"))
        ).alias("matches_recompute"),
    )


@register(
    "pipeline_quality_report",
    oracle="""
    SELECT 'orphan_lineitems' AS check_name,
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS metric,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) = 0 AS pass
    UNION ALL
    SELECT 'null_priority_orders',
           (SELECT CAST(count(*) AS BIGINT) FROM orders
            WHERE o_orderpriority IS NULL),
           (SELECT count(*) FROM orders WHERE o_orderpriority IS NULL) = 0
    UNION ALL
    SELECT 'negative_prices',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem
            WHERE l_extendedprice < 0),
           (SELECT count(*) FROM lineitem WHERE l_extendedprice < 0) = 0
    UNION ALL
    SELECT 'dup_order_lines',
           (SELECT CAST(count(*) AS BIGINT) FROM (
                SELECT l_orderkey, l_linenumber FROM lineitem
                GROUP BY 1, 2 HAVING count(*) > 1)),
           (SELECT count(*) FROM (
                SELECT l_orderkey, l_linenumber FROM lineitem
                GROUP BY 1, 2 HAVING count(*) > 1)) = 0
    """,
    doc="Composed data-quality gate: the four independent audit angles "
    "a load job actually blocks on — referential orphans (anti-join), "
    "null required fields, domain violations (negative prices), and "
    "primary-key duplicates — unioned into one (check, metric, pass) "
    "verdict frame. Each check is one scan-shaped aggregate over the "
    "column(s) it audits; the pass column makes the frame directly "
    "joinable to a gating policy. Composes the standalone audits "
    "(a_referential_integrity, p6_p7 profiling) into the artifact a "
    "scheduler consumes.",
    tags=("pipeline", "quality", "gate"),
)
def pipeline_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    orphans = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("metric"))
        .select(F.lit("orphan_lineitems").alias("check_name"), "metric")
    )
    nulls = (
        orders.filter(F.col("o_orderpriority").isNull())
        .agg(F.count(F.lit(1)).cast("long").alias("metric"))
        .select(F.lit("null_priority_orders").alias("check_name"), "metric")
    )
    neg = (
        li.filter(F.col("l_extendedprice") < 0)
        .agg(F.count(F.lit(1)).cast("long").alias("metric"))
        .select(F.lit("negative_prices").alias("check_name"), "metric")
    )
    dups = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("metric"))
        .select(F.lit("dup_order_lines").alias("check_name"), "metric")
    )
    out = orphans.unionByName(nulls).unionByName(neg).unionByName(dups)
    return out.select("check_name", "metric", (F.col("metric") == 0).alias("pass"))
