"""Wave F: advanced join / set / pivot patterns — operators beyond the
reference's surface that a Spark-native engine provides (as-of join,
bucketized range join, INTERSECT/EXCEPT, pivot), each oracle-checked
(DuckDB has native ASOF JOIN and inequality joins to verify against).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.asof import (
    asof_join_backward,
    bucketized_range_join,
)
from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register


@register(
    "j_asof_backward",
    oracle="""
    WITH rights AS (
        SELECT o_custkey % 10 AS k, o_orderdate,
               max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id % 10 AS k, r.o_orderkey AS asof_orderkey
    FROM (SELECT * FROM events WHERE event_id < 500) e
    ASOF LEFT JOIN rights r
      ON (e.user_id % 10) = r.k AND e.ts >= r.o_orderdate
    """,
    doc="As-of join (keyed, backward, inclusive) — composed from a tagged "
    "union + last(ignorenulls) carry-forward window (operators/asof.py): "
    "one shuffle by key, no per-group Python. Verified against DuckDB's "
    "native ASOF JOIN.",
    tags=("asof", "J"),
)
def j_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    orders = t(spark, sf_dir, "orders")
    rights = (
        orders.withColumn("k", F.col("o_custkey") % 10)
        .groupBy("k", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    left = ev.withColumn("k", F.col("user_id") % 10)
    joined = asof_join_backward(
        left, rights, key="k", left_time="ts", right_time="o_orderdate",
        right_value_cols=["o_orderkey"],
    )
    return joined.select(
        "event_id", "k", F.col("o_orderkey").alias("asof_orderkey")
    )


@register(
    "j_range_join_bucketized",
    oracle="""
    SELECT a.event_id AS anchor_id,
           count(*) AS n_following,
           round(sum(b.value), 2) AS sum_value
    FROM (SELECT * FROM events WHERE event_type = 'error') a
    JOIN events b
      ON b.ts >= a.ts AND b.ts < a.ts + INTERVAL 10 MINUTE
    GROUP BY a.event_id
    """,
    doc="Range join (events within 10 min after each error event) — "
    "bucketized to an equi-join on time buckets + residual filter "
    "(operators/asof.bucketized_range_join): candidates per row bounded "
    "by bucket occupancy, never the O(n·m) theta join DuckDB can brute.",
    tags=("rangejoin", "J"),
)
def j_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    anchors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("anchor_id"), F.col("ts").alias("anchor_ts")
    )
    joined = bucketized_range_join(
        ev.select(F.col("ts"), F.col("value")),
        anchors,
        left_time="ts",
        right_start="anchor_ts",
        width_expr=F.expr("INTERVAL 10 MINUTES"),
        bucket_seconds=600,
    )
    return joined.groupBy("anchor_id").agg(
        F.count(F.lit(1)).alias("n_following"),
        pround(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "u_set_intersect_except",
    oracle="""
    SELECT 'intersect' AS op, p_type FROM (
        SELECT p_type FROM part WHERE p_size <= 10
        INTERSECT
        SELECT p_type FROM part WHERE p_size > 10
    )
    UNION ALL
    SELECT 'except', p_type FROM (
        SELECT p_type FROM part WHERE p_size <= 10
        EXCEPT
        SELECT p_type FROM part WHERE p_size > 10
    )
    """,
    doc="INTERSECT / EXCEPT set semantics (beyond the reference's unions — "
    "SURVEY §2.7 notes they come free in Spark).",
    tags=("U",),
)
def u_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    small = part.filter(F.col("p_size") <= 10).select("p_type")
    large = part.filter(F.col("p_size") > 10).select("p_type")
    inter = small.intersect(large).select(F.lit("intersect").alias("op"), "p_type")
    exc = small.subtract(large).select(F.lit("except").alias("op"), "p_type")
    return inter.unionByName(exc)


@register(
    "a10_confusion_pivot",
    oracle="""
    WITH preds AS (
        SELECT event_type AS true_label,
               CASE WHEN value < 50 THEN 'view'
                    WHEN value < 100 THEN 'click'
                    WHEN value < 150 THEN 'signup'
                    WHEN value < 200 THEN 'purchase'
                    ELSE 'error' END AS pred
        FROM events
    )
    SELECT true_label,
           CAST(sum(CASE WHEN pred = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS pred_click,
           CAST(sum(CASE WHEN pred = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS pred_error,
           CAST(sum(CASE WHEN pred = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pred_purchase,
           CAST(sum(CASE WHEN pred = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS pred_signup,
           CAST(sum(CASE WHEN pred = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS pred_view
    FROM preds GROUP BY true_label
    """,
    doc="A10 as a pivot: confusion matrix in wide form via "
    "groupBy().pivot() with an explicit value list (bounded columns — "
    "never pivot on unbounded cardinality at scale).",
    tags=("A10", "pivot"),
)
def a10_confusion_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    v = F.col("value")
    pred = (
        F.when(v < 50, "view")
        .when(v < 100, "click")
        .when(v < 150, "signup")
        .when(v < 200, "purchase")
        .otherwise("error")
    )
    labels = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.select(F.col("event_type").alias("true_label"), pred.alias("pred"))
        .groupBy("true_label")
        .pivot("pred", labels)
        .count()
    )
    cols = [F.col("true_label")] + [
        F.coalesce(F.col(c), F.lit(0)).cast("long").alias(f"pred_{c}") for c in labels
    ]
    return wide.select(*cols)


@register(
    "j_tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3-style 3-way fact-fact join + agg + top-N: the canonical "
    "shuffle-join shape. customer is broadcast-able at any realistic dim "
    "scale; orders joins lineitem shuffle-side (AQE picks SMJ/SHJ and "
    "splits skew); the top-10 is TakeOrderedAndProject on unique "
    "l_orderkey tiebreak (deterministic under ties).",
    tags=("J", "tpch"),
)
def j_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "j_bucketed_smb_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           round(sum(o.o_totalprice), 2) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Storage-level co-located join: both sides written as BUCKETED "
    "tables on the join key (sources/bucketing.write_bucketed, 8 buckets, "
    "sorted) then sort-merge-joined — the bucket layout satisfies the "
    "join's distribution requirement, so NEITHER side shuffles "
    "(plan-contract test asserts zero Exchanges under the join). This is "
    "the recurring fact-fact join answer at 100 TB: pay the shuffle once "
    "at write time, never again per query. Oracle = the plain join.",
    tags=("J", "bucketing", "smb"),
)
def j_bucketed_smb_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from cicevse2024_tfm_datapipeline_spark.plans.rows_only import SCRATCH
    from cicevse2024_tfm_datapipeline_spark.sources.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed(
        orders, "bkt_orders", "o_custkey", n_buckets=8,
        path=os.path.join(SCRATCH, "bkt_orders"),
    )
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "bkt_customer", "o_custkey", n_buckets=8,
        path=os.path.join(SCRATCH, "bkt_customer"),
    )
    # hint the LEFT INPUT (a post-join hint would let the planner pick a
    # broadcast join and hide the bucket layout entirely)
    joined = spark.table("bkt_orders").hint("merge").join(
        spark.table("bkt_customer"), "o_custkey"
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        pround(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "s9_partitioned_lake_roundtrip",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM documents
    WHERE source IN ('src1', 'src3')
    GROUP BY source
    """,
    doc="Hive-style partitioned lake roundtrip: documents written with "
    "partitionBy(source), then read back with a partition predicate — "
    "the scan must list ONLY the two matching directories "
    "(plan-contract test asserts the predicate lands in PartitionFilters, "
    "not a post-scan Filter). This is the 100 TB layout answer for "
    "by-source / by-language corpus slicing: selection cost scales with "
    "the selected partitions, not the corpus. Oracle recomputes from the "
    "unpartitioned table.",
    tags=("S", "partitioning", "sink"),
)
def s9_partitioned_lake_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from cicevse2024_tfm_datapipeline_spark.plans.rows_only import SCRATCH

    lake = os.path.join(SCRATCH, "docs_lake")
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    docs.write.mode("overwrite").partitionBy("source").parquet(lake)
    back = spark.read.parquet(lake).filter(F.col("source").isin("src1", "src3"))
    return back.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
    )


@register(
    "s10_zorder_cells",
    oracle="""
    WITH s AS (
        SELECT min(CAST(user_id AS DOUBLE)) AS mnu, max(CAST(user_id AS DOUBLE)) AS mxu,
               min(value) AS mnv, max(value) AS mxv
        FROM events
    ),
    sc AS (
        SELECT event_id, value,
               coalesce(least(255, CAST(floor(((CAST(user_id AS DOUBLE) - mnu)
                   / (mxu - mnu)) * 256.0) AS BIGINT)), 0) AS iu,
               coalesce(least(255, CAST(floor(((value - mnv)
                   / (mxv - mnv)) * 256.0) AS BIGINT)), 0) AS iv
        FROM events, s
    ),
    z AS (
        SELECT event_id, value,
               CAST(list_sum(list_transform(range(0, 8), b ->
                   (((iu >> CAST(b AS INT)) & 1) << CAST(2 * b AS INT))
                 + (((iv >> CAST(b AS INT)) & 1) << CAST(2 * b + 1 AS INT))))
                   AS BIGINT) AS zv
        FROM sc
    )
    SELECT zv >> 10 AS cell,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS sum_ids,
           round(avg(value), 6) AS avg_value
    FROM z
    GROUP BY 1
    """,
    doc="S10 Z-order layout roundtrip: events written as parquet laid out "
    "along the Morton curve of (user_id, value) — bits interleaved after "
    "min/max scaling to 8 bits per column (sources/layout.py) — then read "
    "back and aggregated per coarse z-cell. Multi-column data skipping at "
    "100 TB: each file covers a small hyper-rectangle of the filter "
    "space, so parquet min/max footers prune box predicates on EITHER "
    "column (the test measures files-read vs a single-column sort; the "
    "Delta/Iceberg OPTIMIZE ZORDER lever from plain Spark primitives). "
    "The z-value is deterministic min/max-scaled bit arithmetic, so the "
    "whole layout key is engine-portable and the oracle recomputes it "
    "from the raw table.",
    tags=("S", "layout", "zorder"),
)
def s10_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from cicevse2024_tfm_datapipeline_spark.plans.rows_only import SCRATCH
    from cicevse2024_tfm_datapipeline_spark.sources.layout import (
        with_zvalue,
        write_zordered,
    )

    lake = os.path.join(SCRATCH, "events_zorder")
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    write_zordered(ev, ["user_id", "value"], lake, bits=8, n_files=16)
    back = spark.read.parquet(lake)
    # same rows → same min/max → the recomputed z is the written layout key
    return (
        with_zvalue(back, ["user_id", "value"], bits=8)
        .groupBy(F.shiftright("__z", 10).alias("cell"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("event_id").cast("long").alias("sum_ids"),
            pround(F.avg("value"), 6).alias("avg_value"),
        )
    )


@register(
    "w_scd2_history",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id, value, ts,
               row_number() OVER w AS version,
               lead(ts) OVER w AS valid_to
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_versions,
           CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_current,
           CAST(max(CASE WHEN ts <= TIMESTAMP '2024-01-15 00:00:00'
                          AND (valid_to IS NULL
                               OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
                         THEN version END) AS BIGINT) AS ver_at_cut,
           CAST(max(CASE WHEN ts <= TIMESTAMP '2024-01-15 00:00:00'
                          AND (valid_to IS NULL
                               OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
                         THEN CAST(floor(value) AS BIGINT) END) AS BIGINT)
               AS val_at_cut,
           CAST(sum(version * CAST(floor(value) AS BIGINT)) AS BIGINT)
               AS version_checksum
    FROM v
    GROUP BY user_id
    """,
    doc="SCD2 interval versioning + point-in-time lookup "
    "(operators/asof.scd2_intervals, snapshot_as_of): every change-log "
    "row becomes a version with a half-open [valid_from, valid_to) "
    "interval; the query also resolves each key's version AS OF a fixed "
    "cut — the feature-store time-travel primitive that makes training "
    "data point-in-time correct (no leakage from future updates). One "
    "shuffle by key; version order pinned under ts ties by event_id, so "
    "the history is deterministic on any partitioning. The "
    "version_checksum pins every version assignment, not just counts.",
    tags=("W", "scd2", "asof"),
)
def w_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.asof import (
        scd2_intervals,
        snapshot_as_of,
    )

    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    hist = scd2_intervals(ev, ["user_id"], "ts", tiebreak_cols=["event_id"])
    at_cut = snapshot_as_of(hist, cut).select(
        "user_id",
        F.col("version").alias("__vc"),
        F.floor("value").cast("long").alias("__valc"),
    )
    per_key = hist.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_versions"),
        F.sum(F.col("is_current").cast("long")).cast("long").alias("n_current"),
        F.sum(F.col("version") * F.floor("value").cast("long"))
        .cast("long")
        .alias("version_checksum"),
    )
    return (
        per_key.join(at_cut, "user_id", "left")
        .select(
            "user_id",
            "n_versions",
            "n_current",
            F.col("__vc").cast("long").alias("ver_at_cut"),
            F.col("__valc").cast("long").alias("val_at_cut"),
            "version_checksum",
        )
    )


@register(
    "s11_schema_evolution_merge",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_lang,
           CAST(count(DISTINCT CASE WHEN doc_id % 2 = 1 THEN lang END)
               AS BIGINT) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY source
    """,
    doc="Schema-evolution lake read: batch 1 lands WITHOUT the lang "
    "column, batch 2 adds it; a mergeSchema read reconciles both "
    "footers into the union schema with nulls for the early batch — the "
    "ingestion reality of long-lived 100 TB lakes where producers add "
    "fields over time. Schema merge is a footer-only planning step (no "
    "data rewrite, no backfill); the per-source null accounting of the "
    "late column is the checked contract. Oracle recomputes from the "
    "unevolved table via the batch-parity rule.",
    tags=("S", "schema-evolution"),
)
def s11_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from cicevse2024_tfm_datapipeline_spark.plans.rows_only import SCRATCH

    lake = os.path.join(SCRATCH, "docs_evolving")
    docs = t(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "source", "n_chars"
    ).write.mode("overwrite").parquet(os.path.join(lake, "batch=1"))
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", "n_chars", "lang"
    ).write.mode("overwrite").parquet(os.path.join(lake, "batch=2"))

    back = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "false"
    ).parquet(os.path.join(lake, "batch=1"), os.path.join(lake, "batch=2"))
    return back.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("lang").isNotNull().cast("long")).cast("long").alias("n_with_lang"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


@register(
    "j_tpch_q5_local_supplier",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 (local-supplier revenue): the 6-way join where plan "
    "quality IS the benchmark — region/nation are broadcast literals, "
    "supplier and customer broadcast under the 64 MB threshold, so the "
    "only data-sized work is lineitem ⋈ orders, and the date filter "
    "pushes into the orders scan. Catalyst is left free to reorder; the "
    "c_nationkey = s_nationkey 'local supplier' condition rides the "
    "supplier join as a residual, never a cross product.",
    tags=("J", "tpch"),
)
def j_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")

    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
    )


@register(
    "p_data_quality_audit",
    oracle="""
    SELECT 'unique(o_orderkey)' AS check,
           CAST(count(*) AS BIGINT) AS n_checked,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'not_null(l_shipdate)', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'range(l_discount in [0.0, 0.1])', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_discount IS NULL
                          OR l_discount < 0.0 OR l_discount > 0.1
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'accepted_values(l_returnflag)', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_returnflag IS NULL
                          OR l_returnflag NOT IN ('A', 'N', 'R')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'referential(o_custkey -> c_custkey)', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o.o_custkey = c.c_custkey
    """,
    doc="Data-quality audit (operators/expectations — dbt-test style): "
    "key uniqueness, non-null, numeric range, accepted values, and "
    "referential integrity, each compiled to ONE counting aggregation "
    "(violations counted, never materialized, so the report is bounded "
    "by the check count at any corpus size; the referential anti-join "
    "broadcasts the parent keys under AQE). The ingestion gate every "
    "production pipeline runs before promoting a batch.",
    tags=("P", "quality", "expectations"),
)
def p_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.expectations import (
        check_accepted_values,
        check_in_range,
        check_not_null,
        check_referential,
        check_unique,
        run_checks,
    )

    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cust = t(spark, sf_dir, "customer")
    return run_checks(
        [
            check_unique(orders, ["o_orderkey"], "unique(o_orderkey)"),
            check_not_null(li, "l_shipdate"),
            check_in_range(li, "l_discount", 0.0, 0.1),
            check_accepted_values(li, "l_returnflag", ["A", "N", "R"]),
            check_referential(orders, cust, "o_custkey", "c_custkey"),
        ]
    )


@register(
    "j_tpch_q4_late_orders",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking): EXISTS decorrelates "
    "to a LEFT-SEMI join on o_orderkey with the late-shipment predicate "
    "(l_shipdate > o_orderdate + 30 days) as the join residual — the "
    "orders date window pushes into the scan, lineitem is never "
    "aggregated, and the semi join emits each qualifying order once "
    "regardless of its lineitem fanout. The commitdate/receiptdate pair "
    "of real TPC-H is absent from the synthetic schema; the "
    "shipdate-vs-orderdate lag keeps the correlated-predicate shape.",
    tags=("J", "tpch", "semi"),
)
def j_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


@register(
    "j_tpch_q12_priority_class",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape (priority classing per line status): one "
    "equi-join on the orderkey with the shipdate window pushed into the "
    "lineitem scan, then conditional-sum pivots of order priority — the "
    "case-sum aggregate is map-side combined, so the post-join shuffle "
    "carries 2 longs per (status) group, not rows. Ship-mode of real "
    "TPC-H is absent; l_linestatus is the stand-in class column.",
    tags=("J", "tpch"),
)
def j_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_linestatus")
    li = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(hi.cast("long")).cast("long").alias("high_line_count"),
            F.sum((~hi).cast("long")).cast("long").alias("low_line_count"),
        )
    )


@register(
    "j_tpch_q14_promo_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
               AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-09-01 00:00:00'
    GROUP BY 1 = 1
    """,
    doc="TPC-H Q14 shape (promotion revenue share): part is the "
    "broadcast dimension (one hash join, no lineitem shuffle), the "
    "shipdate window pushes into the fact scan, and the promo share is "
    "a single conditional-sum ratio — one row out. Percentage rounded "
    "at 6 dp to absorb engine-side FP association differences on the "
    "two independently-summed terms.",
    tags=("J", "tpch"),
)
def j_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-09-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        pround(F.lit(100.0) * F.sum(promo) / F.sum(rev), 6).alias("promo_revenue_pct"),
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
    )


@register(
    "j_tpch_q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape (large-volume customers): the HAVING subquery "
    "is ONE map-combined aggregation of lineitem reused as a semi-join "
    "filter (AQE broadcasts the qualifying-key set - ~1% of orders at "
    "threshold 250), so the expensive re-aggregation only runs on "
    "filtered rows; final top-20 is TakeOrderedAndProject with the "
    "orderkey tiebreak pinning result order. ",
    tags=("J", "tpch", "topk"),
)
def j_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 250)
        .select("l_orderkey")
    )
    filt = li.join(big, "l_orderkey", "left_semi")
    agg = filt.groupBy("l_orderkey").agg(pround(F.sum("l_quantity"), 2).alias("total_qty"))
    out = (
        agg.join(o, agg.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )
    return out.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(20)


@register(
    "j_tpch_q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape (bilateral nation trade volume): the "
    "fact-to-fact lineitem ⋈ orders join carries a DISJUNCTIVE "
    "nation-pair residual — Catalyst pushes the single-nation "
    "disjuncts down each broadcast dimension (supplier/customer "
    "nations reduce to 2 keys before touching the fact), so the OR "
    "never degrades to a filterless product. Ship-date window pushes "
    "into the fact scan; per (supp, cust, year) conditional sums are "
    "map-combined.",
    tags=("J", "tpch"),
)
def j_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 restructure (guide §3.2 "reduce the big side before shuffling
    # it"): the former join order attached supplier/customer AFTER the
    # fact-fact join and applied the nation-pair filter last — the plan
    # showed the isin() filters reaching only the NATION scans, so every
    # lineitem and order row (any nation) survived into the fact join.
    # Pre-joining each dimension with the 2-nation slice builds reduced
    # (key → nation) maps; broadcasting THOSE drops non-matching fact
    # rows before lineitem meets orders. Inner joins commute, and the
    # residual pair predicate reduces to supp != cust (the isin halves
    # are enforced by construction) — identical result set.
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n2 = (
        t(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    )
    sn = (
        t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cn = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li2 = li.join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
    o2 = o.join(F.broadcast(cn), o.o_custkey == cn.c_custkey)
    j = (
        li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("ship_year")
    ).agg(
        pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("volume"),
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
    )


@register(
    "j_tpch_q10_returned_topk",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item revenue, top 20 customers): "
    "returnflag filter pushes into the lineitem scan and the order "
    "window into orders before the fact join; customer and nation ride "
    "broadcast joins; final top-20 is TakeOrderedAndProject on "
    "(revenue DESC, custkey) — the tiebreak pins result order through "
    "the LIMIT. Rounded revenue is the sort key the oracle sorts by "
    "too, so both engines rank identical values.",
    tags=("J", "tpch", "topk"),
)
def j_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    ).filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", F.col("n_name").alias("nation")).agg(
        pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)


@register(
    "s12_training_shards",
    oracle="""
    WITH sh AS (
        SELECT ('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 8 AS shard,
               doc_id, n_chars
        FROM documents
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM sh GROUP BY shard
    """,
    doc="Sharded training-data export: md5-keyed shard assignment "
    "(engine-portable, partitioning-independent — the same "
    "deterministic-uniform trick the sampling layer uses), written as "
    "a shard=N Hive layout and READ BACK for the checked accounting, "
    "so the roundtrip through the file boundary is part of the "
    "contract. Balanced by hash uniformity (no planner involvement); "
    "at 100 TB each shard is a separate prefix a downstream trainer "
    "mounts independently, and the write is one shuffle on the shard "
    "key.",
    tags=("S", "sink", "shards"),
)
def s12_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from cicevse2024_tfm_datapipeline_spark.plans.rows_only import SCRATCH

    lake = os.path.join(SCRATCH, "training_shards")
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    shard = (
        F.conv(F.substring(F.md5(F.concat(F.lit("shard|"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % 8
    ).alias("shard")
    docs.select(shard, "doc_id", "n_chars").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(lake)
    back = spark.read.parquet(lake)
    return back.groupBy(F.col("shard").cast("long").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )
