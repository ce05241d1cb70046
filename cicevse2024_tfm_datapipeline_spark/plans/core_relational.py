"""Wave A: core relational query surface (scans, filters, scalar layer,
lookup joins, unions, basic aggregations) — SURVEY §2.1-§2.5.

Every query here is SQL-expressible and ships with a DuckDB oracle twin.
Column aliases match the oracle exactly (driver hash-compares by name).
Float aggregates are rounded to 4 decimals on BOTH sides so the
order-insensitive value hash is stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.functions.scalars import attack_group_expr
from cicevse2024_tfm_datapipeline_spark.operators.split import chrono_split
from cicevse2024_tfm_datapipeline_spark.plans.common import (
    pround,
    POWER_BASE_SQL,
    power_view,
    split_sql,
    t,
)
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# --------------------------------------------------------------------
# Flagship: W1 per-group chronological split → split/label distribution
# (exercises S1, F3-F5, W1, W2, A1, U1 in one chain — SURVEY §7.2)
# --------------------------------------------------------------------


@register(
    "w1_chrono_split_counts",
    oracle=f"""
    WITH base AS ({POWER_BASE_SQL}),
    {split_sql(0.7, 0.15)}
    SELECT split, label, count(*) AS n_rows
    FROM tagged
    GROUP BY split, label
    """,
    doc="W1/W2/A1: per-(attack,state) chronological 70/15/15 split with the "
    "reference's int-truncation + small-group guard "
    "(func_aux/func_preproc.py:154-203), then split-distribution counts "
    "(func_aux/func_plot.py:350-353).",
    tags=("W1", "W2", "A1", "F3", "F4", "F5"),
)
def w1_chrono_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pv = power_view(spark, sf_dir)
    tagged = chrono_split(pv, ["attack", "state"], "ts", "event_id")
    return tagged.groupBy("split", "label").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "a1_split_distribution_by_group",
    oracle=f"""
    WITH base AS ({POWER_BASE_SQL}),
    {split_sql(0.7, 0.15)}
    SELECT state, attack, split, count(*) AS n_rows
    FROM tagged
    GROUP BY state, attack, split
    """,
    doc="A1: multi-key group count over (State, Attack, split) "
    "(func_aux/func_plot.py:350-353).",
    tags=("A1", "W1"),
)
def a1_split_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    pv = power_view(spark, sf_dir)
    tagged = chrono_split(pv, ["attack", "state"], "ts", "event_id")
    return tagged.groupBy("state", "attack", "split").agg(F.count(F.lit(1)).alias("n_rows"))


# --------------------------------------------------------------------
# Filters / predicates (P2-P5, P9-P10)
# --------------------------------------------------------------------


@register(
    "p_predicates_filter",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS sum_price
    FROM orders
    WHERE o_orderstatus <> 'F'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      AND NOT contains(lower(o_orderpriority), 'not specified')
    GROUP BY o_orderpriority
    """,
    doc="P2/P3/P4: equality-!=, IN-set, case-insensitive contains filters "
    "(pipeline_trainingmodels_power.py:109-113; "
    "pipeline_trainingmodels_network.py:319).",
    tags=("P2", "P3", "P4"),
)
def p_predicates_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") != "F")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
        .filter(~F.lower(F.col("o_orderpriority")).contains("not specified"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            pround(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
    )


@register(
    "p10_leave_one_out_anti",
    oracle="""
    SELECT attack, count(*) AS n_rows
    FROM (SELECT event_type AS attack FROM events)
    WHERE attack <> 'error'
    GROUP BY attack
    """,
    doc="P10/J3/U2: leave-one-attack-out exclusion (pipeline_tests_power.py:602-604) "
    "as a filter ≡ anti-join against a 1-row frame.",
    tags=("P10", "J3", "U2"),
)
def p10_leave_one_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(F.col("event_type").alias("attack"))
    # 1-row literal frame built JVM-side (no Python-worker local relation)
    held_out = spark.range(1).select(F.lit("error").alias("attack"))
    kept = ev.join(F.broadcast(held_out), "attack", "left_anti")
    return kept.groupBy("attack").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "p5_dropna_subset",
    oracle="""
    SELECT l_returnflag, count(*) AS n_rows
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      AND l_returnflag IS NOT NULL
    GROUP BY l_returnflag
    """,
    doc="P5: dropna(subset=features+[target]) (func_aux/func_preproc.py:142).",
    tags=("P5",),
)
def p5_dropna_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.na.drop(subset=["l_quantity", "l_extendedprice", "l_returnflag"])
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# --------------------------------------------------------------------
# Scalar layer (F1-F9, F13)
# --------------------------------------------------------------------


@register(
    "f6_dict_recode_case",
    oracle="""
    SELECT CASE
             WHEN lower(trim(event_type)) IN ('view', 'click') THEN 'browse'
             WHEN lower(trim(event_type)) IN ('purchase', 'signup') THEN 'convert'
             WHEN lower(trim(event_type)) IN ('error') THEN 'fault'
             ELSE event_type
           END AS event_group,
           count(*) AS n_rows
    FROM events
    GROUP BY 1
    """,
    doc="F6: small dict recode with identity fall-through as a codegen'd CASE "
    "chain (map_attack_to_group, func_aux/func_preproc.py:48-94).",
    tags=("F6",),
)
def f6_dict_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    groups = {"browse": ("view", "click"), "convert": ("purchase", "signup"), "fault": ("error",)}
    return (
        ev.select(attack_group_expr(F.col("event_type"), groups).alias("event_group"))
        .groupBy("event_group")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "f2_safe_numeric_cast",
    oracle="""
    SELECT count(TRY_CAST(props AS DOUBLE)) AS n_numeric,
           count(*) AS n_total,
           count(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS n_props_k
    FROM events
    """,
    doc="F2: to_numeric(errors='coerce') ≡ try_cast → null on failure "
    "(func_aux/func_preproc.py:568); plus JSON field extraction.",
    tags=("F2",),
)
def f2_safe_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.col("props").try_cast("double")).alias("n_numeric"),
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.get_json_object("props", "$.k").try_cast("double")).alias("n_props_k"),
    )


@register(
    "f8_fillna_coalesce",
    oracle="""
    SELECT coalesce(NULLIF(trim(lang), ''), 'unknown') AS lang_filled,
           count(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
    doc="F8: fillna constant via coalesce (pipeline_trainingmodels_network.py:229).",
    tags=("F8",),
)
def f8_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    filled = F.coalesce(F.nullif(F.trim("lang"), F.lit("")), F.lit("unknown"))
    return docs.select(filled.alias("lang_filled")).groupBy("lang_filled").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "f13_clip_cap",
    oracle="""
    SELECT l_returnflag,
           round(sum(least(greatest(l_quantity, 5.0), 40.0)), 4) AS sum_clipped
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="F13: clip/cap via least/greatest (class-weight cap at "
    "func_aux/func_models.py:58-60).",
    tags=("F13",),
)
def f13_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    clipped = F.least(F.greatest(F.col("l_quantity"), F.lit(5.0)), F.lit(40.0))
    return li.groupBy("l_returnflag").agg(pround(F.sum(clipped), 4).alias("sum_clipped"))


# --------------------------------------------------------------------
# Joins (J1/J4) + unions (U1)
# --------------------------------------------------------------------


@register(
    "j1_broadcast_lookup_join",
    oracle="""
    SELECT r.r_name AS region_name,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 4) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="J1: dimension lookup chain as broadcast hash joins — the Spark "
    "re-expression of the reference's dict .map() recodes "
    "(pipeline_trainingmodels_network.py:222-233).",
    tags=("J1",),
)
def j1_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy(F.col("r_name").alias("region_name")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        pround(F.sum("o_totalprice"), 4).alias("revenue"),
    )


@register(
    "j1_lookup_with_default",
    oracle="""
    SELECT coalesce(m.grp, p.p_type) AS type_group, count(*) AS n_parts
    FROM part p
    LEFT JOIN (
        SELECT * FROM (VALUES ('ECONOMY', 'cheap'), ('PROMO', 'cheap'),
                              ('STANDARD', 'normal'), ('MEDIUM', 'normal'))
        AS v(p_type, grp)
    ) m ON p.p_type = m.p_type
    GROUP BY 1
    """,
    doc="J1+F7: broadcast lookup join with coalesce fall-through to the raw "
    "value — the large-dict recode pattern (LABEL_MAPPING applied with "
    "fillna fallback, pipeline_trainingmodels_network.py:222-238).",
    tags=("J1", "F7"),
)
def j1_lookup_with_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    pairs = [("ECONOMY", "cheap"), ("PROMO", "cheap"), ("STANDARD", "normal"), ("MEDIUM", "normal")]
    # literal lookup frame built JVM-side (broadcast dim, no local relation)
    lookup = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("p_type"), F.lit(v).alias("grp"))
                    for k, v in pairs
                ]
            )
        ).alias("kv")
    ).select("kv.p_type", "kv.grp")
    joined = part.join(F.broadcast(lookup), "p_type", "left")
    return (
        joined.select(F.coalesce("grp", "p_type").alias("type_group"))
        .groupBy("type_group")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@register(
    "u1_union_all_tagged",
    oracle="""
    SELECT part_tag, count(*) AS n_rows, round(sum(acctbal), 4) AS sum_bal
    FROM (
        SELECT 'customer' AS part_tag, c_acctbal AS acctbal FROM customer
        UNION ALL
        SELECT 'supplier' AS part_tag, s_acctbal AS acctbal FROM supplier
    )
    GROUP BY part_tag
    """,
    doc="U1: tagged union-all of per-part frames (pd.concat at "
    "func_aux/func_preproc.py:193-195, :377).",
    tags=("U1", "W2"),
)
def u1_union_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("part_tag"), F.col("c_acctbal").alias("acctbal")
    )
    supp = t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("part_tag"), F.col("s_acctbal").alias("acctbal")
    )
    return (
        cust.unionByName(supp)
        .groupBy("part_tag")
        .agg(F.count(F.lit(1)).alias("n_rows"), pround(F.sum("acctbal"), 4).alias("sum_bal"))
    )


# --------------------------------------------------------------------
# Aggregations (A2-A4, A16, TPC-H Q1 style battery)
# --------------------------------------------------------------------


@register(
    "a2_count_per_attack_state",
    oracle=f"""
    WITH base AS ({POWER_BASE_SQL})
    SELECT attack, state, count(*) AS n_rows
    FROM base GROUP BY attack, state
    """,
    doc="A2: occurrence counts per Attack×State (func_aux/func_plot.py:118-124).",
    tags=("A2",),
)
def a2_count_attack_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    pv = power_view(spark, sf_dir)
    return pv.groupBy("attack", "state").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "a3_value_counts_top",
    oracle="""
    SELECT p_brand, count(*) AS n
    FROM part
    GROUP BY p_brand
    ORDER BY n DESC, p_brand ASC
    LIMIT 20
    """,
    doc="A3: value_counts top-20 with deterministic tiebreak "
    "(pipeline_trainingmodels_network.py:223).",
    tags=("A3",),
)
def a3_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("p_brand"))
        .limit(20)
    )


@register(
    "a4_count_distinct_per_column",
    oracle="""
    SELECT count(DISTINCT l_returnflag) AS nd_returnflag,
           count(DISTINCT l_linestatus) AS nd_linestatus,
           count(DISTINCT l_orderkey) AS nd_orderkey,
           count(DISTINCT l_quantity) AS nd_quantity
    FROM lineitem
    """,
    doc="A4/P7: one-pass per-column countDistinct for constant detection "
    "(func_aux/func_preproc.py:571).",
    tags=("A4", "P7"),
)
def a4_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_returnflag").alias("nd_returnflag"),
        F.countDistinct("l_linestatus").alias("nd_linestatus"),
        F.countDistinct("l_orderkey").alias("nd_orderkey"),
        F.countDistinct("l_quantity").alias("nd_quantity"),
    )


@register(
    "a16_tumbling_window_avg",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           round(round(sum(value), 2) / count(*), 6) AS avg_value,
           count(*) AS n_rows
    FROM events
    GROUP BY 1, 2
    """,
    doc="A16: binned time average ≡ tumbling window downsample "
    "(func_aux/func_plot.py:186-195).",
    tags=("A16",),
)
def a16_tumbling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        # canonicalized mean: round(sum,2) is EXACT for 2-dp data, so both
        # engines divide bit-identical operands (see plans.common.pround)
        .agg(
            pround(pround(F.sum("value"), 2) / F.count(F.lit(1)), 6).alias("avg_value"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    WITH t AS (
        SELECT l_returnflag, l_linestatus,
               CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_t,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
               CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_t,
               CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_t
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           round(sum(qty_t) / 100.0, 4) AS sum_qty,
           round(sum(price_c) / 100.0, 4) AS sum_base_price,
           round(sum(price_c * (100 - disc_t)) / 10000.0, 4) AS sum_disc_price,
           round(sum(price_c * (100 - disc_t) * (100 + tax_t)) / 1000000.0, 6)
               AS sum_charge,
           round(sum(qty_t) / 100.0 / count(*), 6) AS avg_qty,
           round(sum(price_c) / 100.0 / count(*), 6) AS avg_price,
           round(sum(disc_t) / 100.0 / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM t
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A-battery smoke: TPC-H Q1-style multi-aggregate with pushdown-able "
    "date filter — the canonical hash-agg shape the engine's metric "
    "aggregations reduce to. All four measure columns are 2dp decimals "
    "stored as doubles, so every sum is an exact BIGINT tick sum (cents; "
    "disc_price at 1e-4; charge at 1e-6) and the result is order-free and "
    "engine-identical at ANY corpus size — the earlier float-sum form "
    "went hash-`close` at the 10x sf1 probe (6M addends put a rounding "
    "boundary inside the engines' sum-order ulp gap; round 7). Tick "
    "magnitudes: cents ~1e7 x 1e4 x rows — BIGINT-safe past sf10, and "
    "the per-group partial sums fold map-side.",
    tags=("A6", "A17"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    qty_t = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    price_c = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    disc_t = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    tax_t = F.floor(F.col("l_tax") * 100 + F.lit(0.5)).cast("long")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            qty_t.alias("qty_t"),
            price_c.alias("price_c"),
            disc_t.alias("disc_t"),
            tax_t.alias("tax_t"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            pround(F.sum("qty_t") / F.lit(100.0), 4).alias("sum_qty"),
            pround(F.sum("price_c") / F.lit(100.0), 4).alias("sum_base_price"),
            pround(
                F.sum(F.col("price_c") * (F.lit(100) - F.col("disc_t")))
                / F.lit(10000.0),
                4,
            ).alias("sum_disc_price"),
            pround(
                F.sum(
                    F.col("price_c")
                    * (F.lit(100) - F.col("disc_t"))
                    * (F.lit(100) + F.col("tax_t"))
                )
                / F.lit(1000000.0),
                6,
            ).alias("sum_charge"),
            pround(F.sum("qty_t") / F.lit(100.0) / n, 6).alias("avg_qty"),
            pround(F.sum("price_c") / F.lit(100.0) / n, 6).alias("avg_price"),
            pround(F.sum("disc_t") / F.lit(100.0) / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
    )
