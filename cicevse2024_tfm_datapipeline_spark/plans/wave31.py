"""Round-4 wave 31: cumulative gains / lift curves for a scored binary
outcome, RFM (recency-frequency-monetary) customer segmentation on exact
global quintiles, and Apriori frequent-triple mining with the candidate
prune.

Scale extensions beyond the reference pipeline surface. House rules:
deciles/quintiles come from the two-phase global NTILE (no unpartitioned
window), cumulative sums over the decile frame are bounded self-joins
(10x10), supports and money are exact integers, and the Apriori
candidate space is generated from frequent pairs only (item-vocabulary
bounded) — the basket scan never self-joins unfiltered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.scan import global_ntile
from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Cumulative gains / lift curves
# ---------------------------------------------------------------------------


@register(
    "a_lift_gain_curves",
    oracle="""
    WITH ev AS (
        SELECT event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events
    ),
    tiled AS (
        SELECT *, ntile(10) OVER (ORDER BY cents DESC, event_id) AS decile
        FROM ev
    ),
    d AS (
        SELECT decile, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pos) AS BIGINT) AS np
        FROM tiled GROUP BY 1
    ),
    cum AS (
        SELECT a.decile, a.n, a.np,
               CAST(sum(b.n) AS BIGINT) AS cum_n,
               CAST(sum(b.np) AS BIGINT) AS cum_np
        FROM d a JOIN d b ON b.decile <= a.decile
        GROUP BY 1, 2, 3
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(np) AS BIGINT) AS tp
        FROM d
    )
    SELECT CAST(c.decile AS BIGINT) AS decile, c.n, c.np AS n_pos,
           round(CAST(c.np AS DOUBLE) / c.n, 6) AS response_rate,
           round(CAST(c.cum_np AS DOUBLE) / t.tp, 6) AS cum_gain,
           round(CAST(c.cum_np AS DOUBLE) * t.tn
                 / (CAST(c.cum_n AS DOUBLE) * t.tp), 6) AS cum_lift
    FROM cum c CROSS JOIN tot t
    """,
    doc="Cumulative gains and lift table for a scored binary outcome "
    "(value-score vs the purchase label): rows rank into exact global "
    "score deciles via the two-phase NTILE (operators.scan.global_ntile "
    "— one range shuffle, NO unpartitioned window), per-decile response "
    "rates and the cumulative gain/lift columns close on the 10-row "
    "decile frame with a bounded <= self-join standing in for the "
    "running sum. Gain and lift are ratios of exact integer counts. "
    "This is the model-evaluation artifact campaign-targeting teams "
    "read ('the top 2 deciles capture 40% of responders at 2x lift') — "
    "and the decile cut is the same primitive the curriculum/quality "
    "binning uses, so it scales with one scan + one range shuffle.",
    tags=("stats", "eval", "ranking"),
)
def a_lift_gain_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        (F.col("event_type") == "purchase").cast("int").alias("pos"),
    )
    tiled = global_ntile(
        ev.withColumn("__neg", -F.col("cents")),
        ["__neg", "event_id"],
        10,
        out_col="decile",
    )
    d = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("np"),
    )
    a = d.select(
        F.col("decile").alias("da"), F.col("n").alias("na"), F.col("np").alias("npa")
    )
    b = d.select(F.col("decile").alias("db"), "n", "np")
    cum = (
        a.join(F.broadcast(b), F.col("db") <= F.col("da"))
        .groupBy("da", "na", "npa")
        .agg(
            F.sum("n").cast("long").alias("cum_n"),
            F.sum("np").cast("long").alias("cum_np"),
        )
    )
    tot = d.agg(
        F.sum("n").cast("long").alias("tn"), F.sum("np").cast("long").alias("tp")
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        F.col("da").cast("long").alias("decile"),
        F.col("na").alias("n"),
        F.col("npa").alias("n_pos"),
        pround(F.col("npa").cast("double") / F.col("na"), 6).alias("response_rate"),
        pround(F.col("cum_np").cast("double") / F.col("tp"), 6).alias("cum_gain"),
        pround(
            F.col("cum_np").cast("double")
            * F.col("tn")
            / (F.col("cum_n").cast("double") * F.col("tp")),
            6,
        ).alias("cum_lift"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------

_SEG_SQL = """CASE WHEN r_score = 5 AND f_score >= 4 THEN 'champions'
     WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
     WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
     WHEN f_score = 5 THEN 'loyal'
     WHEN r_score = 5 AND f_score <= 2 THEN 'recent'
     ELSE 'other' END"""


@register(
    "a_rfm_segmentation",
    oracle=f"""
    WITH cust AS (
        SELECT o_custkey AS ck,
               CAST(max(o_orderdate) AS DATE) AS last_d,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    ref AS (SELECT max(last_d) AS ref_d FROM cust),
    rfm AS (
        SELECT c.ck, datediff('day', c.last_d, r.ref_d) AS r_days,
               c.freq, c.cents
        FROM cust c CROSS JOIN ref r
    ),
    scored AS (
        SELECT ck, cents,
               6 - ntile(5) OVER (ORDER BY r_days, ck) AS r_score,
               6 - ntile(5) OVER (ORDER BY -freq, ck) AS f_score,
               6 - ntile(5) OVER (ORDER BY -cents, ck) AS m_score
        FROM rfm
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           {_SEG_SQL} AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(cents) AS DOUBLE) / count(*) / 100.0, 6)
               AS avg_monetary
    FROM scored GROUP BY 1, 2, 3, 4
    """,
    doc="RFM customer segmentation: recency (days since last order vs "
    "the dataset's reference date), frequency (order count) and "
    "monetary (exact cents) score into exact global quintiles via the "
    "two-phase NTILE — three range shuffles over the |customers|-sized "
    "aggregate frame, never over raw orders — then the (R,F,M) cells "
    "roll up with the classic marketing segment labels (champions / "
    "at-risk / hibernating / loyal / recent). Note the inversion "
    "6-ntile so 5 always means best. The full pipeline is one orders "
    "aggregate + three bounded quantile passes: the standard customer-"
    "grading artifact at any corpus size.",
    tags=("stats", "segmentation"),
)
def a_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "orders").groupBy(F.col("o_custkey").alias("ck")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    ref = cust.agg(F.max("last_d").alias("ref_d"))
    rfm = cust.crossJoin(F.broadcast(ref)).select(
        "ck",
        F.datediff(F.col("ref_d"), F.col("last_d")).alias("r_days"),
        "freq",
        "cents",
    )
    s1 = global_ntile(rfm, ["r_days", "ck"], 5, out_col="r_tile")
    s2 = global_ntile(
        s1.withColumn("__negf", -F.col("freq")), ["__negf", "ck"], 5, out_col="f_tile"
    )
    s3 = global_ntile(
        s2.withColumn("__negm", -F.col("cents")), ["__negm", "ck"], 5, out_col="m_tile"
    )
    scored = s3.select(
        "ck",
        "cents",
        (F.lit(6) - F.col("r_tile")).alias("r_score"),
        (F.lit(6) - F.col("f_tile")).alias("f_score"),
        (F.lit(6) - F.col("m_tile")).alias("m_score"),
    )
    return scored.groupBy(
        F.col("r_score").cast("long").alias("r_score"),
        F.col("f_score").cast("long").alias("f_score"),
        F.col("m_score").cast("long").alias("m_score"),
        F.expr(_SEG_SQL).alias("segment"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        pround(
            F.sum("cents").cast("double") / F.count(F.lit(1)) / F.lit(100.0), 6
        ).alias("avg_monetary"),
    )


# ---------------------------------------------------------------------------
# Apriori frequent triples
# ---------------------------------------------------------------------------

_MINSUP_FRAC = 0.005


@register(
    "a_apriori_triples",
    oracle=f"""
    WITH b AS (
        SELECT DISTINCT l.l_orderkey AS oid, p.p_brand AS item
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (
        SELECT CAST(count(DISTINCT oid) AS BIGINT) AS nb,
               greatest(CAST(2 AS BIGINT),
                        CAST(floor(count(DISTINCT oid) * {_MINSUP_FRAC})
                             AS BIGINT)) AS ms
        FROM b
    ),
    triples AS (
        SELECT x.item AS item_a, y.item AS item_b, z.item AS item_c,
               CAST(count(*) AS BIGINT) AS support
        FROM b x
        JOIN b y ON y.oid = x.oid AND x.item < y.item
        JOIN b z ON z.oid = x.oid AND y.item < z.item
        GROUP BY 1, 2, 3
    )
    SELECT t.item_a, t.item_b, t.item_c, t.support, n.nb AS n_baskets,
           round(CAST(t.support AS DOUBLE) / n.nb, 6) AS support_frac
    FROM triples t CROSS JOIN n
    WHERE t.support >= n.ms
    """,
    doc="Apriori frequent-triple mining over order baskets (items = part "
    "brands, a bounded vocabulary): the Spark plan runs the REAL "
    "Apriori ladder — frequent items L1, frequent pairs L2, candidate "
    "triples generated only from L2 pairs sharing a prefix AND with "
    "the third sub-pair also frequent (the Apriori prune), then one "
    "counting pass restricted to the broadcast candidate set. The "
    "oracle counts triples directly and applies the same support "
    "threshold — equivalent by the Apriori property (every frequent "
    "triple's sub-pairs are frequent), which the plan exploits and the "
    "oracle certifies. Supports are exact integers; minsup = "
    "max(2, 0.5% of baskets). At 100 TB the candidate space is bounded "
    "by the item vocabulary, the basket self-joins are oid equi-joins, "
    "and the prune keeps the counting join's build side broadcast-"
    "small.",
    tags=("stats", "mining", "join"),
)
def a_apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # pins: b has three consumers (n, L1, the pruned frame), bf five
    # (both sides of the pair join + three sides of the triple join), and
    # n is referenced by every level's filter — unpinned, the
    # join+distinct basket subtree re-executed once per consumer
    b = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("oid"), F.col("p_brand").alias("item"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = b.agg(
        F.countDistinct("oid").cast("long").alias("nb"),
        F.greatest(
            F.lit(2).cast("long"),
            F.floor(F.countDistinct("oid") * _MINSUP_FRAC).cast("long"),
        ).alias("ms"),
    ).localCheckpoint(eager=False)
    # L1: frequent items
    l1 = (
        b.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("s1"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("s1") >= F.col("ms"))
        .select("item")
    )
    bf = b.join(F.broadcast(l1), "item").localCheckpoint(
        eager=False
    )  # items pruned to L1
    # L2: frequent pairs
    x = bf.select(F.col("oid"), F.col("item").alias("ia"))
    y = bf.select(F.col("oid"), F.col("item").alias("ib"))
    l2 = (
        x.join(y, "oid")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).cast("long").alias("s2"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("s2") >= F.col("ms"))
        .select("ia", "ib")
    )
    # C3: join L2 pairs sharing the first item, prune on the (b, c) pair
    p1 = l2.select(F.col("ia").alias("c1"), F.col("ib").alias("c2"))
    p2 = l2.select(F.col("ia").alias("c1"), F.col("ib").alias("c3"))
    cand = (
        p1.join(p2, "c1")
        .filter(F.col("c2") < F.col("c3"))
        .join(
            l2.select(F.col("ia").alias("c2"), F.col("ib").alias("c3")),
            ["c2", "c3"],
        )
    )
    # counting pass restricted to the broadcast candidate set
    t1 = bf.select("oid", F.col("item").alias("c1"))
    t2 = bf.select("oid", F.col("item").alias("c2"))
    t3 = bf.select("oid", F.col("item").alias("c3"))
    inst = (
        t1.join(t2, "oid")
        .filter(F.col("c1") < F.col("c2"))
        .join(t3, "oid")
        .filter(F.col("c2") < F.col("c3"))
        .join(F.broadcast(cand), ["c1", "c2", "c3"])
    )
    l3 = inst.groupBy("c1", "c2", "c3").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    return (
        l3.crossJoin(F.broadcast(n))
        .filter(F.col("support") >= F.col("ms"))
        .select(
            F.col("c1").alias("item_a"),
            F.col("c2").alias("item_b"),
            F.col("c3").alias("item_c"),
            "support",
            F.col("nb").alias("n_baskets"),
            pround(F.col("support").cast("double") / F.col("nb"), 6).alias(
                "support_frac"
            ),
        )
    )
