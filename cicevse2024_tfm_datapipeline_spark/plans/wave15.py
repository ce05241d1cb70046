"""Round-3 wave 15: Zipf-slope estimation over the term-frequency
spectrum, an exact label-centroid cosine matrix on integer ticks,
depth-2 binary-segmentation change-points from ONE prefix-sum scan,
and a seasonal-naive forecasting backtest.

Scale extensions beyond the reference pipeline surface (no reference
twin; the reference is a single-machine pandas/sklearn TFM pipeline).
Determinism contracts follow the house rules (plans/tpch_suite.py
header): OLS and CUSUM arithmetic runs on exact BIGINT ticks, vector
sums are exact integer ticks summed per dimension (order-free), and
every emitted float is a ``pround`` of a double derived identically
in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.extensions import _TOKS
from cicevse2024_tfm_datapipeline_spark.plans.registry import register


# ---------------------------------------------------------------------------
# Zipf slope of the term-frequency spectrum (log-log OLS on ticks)
# ---------------------------------------------------------------------------


@register(
    "text_zipf_slope",
    oracle=f"""
    WITH tf AS (
        SELECT term, count(*) AS freq FROM (
            SELECT unnest({_TOKS}) AS term FROM documents
        ) GROUP BY 1
    ),
    ranked AS (
        SELECT freq,
               row_number() OVER (ORDER BY freq DESC, term DESC) AS rank
        FROM tf
    ),
    pts AS (
        SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
                   AS x,
               CAST(floor(ln(CAST(freq AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
                   AS y
        FROM ranked WHERE rank <= 1000
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM pts
    )
    SELECT n AS n_terms,
           round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 4)
               AS slope,
           round(((sy - (n * sxy - sx * sy) * 1.0
                        / (n * sxx - sx * sx) * sx) / n) / 10000.0, 4)
               AS intercept_ln,
           round(((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 4)
               AS r2
    FROM s
    """,
    doc="Zipf slope: OLS fit of ln(frequency) on ln(rank) over the top "
    "1000 terms of the corpus frequency spectrum — the power-law "
    "exponent (naturally near -1) that summarizes vocabulary "
    "concentration and flags synthetic/templated corpora (|slope| far "
    "from 1, r2 near 1 means rigid templating). Ranks come from the "
    "two-phase global scan (no unpartitioned window) over the "
    "vocabulary-sized frequency frame; each point's ln values round to "
    "exact 1e-4 BIGINT ticks BEFORE the regression sums, so every OLS "
    "moment is an order-free exact integer and slope/intercept/r2 are "
    "closed-form arithmetic on identical operands in both engines "
    "(slope is tick-scale-invariant; the intercept divides the scale "
    "back out). The rank<=1000 cut is an integer boundary.",
    tags=("text", "zipf", "powerlaw"),
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.scan import global_row_number
    from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr

    tf = (
        t(spark, sf_dir, "documents")
        .select(F.explode(tokens_expr(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = global_row_number(tf, ["freq", "term"], "rank", descending=True)
    pts = ranked.filter(F.col("rank") <= 1000).select(
        F.floor(F.log(F.col("rank").cast("double")) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("freq").cast("double")) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) * F.lit(1.0) / (n * sxx - sx * sx)
    return s.select(
        n.alias("n_terms"),
        pround(slope, 4).alias("slope"),
        pround(((sy - slope * sx) / n) / F.lit(10000.0), 4).alias("intercept_ln"),
        pround(
            ((n * sxy - sx * sy) * F.lit(1.0) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * F.lit(1.0) * (n * syy - sy * sy)),
            4,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Exact label-centroid cosine matrix on integer ticks
# ---------------------------------------------------------------------------


@register(
    "sim_label_centroid_cosine",
    oracle="""
    WITH e AS (
        SELECT label,
               unnest(range(0, len(embedding))) AS d,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000 + 0.5)
                    AS BIGINT) AS tick
        FROM embeddings
    ),
    cs AS (SELECT label, d, CAST(sum(tick) AS BIGINT) AS s FROM e GROUP BY 1, 2),
    vec AS (
        SELECT label, list(s ORDER BY d) AS v,
               CAST(list_sum(list_transform(list(s ORDER BY d), z -> z * z))
                    AS BIGINT) AS nrm2
        FROM cs GROUP BY 1
    ),
    cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY 1)
    SELECT a.label AS label_a, b.label AS label_b,
           ca.n AS n_a, cb.n AS n_b,
           round(CAST(list_sum(list_transform(range(1, len(a.v) + 1),
                                              i -> a.v[i] * b.v[i]))
                      AS BIGINT)
                 / (sqrt(a.nrm2) * sqrt(b.nrm2)), 6) AS cosine
    FROM vec a JOIN vec b ON a.label < b.label
    JOIN cnt ca ON ca.label = a.label
    JOIN cnt cb ON cb.label = b.label
    """,
    doc="Exact cosine similarity matrix between per-label centroid "
    "embeddings: elements scale to 1e-4 BIGINT ticks, the per-(label, "
    "dimension) sums are exact integers (so the distributed 'centroid' "
    "is order-free — cosine is scale-invariant, so the un-divided sum "
    "vector IS the centroid direction and no count division is "
    "needed), and each of the 45 label pairs folds a 64-term integer "
    "dot product with an exact integer norm — the only floats are two "
    "IEEE sqrts and one division of identical operands. The class-"
    "separation diagnostic before trusting an embedding space for "
    "SemDeDup/ANN/kNN. Tick dots stay under 2^63 through ~1e5 rows per "
    "label at this scale; beyond that, cast the sum vectors to double "
    "before the fold (the per-dimension integer sums stay exact far "
    "longer). Shuffles: one explode aggregation keyed by (label, dim) "
    "— 640 cells — then a 10-row self-join.",
    tags=("similarity", "centroid", "embeddings"),
)
def sim_label_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", F.posexplode("embedding").alias("d", "ev")
    ).select(
        "label",
        "d",
        F.floor(F.col("ev").cast("double") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("tick"),
    )
    cs = e.groupBy("label", "d").agg(F.sum("tick").cast("long").alias("s"))
    vec = (
        cs.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "s"))), lambda x: x["s"]
            ).alias("v")
        )
        .withColumn(
            "nrm2",
            F.aggregate(
                F.col("v"),
                F.lit(0).cast("long"),
                lambda acc, z: acc + z * z,
            ),
        )
    )
    cnt = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = vec.select(
        F.col("label").alias("label_a"), F.col("v").alias("va"), F.col("nrm2").alias("na2")
    )
    b = vec.select(
        F.col("label").alias("label_b"), F.col("v").alias("vb"), F.col("nrm2").alias("nb2")
    )
    ca = cnt.select(F.col("label").alias("label_a"), F.col("n").alias("n_a"))
    cb = cnt.select(F.col("label").alias("label_b"), F.col("n").alias("n_b"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .join(F.broadcast(ca), "label_a")
        .join(F.broadcast(cb), "label_b")
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            pround(
                dot / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))), 6
            ).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# Depth-2 binary segmentation from ONE prefix-sum scan
# ---------------------------------------------------------------------------


@register(
    "a_binary_segmentation",
    oracle="""
    WITH scaled AS (
        SELECT user_id, event_id, ts,
               CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v
        FROM events
    ),
    cum AS (
        SELECT user_id, event_id,
               sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prefix,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS i,
               sum(v) OVER (PARTITION BY user_id) AS total,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM scaled
    ),
    big AS (
        SELECT *, abs(n * prefix - i * total) AS score0
        FROM cum WHERE n >= 40
    ),
    root AS (
        SELECT user_id, event_id, i AS k1, prefix AS sk1, n, total,
               score0 AS score
        FROM (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY score0 DESC,
                                               event_id ASC) AS rk
            FROM big
        ) q WHERE rk = 1
    ),
    seg AS (
        SELECT c.user_id, c.event_id, c.i,
               CASE WHEN c.i < r.k1 THEN 'left' ELSE 'right' END AS side,
               CASE WHEN c.i < r.k1
                    THEN abs(r.k1 * c.prefix - c.i * r.sk1)
                    ELSE abs((r.n - r.k1) * (c.prefix - r.sk1)
                             - (c.i - r.k1) * (r.total - r.sk1))
               END AS score
        FROM big c JOIN root r USING (user_id)
        WHERE c.i <> r.k1 AND NOT (c.i > r.k1 AND c.i = r.n)
    ),
    child AS (
        SELECT user_id, side, event_id, score FROM (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id, side
                                      ORDER BY score DESC, event_id ASC) AS rk
            FROM seg
        ) q WHERE rk = 1
    ),
    unioned AS (
        SELECT user_id, 'root' AS level, event_id AS ev, score FROM root
        UNION ALL
        SELECT user_id, side AS level, event_id AS ev, score FROM child
    )
    SELECT user_id, level, ev AS changepoint_event_id,
           CAST(score AS BIGINT) AS score_ticks
    FROM unioned
    """,
    doc="Depth-2 binary segmentation per user: the root CUSUM argmax "
    "splits the series, then each half's best change-point is scored "
    "WITHOUT rescanning — the segment statistic |(b-a)(S_i-S_a) - "
    "(i-a)(S_b-S_a)| is pure arithmetic over the SAME per-user prefix "
    "sums the root pass computed, so recursive segmentation costs one "
    "window scan plus per-level joins of the tiny argmax frames (the "
    "standard trick that makes binary segmentation scale: prefix sums "
    "are the sufficient statistic for every sub-segment). All scores "
    "are exact BIGINT tick arithmetic with event-id tiebreaks — the "
    "argmax rows are engine-independent. Interior candidates only "
    "(i <> k1, and the segment endpoint n is excluded on the right, "
    "mirroring the root scan's own boundary behavior at i = n where "
    "the score is identically 0). Users need n >= 40 so both halves "
    "are scoreable.",
    tags=("A", "timeseries", "changepoint"),
)
def a_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long").alias("v"),
    )
    worder = W.partitionBy("user_id").orderBy("ts", "event_id")
    wall = W.partitionBy("user_id")
    cum = ev.select(
        "user_id",
        "event_id",
        F.sum("v").over(worder.rowsBetween(W.unboundedPreceding, 0)).alias("prefix"),
        F.row_number().over(worder).alias("i"),
        F.sum("v").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).filter(F.col("n") >= 40)
    # the prefix frame feeds the root argmax AND both child scorings —
    # pin it so the double-window subtree runs once
    cum = cum.localCheckpoint(eager=False)
    score0 = F.abs(F.col("n") * F.col("prefix") - F.col("i") * F.col("total"))
    wroot = W.partitionBy("user_id").orderBy(
        score0.desc(), F.col("event_id").asc()
    )
    root = (
        cum.withColumn("rk", F.row_number().over(wroot))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("root_event_id"),
            F.col("i").alias("k1"),
            F.col("prefix").alias("sk1"),
            "n",
            "total",
            score0.alias("score"),
        )
    )
    seg = (
        cum.join(root.select("user_id", "k1", "sk1"), "user_id")
        .filter(
            (F.col("i") != F.col("k1"))
            & ~((F.col("i") > F.col("k1")) & (F.col("i") == F.col("n")))
        )
        .select(
            "user_id",
            "event_id",
            F.when(F.col("i") < F.col("k1"), F.lit("left"))
            .otherwise(F.lit("right"))
            .alias("side"),
            F.when(
                F.col("i") < F.col("k1"),
                F.abs(F.col("k1") * F.col("prefix") - F.col("i") * F.col("sk1")),
            )
            .otherwise(
                F.abs(
                    (F.col("n") - F.col("k1")) * (F.col("prefix") - F.col("sk1"))
                    - (F.col("i") - F.col("k1")) * (F.col("total") - F.col("sk1"))
                )
            )
            .alias("score"),
        )
    )
    wchild = W.partitionBy("user_id", "side").orderBy(
        F.col("score").desc(), F.col("event_id").asc()
    )
    child = (
        seg.withColumn("rk", F.row_number().over(wchild))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("side").alias("level"), "event_id", "score")
    )
    rooted = root.select(
        "user_id",
        F.lit("root").alias("level"),
        F.col("root_event_id").alias("event_id"),
        "score",
    )
    return rooted.unionByName(child).select(
        "user_id",
        "level",
        F.col("event_id").alias("changepoint_event_id"),
        F.col("score").cast("long").alias("score_ticks"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest (weekly seasonality on daily counts)
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


@register(
    "w_seasonal_naive_backtest",
    oracle=f"""
    WITH d AS (
        SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    j AS (
        SELECT a.event_type, a.day, a.c AS actual, p.c AS predicted,
               abs(a.c - p.c) AS ae
        FROM d a JOIN d p
          ON p.event_type = a.event_type AND p.day = a.day - 7
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(ae) AS BIGINT) AS total_abs_err,
           round(sum(ae) * 1.0 / count(*), 6) AS mae,
           round(sum(ae) * 1.0 / sum(actual), 6) AS wape
    FROM j GROUP BY event_type
    """,
    doc="Seasonal-naive backtest: predict each day's event count per "
    "type with the count from 7 days earlier and score MAE and WAPE "
    "(sum|err|/sum actual) — the forecasting BASELINE every fancier "
    "model must beat, and the standard sanity gate before shipping a "
    "demand/traffic forecaster. The lag is an explicit day-key "
    "equi-join (day = day-7), NOT a row-lag window, so calendar gaps "
    "cannot silently misalign the season; all errors are exact "
    "integer counts and both metrics are one closing division (WAPE "
    "replaces MAPE deliberately: per-row ratio sums would accumulate "
    "floats order-dependently, while sum|err|/sum actual is exact). "
    "Work: one daily aggregation shuffle keyed by (type, day), then a "
    "self-join on the same key space.",
    tags=("W", "forecast", "backtest"),
)
def w_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.plans.wave5 import _US

    d = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.expr(_US) / F.lit(_DAY_US)).cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    a = d.select("event_type", "day", F.col("c").alias("actual"))
    p = d.select(
        "event_type", (F.col("day") + 7).alias("day"), F.col("c").alias("predicted")
    )
    j = a.join(p, ["event_type", "day"]).withColumn(
        "ae", F.abs(F.col("actual") - F.col("predicted"))
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("ae").cast("long").alias("total_abs_err"),
        pround(F.sum("ae") * F.lit(1.0) / F.count(F.lit(1)), 6).alias("mae"),
        pround(F.sum("ae") * F.lit(1.0) / F.sum("actual"), 6).alias("wape"),
    )
