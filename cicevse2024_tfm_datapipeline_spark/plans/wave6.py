"""Round-3 wave 6: period-over-period trending keys, inverted-index
construction, exact bitmap audience intersection, and interval-union
coverage.

Scale extensions beyond the reference pipeline surface — retrieval-index
builds, audience algebra, and interval math as Spark relational algebra
with DuckDB oracle twins. Determinism: trend scores are ratios of
smoothed integer counts; posting lists serialize through an ORDERED
string aggregation; bitmaps and interval unions are pure BIGINT bit/
microsecond arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register
from cicevse2024_tfm_datapipeline_spark.plans.wave5 import _US


# ---------------------------------------------------------------------------
# Period-over-period trending keys (top movers)
# ---------------------------------------------------------------------------


@register(
    "a_trending_keys",
    oracle="""
    WITH c AS (
        SELECT l_partkey,
               CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                             THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                             THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
    ),
    scored AS (
        SELECT l_partkey, c1, c2,
               (c2 + 1) * 1.0 / (c1 + 1) AS lift
        FROM c
    )
    SELECT l_partkey, c1, c2, round(lift, 6) AS lift
    FROM scored
    ORDER BY lift DESC, l_partkey ASC
    LIMIT 20
    """,
    doc="Period-over-period trending keys: per part, order-line counts "
    "in 1996 vs 1997 with add-one (Laplace) smoothing so keys absent "
    "from the base period rank by absolute growth instead of dividing "
    "by zero; top-20 risers by lift. The change-detection query behind "
    "'what's suddenly hot' dashboards and drift monitors. ONE "
    "conditional-sum aggregation over the date-pruned scan (both "
    "periods in the same pass — no self-join of the two windows), then "
    "a TakeOrderedAndProject heap; lift is a single division of exact "
    "smoothed integers, tie-broken by key.",
    tags=("A", "trending", "drift"),
)
def a_trending_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.topk import top_k

    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    in97 = F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    c = li.groupBy("l_partkey").agg(
        F.sum(F.when(~in97, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(in97, 1).otherwise(0)).cast("long").alias("c2"),
    )
    scored = c.withColumn(
        "lift", (F.col("c2") + 1) * F.lit(1.0) / (F.col("c1") + 1)
    )
    top = top_k(scored, [F.desc("lift"), F.asc("l_partkey")], 20)
    return top.select("l_partkey", "c1", "c2", pround(F.col("lift"), 6).alias("lift"))


# ---------------------------------------------------------------------------
# Inverted-index construction (ordered posting lists)
# ---------------------------------------------------------------------------


@register(
    "text_inverted_index",
    oracle=r"""
    WITH tf AS (
        SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        FROM (
            SELECT doc_id,
                   unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                      x -> x <> '')) AS term
            FROM documents
        )
        GROUP BY 1, 2
    ),
    idx AS (
        SELECT term,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(tf) AS BIGINT) AS total_tf,
               string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
        FROM tf GROUP BY term
    )
    SELECT term, df, total_tf, postings
    FROM idx WHERE df >= 5
    """,
    doc="Inverted-index construction — the core build step of a "
    "retrieval/BM25 system: token explode → per-(term, doc) term "
    "frequency → per-term posting list ORDERED by doc_id, serialized "
    "as 'doc:tf' strings so the exact list content is hash-checkable "
    "across engines (ordered string aggregation ↔ array_sort + "
    "concat). Two shuffles — (term, doc) then term — both on uniform "
    "hash keys; the df >= 5 floor drops hapax noise the way real index "
    "builds do (the synthetic corpus has a closed ~30-word vocabulary, "
    "so no stop-word ceiling is needed; production adds one to cap the "
    "largest posting lists).",
    tags=("text", "index", "retrieval"),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.text import tokens_expr

    docs = t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    idx = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                lambda x: F.concat_ws(":", x["doc_id"].cast("string"), x["tf"].cast("string")),
            ),
        ).alias("postings"),
    )
    return idx.filter(F.col("df") >= 5).select(
        "term", "df", "total_tf", "postings"
    )


# ---------------------------------------------------------------------------
# Exact audience intersection via 64-bit word bitmaps
# ---------------------------------------------------------------------------


@register(
    "a_bitmap_intersection",
    oracle="""
    WITH v AS (
        SELECT user_id // 32 AS word,
               bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS bits
        FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
        GROUP BY 1
    ),
    p AS (
        SELECT user_id // 32 AS word,
               bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS bits
        FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        GROUP BY 1
    ),
    sizes AS (
        SELECT (SELECT CAST(sum(bit_count(bits)) AS BIGINT) FROM v) AS n_view,
               (SELECT CAST(sum(bit_count(bits)) AS BIGINT) FROM p) AS n_purchase,
               (SELECT CAST(coalesce(sum(bit_count(v.bits & p.bits)), 0) AS BIGINT)
                FROM v JOIN p USING (word)) AS n_both
    )
    SELECT n_view, n_purchase, n_both,
           round(n_both * 1.0 / (n_view + n_purchase - n_both), 6)
               AS audience_jaccard
    FROM sizes
    """,
    doc="Exact audience overlap via word bitmaps: each event "
    "type's user set collapses to one BIGINT per 32-user block "
    "(bit_or of shifted bits — 32 not 64 so no engine has to set the "
    "BIGINT sign bit, which DuckDB rejects as shift overflow), "
    "intersection is a word equi-join + "
    "bitwise AND + popcount — distinct-user intersection WITHOUT ever "
    "shuffling raw user ids twice, the roaring-bitmap pattern OLAP "
    "engines use for segment membership. State is |universe|/64 words "
    "regardless of event volume; the bitmap frames are reusable "
    "across any boolean audience combination (AND/OR/NOT = &, |, "
    "&~). All arithmetic is engine-portable BIGINT bit math.",
    tags=("A", "bitmap", "audience"),
)
def a_bitmap_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")

    def bitmap(event_type: str) -> DataFrame:
        # each bitmap frame feeds its own popcount AND the intersection —
        # pin it so events scans once per segment, not once per consumer
        return (
            ev.filter(F.col("event_type") == event_type)
            .select("user_id")
            .distinct()
            .groupBy(F.floor(F.col("user_id") / 32).cast("long").alias("word"))
            .agg(
                F.bit_or(
                    F.expr("shiftleft(1L, cast(user_id % 32 as int))")
                ).alias("bits")
            )
            .localCheckpoint(eager=False)
        )

    v = bitmap("view")
    p = bitmap("purchase")
    n_view = v.agg(F.sum(F.bit_count("bits")).cast("long").alias("n_view"))
    n_purchase = p.agg(
        F.sum(F.bit_count("bits")).cast("long").alias("n_purchase")
    )
    n_both = (
        v.join(p.select(F.col("word"), F.col("bits").alias("pbits")), "word")
        .agg(
            F.coalesce(
                F.sum(F.bit_count(F.col("bits").bitwiseAND(F.col("pbits")))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_both")
        )
    )
    out = n_view.crossJoin(F.broadcast(n_purchase)).crossJoin(F.broadcast(n_both))
    return out.select(
        "n_view",
        "n_purchase",
        "n_both",
        pround(
            F.col("n_both")
            * F.lit(1.0)
            / (F.col("n_view") + F.col("n_purchase") - F.col("n_both")),
            6,
        ).alias("audience_jaccard"),
    )


# ---------------------------------------------------------------------------
# Interval-union coverage per user (merge overlapping 60 s activity windows)
# ---------------------------------------------------------------------------


@register(
    "w_interval_coverage",
    oracle="""
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 60000000 AS e,
               event_id
        FROM events
    ),
    marked AS (
        SELECT user_id, s, e, event_id,
               CASE WHEN max(e) OVER (
                        PARTITION BY user_id ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                    OR s > max(e) OVER (
                        PARTITION BY user_id ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT user_id, s, e,
               sum(new_island) OVER (
                   PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM marked
    ),
    merged AS (
        SELECT user_id, island,
               max(e) - min(s) AS covered_us
        FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(covered_us) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id
    """,
    doc="Interval-union coverage: each event opens a 60 s activity "
    "window; overlapping windows merge (gaps-and-islands on the "
    "running max of interval ends — an interval starts a new island "
    "iff it begins after every earlier interval has closed), and the "
    "union's total length per user is the 'active seconds' metric "
    "billing and engagement systems compute. All windows partition by "
    "user (one shuffle); interval ends are exact integer microseconds "
    "so island boundaries and coverage sums cannot drift. The same "
    "two-window plan handles ANY interval source (sessions, "
    "incidents, maintenance windows).",
    tags=("W", "intervals", "islands"),
)
def w_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr(_US).alias("s"),
        (F.expr(_US) + F.lit(60_000_000)).alias("e"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_max_e = F.max("e").over(w_prev)
    marked = ev.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    # same (s, event_id) tie-break as the marking window — a row marked
    # non-opening MUST accumulate after its same-instant opener, or it
    # falls into the previous island and inflates its coverage
    w_isl = (
        W.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    islands = marked.select(
        "user_id", "s", "e", F.sum("new_island").over(w_isl).alias("island")
    )
    merged = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("covered_us")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum("covered_us").cast("long").alias("covered_us"),
    )
