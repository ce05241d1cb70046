"""Round-3 wave 9: largest-remainder budget allocation and run-length
encoding of movement direction.

The allocation query is the exact integer quota arithmetic a mixture
sampler needs when a token budget must be split across sources
EXACTLY (floors + largest fractional remainders — Hamilton's method);
the RLE query is the gaps-and-islands reduction of a numeric series to
its monotone runs. Both all-integer, DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

_BUDGET = 10_000


@register(
    "sample_budget_allocation",
    oracle=f"""
    WITH w AS (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS weight
        FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(weight) AS total FROM w),
    shares AS (
        SELECT source, weight,
               (weight * {_BUDGET}) // total AS floor_share,
               (weight * {_BUDGET}) % total AS remainder
        FROM w, tot
    ),
    short AS (
        SELECT {_BUDGET} - sum(floor_share) AS leftover FROM shares
    ),
    ranked AS (
        SELECT source, weight, floor_share,
               row_number() OVER (ORDER BY remainder DESC, source ASC) AS rk
        FROM shares
    )
    SELECT source, weight,
           CAST(floor_share + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS allocated
    FROM ranked, short
    """,
    doc="Largest-remainder (Hamilton) budget allocation: split an exact "
    f"{_BUDGET}-unit sampling budget across sources proportionally to "
    "their character mass so the parts SUM EXACTLY to the budget — "
    "floor the proportional shares, then hand the leftover units to the "
    "largest fractional remainders (source-name tiebreak). Plain "
    "rounding drifts by ±|sources| units; training mixtures and quota "
    "samplers need the exact total. All arithmetic is BIGINT "
    "(weight·budget // total and its modulo), the remainder ranking is "
    "a |sources|-row window, and the leftover count is a broadcast "
    "scalar — the per-source weights aggregation is the only data-sized "
    "shuffle.",
    tags=("sample", "allocation", "quota"),
)
def sample_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("weight"))
        .localCheckpoint(eager=False)
    )
    tot = w.agg(F.sum("weight").alias("total"))
    shares = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "weight",
        F.expr(f"(weight * {_BUDGET}) div total").cast("long").alias("floor_share"),
        ((F.col("weight") * _BUDGET) % F.col("total")).alias("remainder"),
    )
    short = shares.agg(
        (F.lit(_BUDGET) - F.sum("floor_share")).alias("leftover")
    )
    # remainder rank over the |sources|-row aggregate frame via the
    # triangle self-join (count of rows strictly ahead + 1) — the house
    # pattern for tiny-frame ranks; a lit-partitioned window constant-
    # folds to an unpartitioned one and trips the plan contract
    shares = shares.localCheckpoint(eager=False)
    ahead = shares.select(
        F.col("remainder").alias("__br"), F.col("source").alias("__bs")
    )
    earlier = (F.col("__br") > F.col("remainder")) | (
        (F.col("__br") == F.col("remainder")) & (F.col("__bs") < F.col("source"))
    )
    ranked = (
        shares.join(ahead, earlier, "left")
        .groupBy("source", "weight", "floor_share", "remainder")
        .agg((F.count("__bs") + 1).alias("rk"))
    )
    return ranked.crossJoin(F.broadcast(short)).select(
        "source",
        "weight",
        (
            F.col("floor_share")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("allocated"),
    )


@register(
    "w_run_length_encoding",
    oracle="""
    WITH diffs AS (
        SELECT user_id, event_id,
               CASE WHEN value > lag(value) OVER w THEN 1
                    WHEN value < lag(value) OVER w THEN -1
                    ELSE 0 END AS dir
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    moves AS (SELECT * FROM diffs WHERE dir <> 0),
    flagged AS (
        SELECT user_id, event_id, dir,
               CASE WHEN lag(dir) OVER (PARTITION BY user_id
                                        ORDER BY event_id) IS DISTINCT FROM dir
                    THEN 1 ELSE 0 END AS new_run
        FROM moves
    ),
    runs AS (
        SELECT user_id, dir,
               sum(new_run) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS run_id
        FROM flagged
    ),
    sized AS (
        SELECT user_id, run_id, dir, count(*) AS run_len
        FROM runs GROUP BY 1, 2, 3
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(run_len) AS BIGINT) AS longest_run,
           CAST(sum(CASE WHEN dir = 1 THEN run_len ELSE 0 END) AS BIGINT)
               AS up_moves
    FROM sized GROUP BY user_id
    """,
    doc="Run-length encoding of movement direction: each user's value "
    "series reduces to its monotone runs (consecutive ups / downs; "
    "flat steps are not moves), reporting run count, longest run, and "
    "total up-moves — the compressed form trend screens and technical "
    "pattern counters work on, and RLE itself is the canonical "
    "sequence-compression primitive. Two user-partitioned lag/cumsum "
    "window passes + one rollup — one shuffle, bounded per-user "
    "history; direction compares are exact double comparisons of "
    "stored values (no arithmetic), so run boundaries cannot drift.",
    tags=("W", "rle", "islands"),
)
def w_run_length_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    worder = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(worder)
    dir_ = (
        F.when(F.col("value") > prev, 1)
        .when(F.col("value") < prev, -1)
        .otherwise(0)
    )
    moves = ev.select("user_id", "event_id", dir_.alias("dir")).filter(
        F.col("dir") != 0
    )
    wmov = W.partitionBy("user_id").orderBy("event_id")
    flagged = moves.select(
        "user_id",
        "event_id",
        "dir",
        F.when(~F.lag("dir").over(wmov).eqNullSafe(F.col("dir")), 1)
        .otherwise(0)
        .alias("new_run"),
    )
    runs = flagged.select(
        "user_id",
        "dir",
        F.sum("new_run")
        .over(wmov.rowsBetween(W.unboundedPreceding, 0))
        .alias("run_id"),
    )
    sized = runs.groupBy("user_id", "run_id", "dir").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return sized.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.max("run_len").cast("long").alias("longest_run"),
        F.sum(F.when(F.col("dir") == 1, F.col("run_len")).otherwise(0))
        .cast("long")
        .alias("up_moves"),
    )


@register(
    "j_asof_forward",
    oracle="""
    WITH rights AS (
        SELECT o_custkey % 10 AS k, o_orderdate,
               max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id % 10 AS k, r.o_orderkey AS next_orderkey
    FROM (SELECT * FROM events WHERE event_id < 500) e
    ASOF LEFT JOIN rights r
      ON (e.user_id % 10) = r.k AND e.ts <= r.o_orderdate
    """,
    doc="As-of join, FORWARD direction (keyed, inclusive): each event "
    "finds the NEXT order at-or-after its timestamp within the key — "
    "the time-to-next-event lookup (next maintenance, next price tick) "
    "that completes the as-of family next to j_asof_backward. Same "
    "union + carry window shape with the scan order reversed "
    "(operators/asof.asof_join_forward), one shuffle by key; verified "
    "against DuckDB's native forward ASOF JOIN (ts <= right time picks "
    "the smallest later right row).",
    tags=("asof", "J", "forward"),
)
def j_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.operators.asof import asof_join_forward

    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    orders = t(spark, sf_dir, "orders")
    rights = (
        orders.withColumn("k", F.col("o_custkey") % 10)
        .groupBy("k", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    left = ev.withColumn("k", F.col("user_id") % 10)
    joined = asof_join_forward(
        left, rights, key="k", left_time="ts", right_time="o_orderdate",
        right_value_cols=["o_orderkey"],
    )
    return joined.select(
        "event_id", "k", F.col("o_orderkey").alias("next_orderkey")
    )
