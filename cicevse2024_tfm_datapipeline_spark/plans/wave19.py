"""Round-3 wave 19: Western Electric control-chart rules in PURE
integer arithmetic, and the Markov conditional entropy of the event
stream.

Scale extensions beyond the reference pipeline surface (no reference
twin; the reference is a single-machine pandas/sklearn TFM pipeline).
The SPC query contains NO floating point at all: every sigma
comparison is cross-multiplied into an exact integer inequality
((n·c - S)² vs k²·(n·Q - S²) for k-sigma), so the violation counts
are engine-identical by construction. The entropy query ticks each
term to 1e-9 BIGINTs before summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register
from cicevse2024_tfm_datapipeline_spark.plans.wave5 import _US

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Western Electric SPC rules on daily counts (pure integer arithmetic)
# ---------------------------------------------------------------------------


@register(
    "a_spc_western_electric",
    oracle=f"""
    WITH d AS (
        SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(c * c) AS BIGINT) AS q
        FROM d GROUP BY 1
    ),
    z AS (
        SELECT d.event_type, d.day, d.c, st.n, st.s, st.q,
               d.c * st.n - st.s AS dev_xn,
               st.n * st.q - st.s * st.s AS var_xn2,
               CASE WHEN d.c * st.n - st.s > 0 THEN 1
                    WHEN d.c * st.n - st.s < 0 THEN -1 ELSE 0 END AS sgn
        FROM d JOIN stats st USING (event_type)
    ),
    flags AS (
        SELECT event_type, day, sgn,
               CASE WHEN dev_xn * dev_xn > 9 * var_xn2
                    THEN 1 ELSE 0 END AS beyond3,
               CASE WHEN dev_xn * dev_xn > 4 * var_xn2
                    THEN 1 ELSE 0 END AS beyond2
        FROM z
    ),
    seq AS (
        SELECT event_type, day, sgn, beyond3, beyond2,
               sum(CASE WHEN beyond2 = 1 AND sgn > 0 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS up2,
               sum(CASE WHEN beyond2 = 1 AND sgn < 0 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS dn2,
               sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS up8,
               sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS dn8,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS rn
        FROM flags
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(beyond3) AS BIGINT) AS rule1_violations,
           CAST(sum(CASE WHEN rn >= 3 AND (up2 >= 2 OR dn2 >= 2)
                         THEN 1 ELSE 0 END) AS BIGINT) AS rule2_violations,
           CAST(sum(CASE WHEN rn >= 8 AND (up8 = 8 OR dn8 = 8)
                         THEN 1 ELSE 0 END) AS BIGINT) AS rule4_violations
    FROM seq GROUP BY event_type
    """,
    doc="Western Electric control-chart rules on daily event counts, "
    "per type: rule 1 (a point beyond 3 sigma), rule 2 (2 of 3 "
    "consecutive points beyond 2 sigma on the SAME side), rule 4 (8 "
    "consecutive points on one side of the mean) — the classic SPC "
    "battery that separates special-cause from common-cause variation "
    "before anyone stares at a dashboard. The entire query is INTEGER "
    "arithmetic: each k-sigma test cross-multiplies to "
    "(n·c - S)² > k²·(n·Q - S²) (population variance scaled by n², "
    "S = Σc, Q = Σc²), the side indicator is the sign of n·c - S, and "
    "the sequential rules are bounded ROWS-frame window sums over the "
    "per-type day series — no float exists anywhere, so the counts "
    "cannot drift between engines at any scale. One grouped "
    "aggregation plus per-type partitioned windows (bounded frames).",
    tags=("A", "spc", "control-chart"),
)
def a_spc_western_electric(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.expr(_US) / F.lit(_DAY_US)).cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    stats = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
    )
    z = d.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        (F.col("c") * F.col("n") - F.col("s")).alias("dev_xn"),
        (F.col("n") * F.col("q") - F.col("s") * F.col("s")).alias("var_xn2"),
        F.signum(F.col("c") * F.col("n") - F.col("s")).cast("int").alias("sgn"),
        "n",
    )
    flags = z.select(
        "event_type",
        "day",
        "sgn",
        F.when(
            F.col("dev_xn") * F.col("dev_xn") > 9 * F.col("var_xn2"), 1
        )
        .otherwise(0)
        .alias("beyond3"),
        F.when(
            F.col("dev_xn") * F.col("dev_xn") > 4 * F.col("var_xn2"), 1
        )
        .otherwise(0)
        .alias("beyond2"),
    )
    worder = W.partitionBy("event_type").orderBy("day")
    w3 = worder.rowsBetween(-2, 0)
    w8 = worder.rowsBetween(-7, 0)
    seq = flags.select(
        "event_type",
        "beyond3",
        F.sum(
            F.when((F.col("beyond2") == 1) & (F.col("sgn") > 0), 1).otherwise(0)
        )
        .over(w3)
        .alias("up2"),
        F.sum(
            F.when((F.col("beyond2") == 1) & (F.col("sgn") < 0), 1).otherwise(0)
        )
        .over(w3)
        .alias("dn2"),
        F.sum(F.when(F.col("sgn") > 0, 1).otherwise(0)).over(w8).alias("up8"),
        F.sum(F.when(F.col("sgn") < 0, 1).otherwise(0)).over(w8).alias("dn8"),
        F.row_number().over(worder).alias("rn"),
    )
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("beyond3").cast("long").alias("rule1_violations"),
        F.sum(
            F.when(
                (F.col("rn") >= 3)
                & ((F.col("up2") >= 2) | (F.col("dn2") >= 2)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("rule2_violations"),
        F.sum(
            F.when(
                (F.col("rn") >= 8) & ((F.col("up8") == 8) | (F.col("dn8") == 8)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("rule4_violations"),
    )


# ---------------------------------------------------------------------------
# Markov conditional entropy of the event stream
# ---------------------------------------------------------------------------


@register(
    "a_markov_conditional_entropy",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    tr AS (
        SELECT event_type AS cur, nxt, CAST(count(*) AS BIGINT) AS c
        FROM ordered WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    curs AS (SELECT cur, CAST(sum(c) AS BIGINT) AS cc FROM tr GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tr),
    nxts AS (SELECT nxt, CAST(sum(c) AS BIGINT) AS nc FROM tr GROUP BY 1),
    cond_ticks AS (
        SELECT CAST(floor((t.c * 1.0 / tot.n)
                          * log2(curs.cc * 1.0 / t.c)
                          * 1000000000 + 0.5) AS BIGINT) AS tick
        FROM tr t JOIN curs ON curs.cur = t.cur CROSS JOIN tot
    ),
    marg_ticks AS (
        SELECT CAST(floor((nc * 1.0 / n) * log2(n * 1.0 / nc)
                          * 1000000000 + 0.5) AS BIGINT) AS tick
        FROM nxts CROSS JOIN tot
    )
    SELECT (SELECT n FROM tot) AS n_transitions,
           round((SELECT sum(tick) FROM cond_ticks) / 1000000000.0, 6)
               AS cond_entropy_bits,
           round((SELECT sum(tick) FROM marg_ticks) / 1000000000.0, 6)
               AS marginal_entropy_bits,
           round(((SELECT sum(tick) FROM marg_ticks)
                  - (SELECT sum(tick) FROM cond_ticks)) / 1000000000.0, 6)
               AS information_gain_bits
    """,
    doc="Conditional entropy H(next | current) of the per-user event "
    "stream under the first-order Markov model, next to the marginal "
    "entropy H(next) and their difference (the mutual information "
    "between consecutive events) — the single number that says how "
    "PREDICTABLE the stream is and how much the Markov model actually "
    "buys over the base rate (gain ~ 0 means transition matrices are "
    "decoration). Each term -p(c,n)·log2 p(n|c) is derived from exact "
    "transition counts (one lead window per user, one grouped "
    "aggregation — the same frame `a_markov_transitions` exposes) and "
    "ticks to a 1e-9 BIGINT before the order-free integer sum; totals "
    "ride as broadcast scalars. Transition-domain-sized arithmetic: "
    "25 cells here, |event types|² in general — never data-sized "
    "after the count aggregation.",
    tags=("A", "entropy", "markov"),
)
def a_markov_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ordered = t(spark, sf_dir, "events").select(
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    tr = (
        ordered.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    curs = tr.groupBy("cur").agg(F.sum("c").cast("long").alias("cc"))
    tot = tr.agg(F.sum("c").cast("long").alias("n"))
    nxts = tr.groupBy("nxt").agg(F.sum("c").cast("long").alias("nc"))
    cond = (
        tr.join(F.broadcast(curs), "cur")
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                (F.col("c") * F.lit(1.0) / F.col("n"))
                * F.log2(F.col("cc") * F.lit(1.0) / F.col("c"))
                * 1000000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("tick")
        )
        .agg(F.sum("tick").alias("ct"))
    )
    marg = (
        nxts.crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                (F.col("nc") * F.lit(1.0) / F.col("n"))
                * F.log2(F.col("n") * F.lit(1.0) / F.col("nc"))
                * 1000000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("tick")
        )
        .agg(F.sum("tick").alias("mt"))
    )
    return (
        tot.crossJoin(F.broadcast(cond))
        .crossJoin(F.broadcast(marg))
        .select(
            F.col("n").alias("n_transitions"),
            pround(F.col("ct") / F.lit(1000000000.0), 6).alias(
                "cond_entropy_bits"
            ),
            pround(F.col("mt") / F.lit(1000000000.0), 6).alias(
                "marginal_entropy_bits"
            ),
            pround(
                (F.col("mt") - F.col("ct")) / F.lit(1000000000.0), 6
            ).alias("information_gain_bits"),
        )
    )
