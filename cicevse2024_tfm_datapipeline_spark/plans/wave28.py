"""Round-4 wave 28: Benjamini–Hochberg FDR control over a per-segment
test battery, IPS/SNIPS off-policy evaluation of a target policy on
logged events, and SPRT sequential-test boundary crossings per user.

Scale extensions beyond the reference pipeline surface. House rules:
log-likelihood increments and decision boundaries are precomputed integer
tick literals, rewards tick to exact BIGINT cents and importance weights
to 1e6-tick integers (so every sum is an order-free DECIMAL(38,0)), the
BH ranking runs on the |tests|-sized frame (bounded by key design, never
row-scale), and the only window is the per-user cumulative LLR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR over a (segment, nation) proportion-test battery
# ---------------------------------------------------------------------------

_BH_Q_TICKS = 100_000  # q = 0.10 at 1e6 ticks


@register(
    "a_benjamini_hochberg_fdr",
    oracle=f"""
    WITH rel AS (
        SELECT c.c_mktsegment AS seg, c.c_nationkey AS nat,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS hit
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    grp AS (
        SELECT seg, nat, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(hit) AS BIGINT) AS x
        FROM rel GROUP BY 1, 2
    ),
    gl AS (
        SELECT CAST(sum(n) AS BIGINT) AS gn, CAST(sum(x) AS BIGINT) AS gx,
               CAST(count(*) AS BIGINT) AS m
        FROM grp
    ),
    zs AS (
        SELECT g.seg, g.nat, g.n, g.x,
               (CAST(g.x AS DOUBLE) / g.n - CAST(gl.gx AS DOUBLE) / gl.gn)
               / sqrt((CAST(gl.gx AS DOUBLE) / gl.gn)
                      * (1.0 - CAST(gl.gx AS DOUBLE) / gl.gn) / g.n) AS z,
               gl.m
        FROM grp g CROSS JOIN gl gl
    ),
    ps AS (
        SELECT *, CAST(floor(2000000.0 / (1.0 + exp(1.702 * abs(z))) + 0.5)
                       AS BIGINT) AS p_ticks
        FROM zs
    ),
    ranked AS (
        SELECT a.seg, a.nat, a.n, a.x, a.z, a.p_ticks, a.m,
               CAST(count(*) AS BIGINT) AS rnk
        FROM ps a JOIN ps b
          ON (b.p_ticks < a.p_ticks)
          OR (b.p_ticks = a.p_ticks AND (b.seg < a.seg
              OR (b.seg = a.seg AND b.nat <= a.nat)))
        GROUP BY 1, 2, 3, 4, 5, 6, 7
    ),
    kstar AS (
        SELECT coalesce(max(CASE WHEN p_ticks * m <= rnk * {_BH_Q_TICKS}
                                 THEN rnk END), 0) AS k
        FROM ranked
    ),
    pstar AS (
        SELECT coalesce(max(CASE WHEN r.rnk <= ks.k THEN r.p_ticks END), -1)
                   AS p_cut
        FROM ranked r CROSS JOIN kstar ks
    )
    SELECT r.seg, CAST(r.nat AS BIGINT) AS nat, r.n, r.x,
           round(r.z, 6) AS z,
           round(r.p_ticks / 1000000.0, 6) AS p_value,
           r.rnk,
           CAST(CASE WHEN r.p_ticks <= p.p_cut THEN 1 ELSE 0 END AS BIGINT)
               AS rejected
    FROM ranked r CROSS JOIN pstar p
    """,
    doc="Benjamini–Hochberg FDR control (q=0.10) over the (market "
    "segment, nation) battery of one-sample proportion tests (share of "
    "finalized orders vs the global rate): z from exact integer counts, "
    "two-sided p via the logistic approximation to the normal tail "
    "(2/(1+exp(1.702|z|))), ticked to 1e6 so the BH step-up comparison "
    "p_(i) <= (i/m)q is pure integer arithmetic in both engines. Ranks "
    "come from a lexicographic non-equi self-join on the |tests|-sized "
    "frame — the test battery is bounded by key design (|segments| x "
    "|nations|), so the quadratic step never touches row-scale data; "
    "the row scan contributes one map-side-combined aggregate. This is "
    "the multiple-testing gate a metrics pipeline applies before "
    "flagging segments as anomalous.",
    tags=("stats", "testing"),
)
def a_benjamini_hochberg_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    rel = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        (F.col("o_orderstatus") == "F").cast("int").alias("hit"),
    )
    grp = rel.groupBy("seg", "nat").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("hit").cast("long").alias("x"),
    )
    glob = grp.agg(
        F.sum("n").cast("long").alias("gn"),
        F.sum("x").cast("long").alias("gx"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    p0 = F.col("gx").cast("double") / F.col("gn")
    z = (F.col("x").cast("double") / F.col("n") - p0) / F.sqrt(
        p0 * (F.lit(1.0) - p0) / F.col("n")
    )
    ps = grp.crossJoin(F.broadcast(glob)).select(
        "seg",
        "nat",
        "n",
        "x",
        z.alias("z"),
        F.floor(
            F.lit(2000000.0) / (F.lit(1.0) + F.exp(F.lit(1.702) * F.abs(z)))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("p_ticks"),
        "m",
    )
    a = ps.alias("a")
    b = ps.alias("b")
    before = (F.col("b.p_ticks") < F.col("a.p_ticks")) | (
        (F.col("b.p_ticks") == F.col("a.p_ticks"))
        & (
            (F.col("b.seg") < F.col("a.seg"))
            | ((F.col("b.seg") == F.col("a.seg")) & (F.col("b.nat") <= F.col("a.nat")))
        )
    )
    ranked = (
        a.join(F.broadcast(b), before)
        .groupBy(
            F.col("a.seg").alias("seg"),
            F.col("a.nat").alias("nat"),
            F.col("a.n").alias("n"),
            F.col("a.x").alias("x"),
            F.col("a.z").alias("z"),
            F.col("a.p_ticks").alias("p_ticks"),
            F.col("a.m").alias("m"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("rnk"))
    )
    kstar = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_ticks") * F.col("m") <= F.col("rnk") * _BH_Q_TICKS,
                    F.col("rnk"),
                )
            ),
            F.lit(0),
        ).alias("k")
    )
    pstar = (
        ranked.crossJoin(F.broadcast(kstar))
        .agg(
            F.coalesce(
                F.max(F.when(F.col("rnk") <= F.col("k"), F.col("p_ticks"))),
                F.lit(-1),
            ).alias("p_cut")
        )
    )
    return ranked.crossJoin(F.broadcast(pstar)).select(
        "seg",
        F.col("nat").cast("long").alias("nat"),
        "n",
        "x",
        pround("z", 6).alias("z"),
        pround(F.col("p_ticks") / F.lit(1000000.0), 6).alias("p_value"),
        "rnk",
        (F.col("p_ticks") <= F.col("p_cut")).cast("long").alias("rejected"),
    )


# ---------------------------------------------------------------------------
# IPS / SNIPS off-policy evaluation
# ---------------------------------------------------------------------------


@register(
    "a_ips_snips_offpolicy",
    oracle="""
    WITH ev AS (
        SELECT user_id % 5 AS bucket, event_type AS action,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS r_cents
        FROM events
    ),
    prop AS (
        SELECT action, CAST(count(*) AS BIGINT) AS cnt FROM ev GROUP BY 1
    ),
    gl AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM prop),
    ba AS (
        SELECT bucket, action, CAST(count(*) AS BIGINT) AS n_ba,
               CAST(sum(r_cents) AS BIGINT) AS sum_ba
        FROM ev GROUP BY 1, 2
    ),
    tgt AS (
        SELECT bucket, action AS target_action
        FROM (
            SELECT bucket, action,
                   row_number() OVER (
                       PARTITION BY bucket
                       ORDER BY CAST(sum_ba AS DOUBLE) / n_ba DESC, action ASC
                   ) AS rn
            FROM ba
        ) WHERE rn = 1
    ),
    w AS (
        SELECT p.action,
               CAST(floor(CAST(g.n AS DOUBLE) / p.cnt * 1000000 + 0.5)
                    AS BIGINT) AS w_ticks
        FROM prop p CROSS JOIN gl g
    ),
    matched AS (
        SELECT b.bucket, t.target_action, w.w_ticks,
               b.n_ba AS n_matched, b.sum_ba AS matched_cents
        FROM ba b
        JOIN tgt t ON t.bucket = b.bucket AND t.target_action = b.action
        JOIN w ON w.action = b.action
    ),
    tot AS (
        SELECT CAST(sum(CAST(w_ticks AS DECIMAL(18,0))
                        * CAST(matched_cents AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS swr,
               CAST(sum(CAST(w_ticks AS DECIMAL(18,0))
                        * CAST(n_matched AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS sw,
               CAST(sum(CAST(w_ticks * w_ticks AS DECIMAL(18,0))
                        * CAST(n_matched AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS sw2,
               CAST(sum(n_matched) AS BIGINT) AS n_matched
        FROM matched
    ),
    beh AS (
        SELECT CAST(sum(r_cents) AS BIGINT) AS gsum FROM ev
    )
    SELECT m.bucket, m.target_action,
           round(CAST(m.w_ticks AS DOUBLE) / 1000000.0, 6) AS inv_propensity,
           m.n_matched,
           t.n_matched AS total_matched,
           round(CAST(t.swr AS DOUBLE) / 1000000.0 / 100.0 / g.n, 6)
               AS ips_value,
           round(CAST(t.swr AS DOUBLE) / CAST(t.sw AS DOUBLE) / 100.0, 6)
               AS snips_value,
           round(CAST(t.sw AS DOUBLE) * CAST(t.sw AS DOUBLE)
                 / CAST(t.sw2 AS DOUBLE), 6) AS effective_sample_size,
           round(CAST(b.gsum AS DOUBLE) / g.n / 100.0, 6)
               AS behavior_mean_reward
    FROM matched m CROSS JOIN tot t CROSS JOIN gl g CROSS JOIN beh b
    """,
    doc="IPS / SNIPS off-policy evaluation of a deterministic target "
    "policy (per user-bucket, play the action with the highest logged "
    "mean reward) against the logging policy's empirical propensities: "
    "the counterfactual 'what would this policy have earned' readout an "
    "interaction-log pipeline computes before an online test. Rewards "
    "tick to exact cents, importance weights to 1e6-tick integers, so "
    "sum(w*r), sum(w), sum(w^2) are order-free DECIMAL(38,0) sums "
    "composed per (bucket, action) — the row scan is ONE aggregate; "
    "IPS, the self-normalized SNIPS, and Kish's effective sample size "
    "close on the |buckets|-sized frame. The target policy itself is "
    "an argmax over the (bucket, action) stats frame — bounded, "
    "broadcast, never row-scale.",
    tags=("stats", "eval", "policy"),
)
def a_ips_snips_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).alias("bucket"),
        F.col("event_type").alias("action"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("r_cents"),
    )
    # ONE scan of events: the (bucket, action) rollup is pinned (tiny —
    # |buckets|x|actions| rows) and the propensity counts, global total
    # and behavior-policy reward sum all re-aggregate it instead of
    # re-scanning the data (the unpinned form read events once per branch)
    ba = (
        ev.groupBy("bucket", "action")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ba"),
            F.sum("r_cents").cast("long").alias("sum_ba"),
        )
        .localCheckpoint(eager=False)
    )
    prop = ba.groupBy("action").agg(F.sum("n_ba").cast("long").alias("cnt"))
    glob = prop.agg(F.sum("cnt").cast("long").alias("n"))
    win = Window.partitionBy("bucket").orderBy(
        (F.col("sum_ba").cast("double") / F.col("n_ba")).desc(),
        F.col("action").asc(),
    )
    tgt = (
        ba.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select(F.col("bucket").alias("tb"), F.col("action").alias("target_action"))
    )
    w = prop.crossJoin(F.broadcast(glob)).select(
        "action",
        F.floor(F.col("n").cast("double") / F.col("cnt") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("w_ticks"),
    )
    matched = (
        ba.join(
            F.broadcast(tgt),
            (ba["bucket"] == tgt["tb"]) & (ba["action"] == tgt["target_action"]),
        )
        .join(F.broadcast(w), "action")
        .select(
            "bucket",
            "target_action",
            "w_ticks",
            F.col("n_ba").alias("n_matched"),
            F.col("sum_ba").alias("matched_cents"),
        )
    )
    dec = lambda c: c.cast("decimal(18,0)")  # noqa: E731
    tot = matched.agg(
        F.sum(dec(F.col("w_ticks")) * dec(F.col("matched_cents")))
        .cast("decimal(38,0)")
        .alias("swr"),
        F.sum(dec(F.col("w_ticks")) * dec(F.col("n_matched")))
        .cast("decimal(38,0)")
        .alias("sw"),
        F.sum(dec(F.col("w_ticks") * F.col("w_ticks")) * dec(F.col("n_matched")))
        .cast("decimal(38,0)")
        .alias("sw2"),
        F.sum("n_matched").cast("long").alias("total_matched"),
    )
    beh = ba.agg(F.sum("sum_ba").cast("long").alias("gsum"))
    return (
        matched.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(beh))
        .select(
            "bucket",
            "target_action",
            pround(F.col("w_ticks") / F.lit(1000000.0), 6).alias("inv_propensity"),
            "n_matched",
            "total_matched",
            pround(
                F.col("swr").cast("double") / F.lit(1000000.0) / F.lit(100.0) / F.col("n"),
                6,
            ).alias("ips_value"),
            pround(
                F.col("swr").cast("double") / F.col("sw").cast("double") / F.lit(100.0),
                6,
            ).alias("snips_value"),
            pround(
                F.col("sw").cast("double")
                * F.col("sw").cast("double")
                / F.col("sw2").cast("double"),
                6,
            ).alias("effective_sample_size"),
            pround(F.col("gsum").cast("double") / F.col("n") / F.lit(100.0), 6).alias(
                "behavior_mean_reward"
            ),
        )
    )


# ---------------------------------------------------------------------------
# SPRT sequential-test boundary crossings
# ---------------------------------------------------------------------------

#: 1e6-tick SPRT literals for H0: p=0.2 vs H1: p=0.4, alpha=beta=0.05
#: (ln ratios precomputed in Python — identical in both engines).
_LLR_POS = 693147  # ln(0.4/0.2)
_LLR_NEG = -287682  # ln(0.6/0.8)
_SPRT_UP = 2944439  # ln(0.95/0.05)
_SPRT_LO = -2944439  # ln(0.05/0.95)


@register(
    "a_sprt_boundary_crossing",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase'
                    THEN {_LLR_POS} ELSE {_LLR_NEG} END AS llr
        FROM events
    ),
    cum AS (
        SELECT user_id,
               row_number() OVER w AS rn,
               CAST(sum(llr) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    per_user AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(min(CASE WHEN c >= {_SPRT_UP} OR c <= {_SPRT_LO}
                             THEN rn END) AS BIGINT) AS first_cross,
               CAST(max(CASE WHEN c >= {_SPRT_UP} THEN 1 ELSE 0 END) AS BIGINT)
                   AS ever_up,
               CAST(max(c) AS BIGINT) AS max_llr,
               CAST(min(c) AS BIGINT) AS min_llr
        FROM cum GROUP BY 1
    ),
    crossed AS (
        SELECT p.user_id, p.n_events, p.first_cross,
               c.c AS llr_at_decision
        FROM per_user p
        LEFT JOIN cum c ON c.user_id = p.user_id AND c.rn = p.first_cross
    )
    SELECT c.user_id, c.n_events,
           CASE WHEN c.first_cross IS NULL THEN 'undecided'
                WHEN c.llr_at_decision >= {_SPRT_UP} THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           coalesce(c.first_cross, CAST(0 AS BIGINT)) AS n_to_decision,
           coalesce(CAST(c.llr_at_decision AS BIGINT), CAST(0 AS BIGINT))
               AS llr_ticks_at_decision
    FROM crossed c
    """,
    doc="Sequential probability ratio test per user stream (H0: purchase "
    "rate 0.2 vs H1: 0.4, alpha=beta=0.05): each event adds a "
    "precomputed integer-tick log-likelihood increment; the cumulative "
    "LLR walks between the Wald boundaries ln((1-b)/a) / ln(b/(1-a)) and "
    "the first crossing fixes the decision and the sample size it took. "
    "This is the early-stopping monitor an experimentation pipeline "
    "runs so winning/losing arms stop collecting data early. One "
    "per-user ordered window (partitioned — never global), integer "
    "ticks end-to-end (no float drift in the running sum), and the "
    "decision join targets exactly one row per user via the first-"
    "crossing index.",
    tags=("stats", "sequential", "window"),
)
def a_sprt_boundary_crossing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit(_LLR_POS))
        .otherwise(F.lit(_LLR_NEG))
        .alias("llr"),
    )
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = ev.select(
        "user_id",
        F.row_number().over(order_w).alias("rn"),
        F.sum("llr").over(order_w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("c"),
    )
    crossed = (F.col("c") >= _SPRT_UP) | (F.col("c") <= _SPRT_LO)
    per_user = cum.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(F.when(crossed, F.col("rn"))).cast("long").alias("first_cross"),
        F.max("c").cast("long").alias("max_llr"),
        F.min("c").cast("long").alias("min_llr"),
    )
    at = cum.select(
        F.col("user_id").alias("u2"),
        F.col("rn").alias("rn2"),
        F.col("c").alias("llr_at_decision"),
    )
    joined = per_user.join(
        at,
        (per_user["user_id"] == at["u2"]) & (per_user["first_cross"] == at["rn2"]),
        "left",
    )
    return joined.select(
        "user_id",
        "n_events",
        F.when(F.col("first_cross").isNull(), F.lit("undecided"))
        .when(F.col("llr_at_decision") >= _SPRT_UP, F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0"))
        .alias("decision"),
        F.coalesce(F.col("first_cross"), F.lit(0).cast("long")).alias(
            "n_to_decision"
        ),
        F.coalesce(F.col("llr_at_decision").cast("long"), F.lit(0).cast("long")).alias(
            "llr_ticks_at_decision"
        ),
    )
