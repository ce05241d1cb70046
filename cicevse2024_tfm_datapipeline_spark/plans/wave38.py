"""Round-4 wave 38: variance-inflation-factor multicollinearity
diagnostics (closed-form 3x3 correlation inverse), the Theil–Sen robust
trend slope (exact median of pairwise slopes), and a two-way ANOVA
decomposition with F statistics.

Scale extensions beyond the reference pipeline surface. House rules:
all correlation/ANOVA moments are exact integer (DECIMAL) sums from one
scan; the VIF inverse is shared SQL text on identical operands; pairwise
slopes live on calendar-bounded daily frames with windows partitioned
per series; ANOVA group contributions tick before summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.plans.common import pround, t
from cicevse2024_tfm_datapipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Variance inflation factors
# ---------------------------------------------------------------------------

_R = lambda ij: (  # noqa: E731 — Pearson r for pair ij from moment columns
    f"((n * s{ij} - s{ij[0]} * s{ij[1]})"
    f" / (sqrt(n * s{ij[0]}{ij[0]} - s{ij[0]} * s{ij[0]})"
    f"    * sqrt(n * s{ij[1]}{ij[1]} - s{ij[1]} * s{ij[1]})))"
)
_R12, _R13, _R23 = _R("12"), _R("13"), _R("23")
_DETR = (
    "(1.0 + 2.0 * r12 * r13 * r23"
    " - r12 * r12 - r13 * r13 - r23 * r23)"
)


@register(
    "a_vif_multicollinearity",
    oracle=f"""
    WITH li AS (
        SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x1,
               CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2,
               CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS x3
        FROM lineitem
    ),
    mom AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x1) AS DOUBLE) AS s1,
               CAST(sum(x2) AS DOUBLE) AS s2,
               CAST(sum(x3) AS DOUBLE) AS s3,
               CAST(sum(CAST(x1 AS DECIMAL(18,0)) * CAST(x1 AS DECIMAL(18,0)))
                    AS DOUBLE) AS s11,
               CAST(sum(CAST(x2 AS DECIMAL(18,0)) * CAST(x2 AS DECIMAL(18,0)))
                    AS DOUBLE) AS s22,
               CAST(sum(CAST(x3 AS DECIMAL(18,0)) * CAST(x3 AS DECIMAL(18,0)))
                    AS DOUBLE) AS s33,
               CAST(sum(CAST(x1 AS DECIMAL(18,0)) * CAST(x2 AS DECIMAL(18,0)))
                    AS DOUBLE) AS s12,
               CAST(sum(CAST(x1 AS DECIMAL(18,0)) * CAST(x3 AS DECIMAL(18,0)))
                    AS DOUBLE) AS s13,
               CAST(sum(CAST(x2 AS DECIMAL(18,0)) * CAST(x3 AS DECIMAL(18,0)))
                    AS DOUBLE) AS s23
        FROM li
    ),
    corr_m AS (
        SELECT {_R12} AS r12, {_R13} AS r13, {_R23} AS r23 FROM mom
    ),
    vif AS (
        SELECT r12, r13, r23, {_DETR} AS detr FROM corr_m
    )
    SELECT f.feature,
           round(CASE f.feature WHEN 'quantity' THEN 1.0
                 WHEN 'discount' THEN v.r12 ELSE v.r13 END, 6) AS r_with_x1,
           round(CASE f.feature WHEN 'quantity'
                      THEN (1.0 - v.r23 * v.r23) / v.detr
                 WHEN 'discount'
                      THEN (1.0 - v.r13 * v.r13) / v.detr
                 ELSE (1.0 - v.r12 * v.r12) / v.detr END, 6) AS vif,
           round(v.detr, 6) AS det_corr
    FROM vif v
    CROSS JOIN (SELECT * FROM (VALUES ('quantity'), ('discount'), ('tax'))
                AS t(feature)) f
    """,
    doc="Variance inflation factors for the three line-item numeric "
    "features (quantity, discount, tax): the 3x3 correlation matrix "
    "comes from ONE exact DECIMAL moment scan, and each VIF_i = "
    "[R^-1]_ii in closed form ((1 - r_jk^2)/det R) — shared SQL text "
    "in both engines, no matrix library. VIF > 5-10 flags a feature "
    "as linearly redundant BEFORE it destabilizes a regression; this "
    "is the multicollinearity screen that belongs next to the "
    "correlation matrix and WOE/IV in the feature-engineering "
    "battery. Cost: one map-side-combined aggregate; the solve runs "
    "on a 1-row frame.",
    tags=("stats", "feature", "diagnostics"),
)
def a_vif_multicollinearity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cicevse2024_tfm_datapipeline_spark.functions.literals import literal_df

    li = t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("x2"),
        F.floor(F.col("l_tax") * 100 + F.lit(0.5)).cast("long").alias("x3"),
    )
    d18 = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
    mom = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum("x3").cast("double").alias("s3"),
        F.sum(d18("x1") * d18("x1")).cast("double").alias("s11"),
        F.sum(d18("x2") * d18("x2")).cast("double").alias("s22"),
        F.sum(d18("x3") * d18("x3")).cast("double").alias("s33"),
        F.sum(d18("x1") * d18("x2")).cast("double").alias("s12"),
        F.sum(d18("x1") * d18("x3")).cast("double").alias("s13"),
        F.sum(d18("x2") * d18("x3")).cast("double").alias("s23"),
    )
    corr_m = mom.select(
        F.expr(_R12).alias("r12"),
        F.expr(_R13).alias("r13"),
        F.expr(_R23).alias("r23"),
    )
    vif = corr_m.select("r12", "r13", "r23", F.expr(_DETR).alias("detr"))
    feats = literal_df(
        spark, [("quantity",), ("discount",), ("tax",)], "feature string"
    )
    out = vif.crossJoin(F.broadcast(feats))
    # r_with_x1 is the Pearson r of each feature against x1 (quantity):
    # exactly 1.0 for quantity itself, r12 for discount, r13 for tax
    r_with = (
        F.when(F.col("feature") == "quantity", F.lit(1.0))
        .when(F.col("feature") == "discount", F.col("r12"))
        .otherwise(F.col("r13"))
    )
    vif_val = (
        F.when(
            F.col("feature") == "quantity",
            (F.lit(1.0) - F.col("r23") * F.col("r23")) / F.col("detr"),
        )
        .when(
            F.col("feature") == "discount",
            (F.lit(1.0) - F.col("r13") * F.col("r13")) / F.col("detr"),
        )
        .otherwise((F.lit(1.0) - F.col("r12") * F.col("r12")) / F.col("detr"))
    )
    return out.select(
        "feature",
        pround(r_with, 6).alias("r_with_x1"),
        pround(vif_val, 6).alias("vif"),
        pround("detr", 6).alias("det_corr"),
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend slope
# ---------------------------------------------------------------------------


@register(
    "a_theil_sen_slope",
    oracle="""
    WITH ev AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    daily AS (
        SELECT event_type, day,
               CAST(floor(CAST(sum(cents) AS DOUBLE) / count(*) * 10000 + 0.5)
                    AS BIGINT) AS mt,
               datediff('day', DATE '2020-01-01', day) AS di
        FROM ev GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.event_type,
               CAST(floor(CAST(b.mt - a.mt AS DOUBLE) / (b.di - a.di) + 0.5)
                    AS BIGINT) AS slope_t,
               a.day AS da, b.day AS db
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
    ),
    ranked AS (
        SELECT event_type, slope_t,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY slope_t, da, db) AS rn,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
        FROM slopes
    )
    SELECT event_type, m AS n_pairs,
           round(slope_t / 10000.0 / 100.0, 6) AS sen_slope_per_day,
           CASE WHEN slope_t > 0 THEN 'increasing'
                WHEN slope_t < 0 THEN 'decreasing'
                ELSE 'flat' END AS direction
    FROM ranked WHERE rn = CAST(ceil(m / 2.0) AS BIGINT)
    """,
    doc="Theil–Sen robust trend slope per event series: the exact lower "
    "median of all pairwise day-slopes of the daily mean — the "
    "breakdown-resistant complement to the Mann–Kendall trend TEST "
    "(MK says 'is there a trend', Theil–Sen says 'how steep'), immune "
    "to ~29% outlier contamination where OLS is not. Daily means tick "
    "to 1e-4 cents, each pairwise slope ticks before ranking so the "
    "median pick is an exact integer order statistic (deterministic "
    "(slope, day-pair) tiebreak), and the quadratic pair space is "
    "bounded by the calendar per series — the row scan itself is one "
    "daily aggregate.",
    tags=("stats", "trend", "robust"),
)
def a_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.floor(
            F.sum("cents").cast("double") / F.count(F.lit(1)) * 10000 + F.lit(0.5)
        )
        .cast("long")
        .alias("mt")
    ).withColumn("di", F.datediff(F.col("day"), F.lit("2020-01-01").cast("date")))
    a = daily.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("da"),
        F.col("mt").alias("ma"),
        F.col("di").alias("ia"),
    )
    b = daily.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("db"),
        F.col("mt").alias("mb"),
        F.col("di").alias("ib"),
    )
    slopes = (
        a.join(b, "et")
        .filter(F.col("da") < F.col("db"))
        .select(
            "et",
            F.floor(
                (F.col("mb") - F.col("ma")).cast("double")
                / (F.col("ib") - F.col("ia"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("slope_t"),
            "da",
            "db",
        )
    )
    # pair frames are calendar-bounded per series — a per-series window
    # over |days|^2/2 rows, never raw data
    w = Window.partitionBy("et")
    ranked = slopes.select(
        "et",
        "slope_t",
        F.row_number()
        .over(w.orderBy("slope_t", "da", "db"))
        .alias("rn"),
        F.count(F.lit(1)).over(w).cast("long").alias("m"),
    )
    return ranked.filter(
        F.col("rn") == F.ceil(F.col("m") / F.lit(2.0)).cast("long")
    ).select(
        F.col("et").alias("event_type"),
        F.col("m").alias("n_pairs"),
        pround(F.col("slope_t") / F.lit(10000.0) / F.lit(100.0), 6).alias(
            "sen_slope_per_day"
        ),
        F.when(F.col("slope_t") > 0, F.lit("increasing"))
        .when(F.col("slope_t") < 0, F.lit("decreasing"))
        .otherwise(F.lit("flat"))
        .alias("direction"),
    )


# ---------------------------------------------------------------------------
# Two-way ANOVA
# ---------------------------------------------------------------------------


@register(
    "a_two_way_anova",
    oracle="""
    WITH rel AS (
        SELECT c.c_mktsegment AS fa, o.o_orderpriority AS fb,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS syy
        FROM rel
    ),
    ca AS (SELECT fa, CAST(count(*) AS BIGINT) AS na,
                  CAST(sum(y) AS BIGINT) AS sa FROM rel GROUP BY 1),
    cb AS (SELECT fb, CAST(count(*) AS BIGINT) AS nb,
                  CAST(sum(y) AS BIGINT) AS sb FROM rel GROUP BY 1),
    cab AS (SELECT fa, fb, CAST(count(*) AS BIGINT) AS nab,
                   CAST(sum(y) AS BIGINT) AS sab FROM rel GROUP BY 1, 2),
    ssa AS (
        SELECT CAST(sum(CAST(floor(
                   na * (CAST(sa AS DOUBLE) / na - CAST(g.sy AS DOUBLE) / g.n)
                      * (CAST(sa AS DOUBLE) / na - CAST(g.sy AS DOUBLE) / g.n)
                   / 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS ss_t,
               CAST(count(*) AS BIGINT) - 1 AS df
        FROM ca CROSS JOIN g
    ),
    ssb AS (
        SELECT CAST(sum(CAST(floor(
                   nb * (CAST(sb AS DOUBLE) / nb - CAST(g.sy AS DOUBLE) / g.n)
                      * (CAST(sb AS DOUBLE) / nb - CAST(g.sy AS DOUBLE) / g.n)
                   / 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS ss_t,
               CAST(count(*) AS BIGINT) - 1 AS df
        FROM cb CROSS JOIN g
    ),
    sscell AS (
        SELECT CAST(sum(CAST(floor(
                   nab * (CAST(sab AS DOUBLE) / nab - CAST(g.sy AS DOUBLE) / g.n)
                       * (CAST(sab AS DOUBLE) / nab - CAST(g.sy AS DOUBLE) / g.n)
                   / 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS ss_t,
               CAST(count(*) AS BIGINT) AS ncells
        FROM cab CROSS JOIN g
    ),
    sst AS (
        SELECT CAST(floor((CAST(g.syy AS DOUBLE)
                   - CAST(g.sy AS DOUBLE) * g.sy / g.n) / 100.0 + 0.5)
                   AS BIGINT) AS ss_t,
               g.n - 1 AS df, g.n AS n
        FROM g
    ),
    parts AS (
        SELECT sst.n,
               ssa.ss_t AS a_t, ssa.df AS a_df,
               ssb.ss_t AS b_t, ssb.df AS b_df,
               sscell.ss_t - ssa.ss_t - ssb.ss_t AS ab_t,
               sscell.ncells - 1 - ssa.df - ssb.df AS ab_df,
               sst.ss_t - sscell.ss_t AS e_t,
               sst.n - sscell.ncells AS e_df,
               sst.ss_t AS t_t, sst.df AS t_df
        FROM ssa CROSS JOIN ssb CROSS JOIN sscell CROSS JOIN sst
    ),
    longf AS (
        SELECT 'factor_a' AS effect, a_df AS df, a_t AS ss_t,
               e_t AS e_t, e_df AS e_df FROM parts
        UNION ALL
        SELECT 'factor_b', b_df, b_t, e_t, e_df FROM parts
        UNION ALL
        SELECT 'interaction', ab_df, ab_t, e_t, e_df FROM parts
        UNION ALL
        SELECT 'error', e_df, e_t, e_t, e_df FROM parts
        UNION ALL
        SELECT 'total', t_df, t_t, e_t, e_df FROM parts
    )
    SELECT effect, CAST(df AS BIGINT) AS df,
           round(ss_t / 100.0, 2) AS sum_sq,
           round(CASE WHEN df > 0 THEN ss_t / 100.0 / df ELSE 0.0 END, 2)
               AS mean_sq,
           round(CASE WHEN effect IN ('factor_a', 'factor_b', 'interaction')
                      AND df > 0 AND e_df > 0 AND e_t > 0
                      THEN (CAST(ss_t AS DOUBLE) / df)
                           / (CAST(e_t AS DOUBLE) / e_df)
                      ELSE 0.0 END, 6) AS f_stat
    FROM longf
    """,
    doc="Two-way ANOVA of order value on (customer segment x order "
    "priority): main-effect, interaction, error and total sums of "
    "squares from the classical cell/marginal-mean decomposition "
    "(balanced-design formulas, stated as such), with F statistics "
    "against the within-cell error. Every SS term is a sum of "
    "per-group ticked contributions built from exact integer cent "
    "sums — three groupBys + one global moment over ONE scan; the "
    "decomposition algebra runs on |A| + |B| + |A x B| rows. The "
    "variance-attribution readout an analyst wants before trusting "
    "any single-factor breakdown.",
    tags=("stats", "anova"),
)
def a_two_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    rel = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        F.col("c_mktsegment").alias("fa"),
        F.col("o_orderpriority").alias("fb"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    g = rel.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y").cast("decimal(18,0)") * F.col("y").cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    gm = F.col("sy").cast("double") / F.col("n")

    def ss_from(groups: DataFrame, cnt: str, s: str) -> DataFrame:
        dev = F.col(s).cast("double") / F.col(cnt) - gm
        return groups.crossJoin(F.broadcast(g)).agg(
            F.sum(
                F.floor(F.col(cnt) * dev * dev / F.lit(100.0) + F.lit(0.5)).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("ss_t"),
            F.count(F.lit(1)).cast("long").alias("ngroups"),
        )

    ca = rel.groupBy("fa").agg(
        F.count(F.lit(1)).cast("long").alias("na"),
        F.sum("y").cast("long").alias("sa"),
    )
    cb = rel.groupBy("fb").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("y").cast("long").alias("sb"),
    )
    cab = rel.groupBy("fa", "fb").agg(
        F.count(F.lit(1)).cast("long").alias("nab"),
        F.sum("y").cast("long").alias("sab"),
    )
    ssa = ss_from(ca, "na", "sa").select(
        F.col("ss_t").alias("a_t"), (F.col("ngroups") - 1).alias("a_df")
    )
    ssb = ss_from(cb, "nb", "sb").select(
        F.col("ss_t").alias("b_t"), (F.col("ngroups") - 1).alias("b_df")
    )
    sscell = ss_from(cab, "nab", "sab").select(
        F.col("ss_t").alias("cell_t"), F.col("ngroups").alias("ncells")
    )
    sst = g.select(
        F.floor(
            (
                F.col("syy").cast("double")
                - F.col("sy").cast("double") * F.col("sy") / F.col("n")
            )
            / F.lit(100.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t_t"),
        (F.col("n") - 1).alias("t_df"),
        F.col("n").alias("n"),
    )
    parts = (
        ssa.crossJoin(ssb)
        .crossJoin(sscell)
        .crossJoin(sst)
        .select(
            "n",
            "a_t",
            "a_df",
            "b_t",
            "b_df",
            (F.col("cell_t") - F.col("a_t") - F.col("b_t")).alias("ab_t"),
            (F.col("ncells") - 1 - F.col("a_df") - F.col("b_df")).alias("ab_df"),
            (F.col("t_t") - F.col("cell_t")).alias("e_t"),
            (F.col("n") - F.col("ncells")).alias("e_df"),
            "t_t",
            "t_df",
        )
    )
    rows = []
    for eff, df_c, ss_c in (
        ("factor_a", "a_df", "a_t"),
        ("factor_b", "b_df", "b_t"),
        ("interaction", "ab_df", "ab_t"),
        ("error", "e_df", "e_t"),
        ("total", "t_df", "t_t"),
    ):
        rows.append(
            parts.select(
                F.lit(eff).alias("effect"),
                F.col(df_c).cast("long").alias("df"),
                F.col(ss_c).alias("ss_t"),
                F.col("e_t"),
                F.col("e_df"),
            )
        )
    longf = rows[0]
    for r in rows[1:]:
        longf = longf.unionAll(r)
    is_tested = F.col("effect").isin("factor_a", "factor_b", "interaction")
    return longf.select(
        "effect",
        "df",
        pround(F.col("ss_t") / F.lit(100.0), 2).alias("sum_sq"),
        pround(
            F.when(
                F.col("df") > 0, F.col("ss_t") / F.lit(100.0) / F.col("df")
            ).otherwise(F.lit(0.0)),
            2,
        ).alias("mean_sq"),
        pround(
            F.when(
                is_tested
                & (F.col("df") > 0)
                & (F.col("e_df") > 0)
                & (F.col("e_t") > 0),
                (F.col("ss_t").cast("double") / F.col("df"))
                / (F.col("e_t").cast("double") / F.col("e_df")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("f_stat"),
    )
