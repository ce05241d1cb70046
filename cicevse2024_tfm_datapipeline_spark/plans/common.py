"""Shared fixture-view builders for the query surface.

FIXTURES.md §B maps the reference's modality shapes onto the synthetic
tables; the canonical mapping is the "power-like" view of ``events``:

    ts         ↔ timestamp
    event_type ↔ Attack       (benign-like = {view, click})
    value ≥ 100 → State = charging, else idle
    event_id   ↔ stable tiebreak / file order

Both the Spark builder and the SQL CTE below MUST stay in lockstep — every
oracle query is built on the same derivation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.functions.scalars import binary_label_expr
from cicevse2024_tfm_datapipeline_spark.sources.readers import load_table


def pround(col: Column, n: int) -> Column:
    """Portable rounding: floor(x·10ⁿ + 0.5)/10ⁿ.

    Engine round() semantics DIVERGE at half-boundaries (Spark rounds the
    shortest decimal string HALF_UP; DuckDB multiplies and C-rounds the
    binary double) — and decimal-valued data (prices, 2-dp measurements)
    lands averages exactly on those boundaries. The floor form is plain
    IEEE arithmetic: identical inputs → identical outputs in any engine.
    The oracle twin gets the same form via ``portable_round_sql``.
    """
    col = F.col(col) if isinstance(col, str) else col
    scale = F.lit(float(10**n))
    return F.floor(col * scale + F.lit(0.5)) / scale


def portable_round_sql(sql: str) -> str:
    """Rewrite every ``round(expr, n)`` in an oracle SQL string to the
    portable floor form. Paren-balanced scan; n must be an int literal."""
    out = []
    i = 0
    lower = sql.lower()
    while True:
        j = lower.find("round(", i)
        # skip names like stddev_round( — require non-word char before
        while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            j = lower.find("round(", j + 1)
        if j == -1:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        depth = 0
        k = j + len("round(")
        start = k
        last_comma = -1
        while k < len(sql):
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                last_comma = k
            k += 1
        expr = sql[start:last_comma].strip()
        n = int(sql[last_comma + 1 : k].strip())
        scale = float(10**n)
        inner = portable_round_sql(expr)
        out.append(f"(floor(({inner}) * {scale} + 0.5) / {scale})")
        i = k + 1
    return "".join(out)

#: event types treated as benign in the analogue mapping
BENIGN_EVENTS = ("view", "click")

CHARGING_THRESHOLD = 100.0


def t(spark: SparkSession, sf_dir: str, name: str, wide: bool = False) -> DataFrame:
    """``wide=True`` opts into the split-starved-scan mitigation
    (sources/readers._unstarve) — ONLY for plans whose pre-shuffle narrow
    stage is CPU-dense (shingle explosion, pairwise verify); everything
    else keeps the fused single-stage scan, which measures faster for
    light per-row work."""
    return load_table(spark, sf_dir, name, wide=wide)


def power_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → power-modality analogue (attack/state/label/ts columns)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.col("ts"),
        F.col("user_id"),
        F.col("value"),
        F.col("event_type").alias("attack"),
        F.when(F.col("value") >= F.lit(CHARGING_THRESHOLD), F.lit("charging"))
        .otherwise(F.lit("idle"))
        .alias("state"),
        binary_label_expr(F.col("event_type"), BENIGN_EVENTS).alias("label"),
    )


#: DuckDB CTE body equivalent to power_view — keep in lockstep!
POWER_BASE_SQL = """
    SELECT event_id, ts, user_id, value,
           event_type AS attack,
           CASE WHEN value >= 100.0 THEN 'charging' ELSE 'idle' END AS state,
           CASE WHEN lower(trim(event_type)) IN ('view', 'click')
                THEN 'benign' ELSE 'attack' END AS label
    FROM events
"""

#: shared split CTE chain (W1 arithmetic) parameterized by fractions.
def split_sql(train_frac: float = 0.7, val_frac: float = 0.15) -> str:
    # fractions MUST be double: DuckDB parses 0.7 as exact DECIMAL, and
    # decimal 0.7·n disagrees with the reference's Python-float int(0.7·n)
    # at sizes like n=2610 (1827 vs 1826). Spark lit() is already double.
    return f"""
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY attack, state ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY attack, state) AS n
        FROM base
    ),
    sized AS (
        SELECT *, floor(CAST({train_frac} AS DOUBLE) * n) AS ntr0,
                  floor(CAST({val_frac} AS DOUBLE) * n) AS nva0
        FROM ranked
    ),
    guarded AS (
        SELECT *,
               CASE WHEN ntr0 + nva0 >= n THEN greatest(1, ntr0) ELSE ntr0 END AS ntr
        FROM sized
    ),
    tagged AS (
        SELECT *,
               CASE WHEN rn <= ntr THEN 'train'
                    WHEN rn <= ntr + CASE WHEN ntr0 + nva0 >= n
                                          THEN greatest(0, least(n - ntr - 1, nva0))
                                          ELSE nva0 END THEN 'val'
                    ELSE 'test' END AS split
        FROM guarded
    )
    """
