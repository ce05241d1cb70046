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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.functions.scalars import binary_label_expr
from cicevse2024_tfm_datapipeline_spark.sources.readers import load_table

#: event types treated as benign in the analogue mapping
BENIGN_EVENTS = ("view", "click")

CHARGING_THRESHOLD = 100.0


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


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
    return f"""
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY attack, state ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY attack, state) AS n
        FROM base
    ),
    sized AS (
        SELECT *, floor({train_frac} * n) AS ntr0, floor({val_frac} * n) AS nva0 FROM ranked
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
