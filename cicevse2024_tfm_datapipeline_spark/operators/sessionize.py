"""W6: sessionization / time-to-detect (SURVEY §2.6).

Reference semantics (func_aux/func_test.py:196-249): scan the window-label
sequence in order; a contiguous run of y_true=1 is an attack episode, but a
change of episode id *within* a run starts a new episode. An episode is
detected iff any window inside it has y_pred=1; the delay is
(first-detected-index − episode-start-index) · hop_seconds.

Spark-first shape — gaps-and-islands, two window passes + one aggregation:
  boundary  = y=1 AND (prev y ≠ 1 OR prev episode-id ≠ episode-id)
  island id = running sum of boundaries over the global order
  per-island agg: min(idx), min(idx | pred=1) → detected/delay.

The running order is the reference's array index; at scale the order key
must be a real partition-friendly key (group, ts). The global cumulative
sum is the one inherently sequential step; it stays a window over the
sessionization key-space, which for the reference's per-run evaluation data
(windows of one test split) is bounded — and can be partitioned per
(attack, state) group whenever episodes cannot span groups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def mark_episodes(
    df: DataFrame,
    order_cols: Sequence[str],
    y_true_col: str,
    episode_id_col: str | None = None,
    partition_cols: Sequence[str] = (),
    out_col: str = "episode",
) -> DataFrame:
    """Assign a dense episode number to every attack row (y=1); benign rows
    get null. Episode boundaries: start of a y=1 run, or episode-id change
    inside a run."""
    order = [F.col(c).asc() for c in order_cols]
    win = W.partitionBy(*partition_cols).orderBy(*order) if partition_cols else W.orderBy(*order)
    prev_y = F.lag(F.col(y_true_col)).over(win)
    is_attack = F.col(y_true_col) == 1
    boundary = is_attack & (prev_y.isNull() | (prev_y != 1))
    if episode_id_col is not None:
        prev_ep = F.lag(F.col(episode_id_col)).over(win)
        boundary = is_attack & (
            prev_y.isNull()
            | (prev_y != 1)
            | (~prev_ep.eqNullSafe(F.col(episode_id_col)))
        )
    run = W.partitionBy(*partition_cols).orderBy(*order) if partition_cols else W.orderBy(*order)
    island = F.sum(boundary.cast("int")).over(run.rowsBetween(W.unboundedPreceding, 0))
    return df.withColumn(out_col, F.when(is_attack, island))


def ttd_stats(
    df: DataFrame,
    order_cols: Sequence[str],
    y_true_col: str,
    y_pred_col: str,
    window_hop_seconds: float,
    episode_id_col: str | None = None,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Episode detection summary: one row with episodes_total,
    episodes_detected, avg_ttd_seconds, avg_ttd_hours."""
    order = [F.col(c).asc() for c in order_cols]
    win = W.partitionBy(*partition_cols).orderBy(*order) if partition_cols else W.orderBy(*order)
    idx = F.row_number().over(win)
    marked = mark_episodes(
        df, order_cols, y_true_col, episode_id_col, partition_cols
    ).withColumn("__idx", idx)
    eps = (
        marked.filter(F.col("episode").isNotNull())
        .groupBy(*(list(partition_cols) + ["episode"]))
        .agg(
            F.min("__idx").alias("start_idx"),
            F.min(F.when(F.col(y_pred_col) == 1, F.col("__idx"))).alias("det_idx"),
        )
    )
    delay = (F.col("det_idx") - F.col("start_idx")) * F.lit(float(window_hop_seconds))
    per_ep = eps.select(
        F.lit(1).alias("one"),
        F.col("det_idx").isNotNull().cast("int").alias("detected"),
        F.when(F.col("det_idx").isNotNull(), delay).alias("delay_sec"),
    )
    return per_ep.agg(
        F.count("one").alias("episodes_total"),
        F.coalesce(F.sum("detected"), F.lit(0)).alias("episodes_detected"),
        F.avg("delay_sec").alias("avg_ttd_seconds"),
        (F.avg("delay_sec") / F.lit(3600.0)).alias("avg_ttd_hours"),
    )
