"""W6: sessionization / time-to-detect (SURVEY §2.6).

Reference semantics (func_aux/func_test.py:196-249): scan the window-label
sequence in order; a contiguous run of y_true=1 is an attack episode, but a
change of episode id *within* a run starts a new episode. An episode is
detected iff any window inside it has y_pred=1; the delay is
(first-detected-index − episode-start-index) · hop_seconds.

Spark-first shape — gaps-and-islands, two window passes + one aggregation:
  boundary  = y=1 AND (prev y ≠ 1 OR prev episode-id ≠ episode-id)
  island id = running sum of boundaries over the order
  per-island agg: min(idx), min(idx | pred=1) → detected/delay.

Scale: with ``partition_cols`` the windows are partitioned and parallel.
WITHOUT partition keys (the reference's truly-global scan), the engine does
NOT fall back to a single-task ``Window.orderBy``; it runs the two-phase
prefix-scan from :mod:`operators.scan` — range-partition on the order key,
per-partition row_number/lag/cumsum, then window-free boundary fill and
prefix offsets over the |partitions|-sized summary frame. Same results on
any partitioning; every window in the plan is partitioned.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.scan import (
    PID,
    prefix_offsets,
    range_bucketed,
)


def _boundary_expr(
    y_true_col: str, episode_id_col: str | None, prev_y: Column, prev_ep: Column | None
) -> Column:
    is_attack = F.col(y_true_col) == 1
    b = is_attack & (prev_y.isNull() | (prev_y != 1))
    if episode_id_col is not None:
        b = is_attack & (
            prev_y.isNull()
            | (prev_y != 1)
            | (~prev_ep.eqNullSafe(F.col(episode_id_col)))
        )
    return b


def _global_islands(
    df: DataFrame,
    order_cols: Sequence[str],
    y_true_col: str,
    episode_id_col: str | None,
) -> DataFrame:
    """Global-order islands without an unpartitioned window: adds ``__idx``
    (global 1-based row number) and ``episode`` (island id on attack rows,
    null elsewhere). Two-phase scan:

      phase 1: range-bucket on the order; per-bucket row_number + lag.
      fill:    a bucket's first row takes its "previous row" from the last
               row of the nearest earlier NON-EMPTY bucket — computed on
               the |buckets|-sized summary frame via a max_by anti-triangle
               join (window-free, broadcastable).
      phase 2: boundary flags → per-bucket cumsum + prefix offsets.
    """
    ordering = [F.col(c).asc() for c in order_cols]
    ordstruct = F.struct(*[F.col(c) for c in order_cols])
    bucketed = range_bucketed(df, order_cols).withColumn("__one", F.lit(1))

    w = W.partitionBy(PID).orderBy(*ordering)
    lag_cols = [F.lag(y_true_col).over(w).alias("__lp_y")]
    if episode_id_col is not None:
        lag_cols.append(F.lag(episode_id_col).over(w).alias("__lp_ep"))
    local = bucketed.select(
        "*", F.row_number().over(w).alias("__lrn"), *lag_cols
    )

    # |buckets|-sized summary: last row's y/ep per bucket, for boundary fill
    summ_aggs = [F.max_by(F.col(y_true_col), ordstruct).alias("__last_y")]
    if episode_id_col is not None:
        summ_aggs.append(F.max_by(F.col(episode_id_col), ordstruct).alias("__last_ep"))
    summ = bucketed.groupBy(PID).agg(*summ_aggs)
    # previous non-empty bucket per bucket (empty range partitions leave
    # pid gaps, so "pid − 1" is not enough): argmax-by-pid triangle join
    a = summ.select(F.col(PID))
    b = summ.select(
        F.col(PID).alias("__bpid"),
        F.col("__last_y").alias("__by"),
        *([F.col("__last_ep").alias("__bep")] if episode_id_col is not None else []),
    )
    fill_aggs = [F.max_by("__by", "__bpid").alias("__pp_y")]
    if episode_id_col is not None:
        fill_aggs.append(F.max_by("__bep", "__bpid").alias("__pp_ep"))
    fills = (
        a.join(b, F.col("__bpid") < F.col(PID), "left").groupBy(PID).agg(*fill_aggs)
    )

    rn_off = prefix_offsets(bucketed, ["__one"])
    cur = local.join(F.broadcast(rn_off), PID).join(F.broadcast(fills), PID)

    first = F.col("__lrn") == 1
    prev_y = F.when(first, F.col("__pp_y")).otherwise(F.col("__lp_y"))
    prev_ep = (
        F.when(first, F.col("__pp_ep")).otherwise(F.col("__lp_ep"))
        if episode_id_col is not None
        else None
    )
    boundary = _boundary_expr(y_true_col, episode_id_col, prev_y, prev_ep)
    with_b = cur.withColumn("__b", boundary.cast("int"))

    # phase 2: island = global cumsum of boundary flags. Reuses the same
    # PID bucketing — the per-bucket window needs no new shuffle, and the
    # offsets are another |buckets|-sized triangle join.
    wcum = w.rowsBetween(W.unboundedPreceding, 0)
    local2 = with_b.withColumn("__lisl", F.sum("__b").over(wcum))
    b_off = prefix_offsets(with_b.select(PID, "__b"), ["__b"])
    out = local2.join(F.broadcast(b_off), PID)

    is_attack = F.col(y_true_col) == 1
    return out.select(
        *df.columns,
        (F.col("__lrn") + F.col("__off___one")).alias("__idx"),
        F.when(is_attack, F.col("__lisl") + F.col("__off___b")).alias("__island"),
    )


def _partitioned_islands(
    df: DataFrame,
    order_cols: Sequence[str],
    y_true_col: str,
    episode_id_col: str | None,
    partition_cols: Sequence[str],
) -> DataFrame:
    order = [F.col(c).asc() for c in order_cols]
    win = W.partitionBy(*partition_cols).orderBy(*order)
    prev_y = F.lag(F.col(y_true_col)).over(win)
    prev_ep = (
        F.lag(F.col(episode_id_col)).over(win) if episode_id_col is not None else None
    )
    boundary = _boundary_expr(y_true_col, episode_id_col, prev_y, prev_ep)
    island = F.sum(boundary.cast("int")).over(win.rowsBetween(W.unboundedPreceding, 0))
    is_attack = F.col(y_true_col) == 1
    return df.select(
        "*",
        F.row_number().over(win).alias("__idx"),
        F.when(is_attack, island).alias("__island"),
    )


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
    inside a run. Without ``partition_cols`` the global order is scanned
    with the two-phase prefix sum (no unpartitioned window)."""
    if partition_cols:
        marked = _partitioned_islands(
            df, order_cols, y_true_col, episode_id_col, partition_cols
        )
    else:
        marked = _global_islands(df, order_cols, y_true_col, episode_id_col)
    # internal island column → caller's out_col (replacing any existing
    # column of that name, matching the old withColumn semantics)
    cols = [c for c in marked.columns if c not in ("__idx", "__island", out_col)]
    return marked.select(*cols, F.col("__island").alias(out_col))


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
    if partition_cols:
        marked = _partitioned_islands(
            df, order_cols, y_true_col, episode_id_col, partition_cols
        )
    else:
        marked = _global_islands(df, order_cols, y_true_col, episode_id_col)
    eps = (
        marked.filter(F.col("__island").isNotNull())
        .groupBy(*(list(partition_cols) + ["__island"]))
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
