"""As-of and range joins — operators Spark lacks natively, composed from
built-ins (SURVEY §2.4 'free in Spark' note; the task's custom-operator
patterns).

As-of join (keyed, backward, inclusive): for each left row, the single
right row with the greatest right_time ≤ left_time within the key.
Spark shape — the union trick, NO per-group Python:

  1. tag left/right rows and union them on (key, time);
  2. one window per key ordered by (time, right-first-on-ties):
     ``last(right_payload, ignorenulls)`` over the preceding frame
     carries the latest right value forward;
  3. keep left rows.

One shuffle by key; skew follows the key distribution (salt hot keys
upstream if needed). This beats per-group ``pd.merge_asof`` whenever the
key count is large; the applyInPandas fallback remains the escape hatch
for interval semantics the window can't express.

Range join: left.time ∈ [right.start, right.start + width). A naive
theta-join is O(n·m); bucketizing time to width-sized buckets turns it
into an equi-join on (key?, bucket) ∪ (key?, bucket−1) + residual filter —
candidates per row are bounded by bucket occupancy, not table size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Keyed backward as-of join (inclusive: right_time ≤ left_time).
    Rights sharing (key, time) must be pre-deduplicated for determinism."""
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__rv_{c}") for c in right_value_cols],
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lt.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__rv_{c}") for c in right_value_cols],
    )
    # right rows sort BEFORE left rows at equal time → inclusive semantics
    win = (
        W.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = lt.unionByName(rt)
    for c in right_value_cols:
        carried = carried.withColumn(
            f"__rv_{c}", F.last(F.col(f"__rv_{c}"), ignorenulls=True).over(win)
        )
    out = carried.filter(F.col("__is_left") == 1)
    cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"__rv_{c}").alias(c) for c in right_value_cols]
    return out.select(*cols)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Keyed forward as-of join (inclusive: right_time ≥ left_time) — the
    NEXT-event lookup (time-to-next-maintenance, next price tick). Same
    union trick as backward with the scan reversed: order by time
    DESCENDING (right rows before left rows at equal time so the
    inclusive bound holds) and carry the nearest LATER right value
    backward. Rights sharing (key, time) must be pre-deduplicated."""
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__rv_{c}") for c in right_value_cols],
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lt.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__rv_{c}") for c in right_value_cols],
    )
    win = (
        W.partitionBy("__k")
        .orderBy(F.col("__t").desc(), F.col("__is_left").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = lt.unionByName(rt)
    for c in right_value_cols:
        carried = carried.withColumn(
            f"__rv_{c}", F.last(F.col(f"__rv_{c}"), ignorenulls=True).over(win)
        )
    out = carried.filter(F.col("__is_left") == 1)
    cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"__rv_{c}").alias(c) for c in right_value_cols]
    return out.select(*cols)


def bucketized_range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_start: str,
    width_expr: Column,
    bucket_seconds: int,
) -> DataFrame:
    """left.time ∈ [right.start, right.start + width): equi-join on time
    buckets (candidate right rows come from the row's bucket and the
    previous one — valid while width ≤ bucket_seconds) + exact filter."""
    lb = left.withColumn(
        "__bucket", (F.unix_timestamp(F.col(left_time)) / bucket_seconds).cast("long")
    )
    rb = right.withColumn(
        "__bstart", (F.unix_timestamp(F.col(right_start)) / bucket_seconds).cast("long")
    )
    candidates = rb.withColumn(
        "__bucket", F.explode(F.array(F.col("__bstart"), F.col("__bstart") + 1))
    ).drop("__bstart")
    joined = lb.join(candidates, "__bucket")
    in_range = (F.col(left_time) >= F.col(right_start)) & (
        F.col(left_time) < F.col(right_start) + width_expr
    )
    return joined.filter(in_range).drop("__bucket")


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """SCD2 history build: each change-log row becomes a version with a
    half-open validity interval — ``valid_from`` = its own timestamp,
    ``valid_to`` = the key's next change (null while current), plus a
    1-based ``version`` rank and ``is_current``. The snapshot-with-history
    primitive behind point-in-time-correct training data: joining facts
    on ``valid_from <= t < valid_to`` reproduces any past state with no
    leakage from future updates.

    One shuffle by key (the window partition); ``tiebreak_cols`` pins the
    version order under timestamp ties so the history is deterministic on
    any partitioning. Skewed keys follow the usual salting/AQE levers."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = W.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def snapshot_as_of(history: DataFrame, cut: Column) -> DataFrame:
    """Point-in-time slice of an SCD2 history: the one version per key
    whose ``[valid_from, valid_to)`` interval contains ``cut``. Pure
    filter — no shuffle; partition pruning applies if the history is
    stored partitioned on a ``valid_from`` bucket."""
    return history.filter(
        (F.col("valid_from") <= cut)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > cut))
    )
