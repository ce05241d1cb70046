"""Structured Streaming re-expressions of the engine's time-series
operators (SURVEY §2.9 — an extension beyond reference parity; the
reference is strictly batch).

Mapping:
  A16 binned time average  → tumbling ``window(ts, N seconds)`` + agg
  W3  sliding windows      → sliding ``window(ts, length, hop)`` + agg
  W6  sessionization       → ``session_window(ts, gap)`` counts
All with watermarks for late data; append-mode compatible.

These operate on event-time (the reference's row-index time becomes real
timestamps upstream). For custom stateful logic beyond these,
``applyInPandasWithState`` is the escape hatch — see ``stateful_ttd``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_events_stream(spark, sf_dir: str, schema=None) -> DataFrame:
    """File-source stream over the synthetic events parquet — used by the
    smoke tests (one-file micro-batch; production: Kafka/EventHub)."""
    if schema is None:
        # infer once from the batch reader (driver-side, footer only)
        from cicevse2024_tfm_datapipeline_spark.sources.readers import load_table

        schema = load_table(spark, sf_dir, "events").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{sf_dir}")
    )


def tumbling_avg_stream(events: DataFrame, window_sec: int = 86400, watermark: str = "1 day") -> DataFrame:
    """A16 streaming twin: tumbling event-time window average."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{window_sec} seconds"), F.col("event_type"))
        .agg(F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "avg_value",
            "n_rows",
        )
    )


def sliding_window_stream(
    events: DataFrame, length_sec: int, hop_sec: int, watermark: str = "1 day"
) -> DataFrame:
    """W3 streaming twin: sliding event-time windows (length, hop) with
    per-window summary features — the streaming equivalent of the batch
    trailing-frame featurization."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{length_sec} seconds", f"{hop_sec} seconds"))
        .agg(
            F.avg("value").alias("value_mean"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(F.col("window.start").alias("window_start"), "value_mean", "value_min", "value_max", "n_rows")
    )


def tumbling_sums_stream(events: DataFrame, window_sec: int = 86400, watermark: str = "1 day") -> DataFrame:
    """A16 streaming twin in ORACLE-CANONICAL form: window start as epoch
    seconds (no timestamp-formatting parity risk) and sum+count instead of
    avg (the caller derives the canonicalized decimal mean — see
    plans.common.pround). Drive with complete output mode for a full,
    batch-equal result set."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{window_sec} seconds"), F.col("event_type"))
        .agg(F.sum("value").alias("sum_value"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.col("window.start").cast("long").alias("window_start_epoch"),
            "event_type",
            "sum_value",
            "n_rows",
        )
    )


def sliding_sums_stream(
    events: DataFrame, length_sec: int, hop_sec: int, watermark: str = "1 day"
) -> DataFrame:
    """W3 streaming twin in oracle-canonical form (epoch-second window
    starts, sums not means)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{length_sec} seconds", f"{hop_sec} seconds"))
        .agg(
            F.sum("value").alias("sum_value"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.col("window.start").cast("long").alias("window_start_epoch"),
            "sum_value",
            "value_min",
            "value_max",
            "n_rows",
        )
    )


def session_window_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 day") -> DataFrame:
    """W6 streaming twin: session windows per user with inactivity gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def run_to_completion(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming plan over the available files and return the
    result as a batch DataFrame (memory sink; test/smoke harness).

    ``append`` emits only watermark-finalized windows (production shape);
    ``complete`` emits the full aggregate state — use it when comparing
    the stream against a batch/SQL oracle over the whole input."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
