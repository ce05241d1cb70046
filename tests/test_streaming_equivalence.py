"""Streaming ↔ batch equivalence: every row the Structured Streaming
twins emit must equal the batch computation of the same window spec
(SURVEY §2.9 extension; append mode emits only watermark-finalized
windows, so the stream output is a subset — each emitted row must match
the batch answer exactly).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.sources.readers import load_table
from cicevse2024_tfm_datapipeline_spark.streaming.stream_ops import (
    run_to_completion,
    session_window_stream,
    tumbling_avg_stream,
)

SF = "/root/testdata/sf0.001"


def _events_stream(spark):
    from cicevse2024_tfm_datapipeline_spark.plans.rows_only import _events_stream

    return _events_stream(spark, SF)


def test_stream_tumbling_rows_match_batch(spark):
    got = run_to_completion(
        tumbling_avg_stream(_events_stream(spark), window_sec=86400),
        "t_stream_tumbling_eq",
    ).collect()
    assert got, "stream emitted no finalized windows"

    batch = (
        load_table(spark, SF, "events")
        .groupBy(
            F.window("ts", "86400 seconds").alias("w"), F.col("event_type")
        )
        .agg(F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "avg_value",
            "n_rows",
        )
        .collect()
    )
    want = {
        (r["window_start"], r["event_type"]): (r["avg_value"], r["n_rows"])
        for r in batch
    }
    for r in got:
        key = (r["window_start"], r["event_type"])
        assert key in want, key
        assert r["n_rows"] == want[key][1], key
        assert abs(r["avg_value"] - want[key][0]) < 1e-9, key


def test_stream_sessions_rows_match_batch(spark):
    got = run_to_completion(
        session_window_stream(_events_stream(spark), gap="30 minutes"),
        "t_stream_sessions_eq",
    ).collect()
    assert got, "stream emitted no finalized sessions"

    batch = (
        load_table(spark, SF, "events")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
        .collect()
    )
    want = {
        (r["session_start"], r["session_end"], r["user_id"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in batch
    }
    for r in got:
        key = (r["session_start"], r["session_end"], r["user_id"])
        assert key in want, key
        assert r["n_events"] == want[key][0], key
        assert abs(r["sum_value"] - want[key][1]) < 1e-9, key
