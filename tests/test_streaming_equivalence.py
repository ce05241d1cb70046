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


def test_stateful_episode_counts_multi_batch(spark, tmp_path):
    """applyInPandasWithState must carry episode state ACROSS micro-batches:
    split a small ordered dataset into 3 files (maxFilesPerTrigger=1 → 3
    batches) with episodes spanning the file boundaries, and require the
    final per-group totals to equal a sequential scan."""
    import pyspark.sql.types as T

    from cicevse2024_tfm_datapipeline_spark.streaming.stream_ops import (
        run_to_completion,
        stateful_episode_counts,
    )

    # g=1: one episode spanning files 1-2 (detected in file 2); a second
    # episode in file 3 (undetected). g=2: episode starts at file-1 end,
    # continues through file 2 (detected at its first row), benign tail.
    rows = [
        # (g, ts, id, y, p)
        (1, 1, 1, 1, 0), (1, 2, 2, 1, 0), (2, 1, 3, 0, 0), (2, 2, 4, 1, 0),
        (1, 3, 5, 1, 1), (1, 4, 6, 0, 0), (2, 3, 7, 1, 1), (2, 4, 8, 1, 0),
        (1, 5, 9, 1, 0), (1, 6, 10, 0, 0), (2, 5, 11, 0, 0), (2, 6, 12, 0, 1),
    ]
    chunks = [rows[0:4], rows[4:8], rows[8:12]]
    schema = "g long, ts long, event_id long, y int, p int"
    src = tmp_path / "stream_src"
    src.mkdir()
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(src / f"part{i}")
        )
    stream = (
        spark.readStream.schema(
            T.StructType(
                [
                    T.StructField("g", T.LongType()),
                    T.StructField("ts", T.LongType()),
                    T.StructField("event_id", T.LongType()),
                    T.StructField("y", T.IntegerType()),
                    T.StructField("p", T.IntegerType()),
                ]
            )
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    counts = stateful_episode_counts(stream, "g", "ts", "event_id", "y", "p")
    out = run_to_completion(counts, "t_stateful_multi", output_mode="update")
    final = {
        r["g"]: (r["episodes_total"], r["episodes_detected"])
        for r in out.groupBy("g")
        .agg(
            F.max("episodes_total").alias("episodes_total"),
            F.max("episodes_detected").alias("episodes_detected"),
        )
        .collect()
    }
    # sequential reference per group
    want = {}
    for g in (1, 2):
        seq = sorted((r for r in rows if r[0] == g), key=lambda r: (r[1], r[2]))
        total = detected = 0
        prev_y, cur_det = 0, 0
        for _, _, _, y, p in seq:
            if y == 1 and prev_y != 1:
                total += 1
                cur_det = 0
            if y == 1 and p == 1 and cur_det == 0:
                detected += 1
                cur_det = 1
            prev_y = y
        want[g] = (total, detected)
    assert final == want, (final, want)


def test_stream_dedup_union_recovers_single_copy(spark):
    from cicevse2024_tfm_datapipeline_spark.streaming.stream_ops import dedup_stream

    doubled = _events_stream(spark).union(_events_stream(spark))
    dd = dedup_stream(doubled, ["event_id"], watermark="1 day")
    got = run_to_completion(
        dd.select("event_id"), "t_stream_dedup_eq", "append"
    ).collect()
    batch = load_table(spark, SF, "events")
    n = batch.count()
    assert len(got) == n  # each event exactly once despite arriving twice
    assert len({r["event_id"] for r in got}) == n


def test_stream_static_join_matches_batch(spark):
    from cicevse2024_tfm_datapipeline_spark.streaming.stream_ops import (
        enrich_stream_with_dim,
    )

    dim = spark.createDataFrame(
        [("view", "b"), ("click", "b"), ("error", "a"), ("purchase", "a"), ("signup", "a")],
        schema="event_type string, category string",
    )
    joined = enrich_stream_with_dim(_events_stream(spark), dim, "event_type")
    agg = joined.groupBy("category").agg(F.count(F.lit(1)).alias("n"))
    got = {
        r["category"]: r["n"]
        for r in run_to_completion(agg, "t_stream_sj_eq", "complete").collect()
    }
    batch = load_table(spark, SF, "events").join(F.broadcast(dim), "event_type")
    want = {
        r["category"]: r["n"]
        for r in batch.groupBy("category").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_upsert_scd1_sink_multi_batch_merge(spark, tmp_path):
    """The merge must actually process multiple micro-batches and end at
    exactly the global latest-per-key regardless of batch boundaries."""
    import os

    from cicevse2024_tfm_datapipeline_spark.streaming.stream_ops import (
        upsert_scd1_sink,
    )

    src, lake, chk = (str(tmp_path / d) for d in ("src", "lake", "chk"))
    rows = [
        # (event_id, ts_us, user_id, value) — user 1 updated across files
        (1, 100, 1, 10.0),
        (2, 200, 1, 20.0),
        (3, 150, 2, 30.0),
        (4, 300, 1, 40.0),
        (5, 50, 3, 50.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts_us long, user_id long, value double")
    df.repartition(3).write.parquet(src)

    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = upsert_scd1_sink(stream, lake, chk, ["user_id"], ["ts_us", "event_id"])
    q.processAllAvailable()
    q.stop()

    n_batches = len(
        [f for f in os.listdir(os.path.join(chk, "offsets")) if not f.startswith(".")]
    )
    assert n_batches >= 2, n_batches

    got = {
        r["user_id"]: (r["event_id"], r["value"])
        for r in spark.read.parquet(lake).collect()
    }
    assert got == {1: (4, 40.0), 2: (3, 30.0), 3: (5, 50.0)}


def test_transform_with_state_matches_batch(spark):
    sf_dir = SF
    """Spark-4 transformWithStateInPandas per-user stats must equal the
    batch lag-window answer. Skips where the streaming state server's
    protobuf dependency is absent (this container)."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf not available: transformWithState "
                    "worker cannot start in this container")
    from pyspark.sql import functions as F

    from cicevse2024_tfm_datapipeline_spark.plans.rows_only import _events_stream
    from cicevse2024_tfm_datapipeline_spark.sources.readers import load_table
    from cicevse2024_tfm_datapipeline_spark.streaming.stream_ops import (
        run_to_completion,
        user_stats_transform_with_state,
    )

    stream = _events_stream(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.floor("value").cast("long").alias("fv"),
    )
    out = run_to_completion(
        user_stats_transform_with_state(stream), "tws_test", output_mode="update"
    )
    got = {
        r["user_id"]: (r["n_events"], r["sum_floor"], r["max_gap_us"])
        for r in out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_floor").alias("sum_floor"),
            F.max("max_gap_us").alias("max_gap_us"),
        )
        .collect()
    }
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    want = {
        r["user_id"]: (r["n"], r["s"], r["g"])
        for r in ev.select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            F.floor("value").cast("long").alias("fv"),
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("fv").alias("s"),
            F.coalesce(F.max("gap"), F.lit(-1)).alias("g"),
        )
        .collect()
    }
    assert got == want


def test_checkpoint_restart_resumes_exactly_once(spark, tmp_path):
    """Exactly-once resume across a query RESTART: run a grouped count
    stream over batch-1 files with a durable checkpoint, stop it, land
    batch-2 files, start a NEW query from the same checkpoint, and
    require the final complete-mode state to equal the batch aggregate
    over BOTH batches — no lost and no double-counted rows. This is the
    recovery contract every production stream relies on."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("etype", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    batch1 = [(i, ["a", "b"][i % 2], i) for i in range(100)]
    batch2 = [(i, ["a", "b", "c"][i % 3], i * 2) for i in range(100, 250)]

    def land(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        agg = stream.groupBy("etype").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("restart_test")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    land(batch1, "b1")
    run_once()
    land(batch2, "b2")
    run_once()

    got = {
        r["etype"]: (r["n"], r["sv"])
        for r in spark.sql("SELECT * FROM restart_test").collect()
    }
    want_rows = batch1 + batch2
    want = {}
    for _, e, v in want_rows:
        n, sv = want.get(e, (0, 0))
        want[e] = (n + 1, sv + v)
    assert got == want


def test_stream_sprt_matches_batch(spark):
    from cicevse2024_tfm_datapipeline_spark.plans import load_all

    qs = load_all()
    got = {
        r["user_id"]: r
        for r in qs["stream_sprt_decisions"].spark(spark, SF).collect()
    }
    want = {
        r["user_id"]: r
        for r in qs["a_sprt_boundary_crossing"].spark(spark, SF).collect()
    }
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g["n_events"] == w["n_events"]
        assert g["decision"] == w["decision"]
        assert g["n_to_decision"] == w["n_to_decision"]
        assert g["llr_ticks_at_decision"] == w["llr_ticks_at_decision"]
