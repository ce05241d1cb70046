"""Z-order layout: bit-exact Morton values + measured file skipping."""

import os

from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.sources.layout import (
    files_overlapping_box,
    parquet_file_ranges,
    with_zvalue,
    write_zordered,
    zvalue_expr,
)
from cicevse2024_tfm_datapipeline_spark.sources.readers import load_table


def _py_morton(vals, bits):
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_zvalue_expr_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (37, 201)]
    df = spark.createDataFrame(rows, ["a", "b"]).withColumn(
        "z", zvalue_expr([F.col("a"), F.col("b")], 8)
    )
    for r in df.collect():
        assert r["z"] == _py_morton([r["a"], r["b"]], 8), (r["a"], r["b"])


def test_zvalue_rejects_overflow(spark):
    import pytest

    with pytest.raises(ValueError):
        zvalue_expr([F.col("a")] * 8, 8)


def test_with_zvalue_deterministic_and_bounded(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value"
    )
    z1 = with_zvalue(ev, ["user_id", "value"], bits=8)
    lo, hi = z1.agg(F.min("__z"), F.max("__z")).first()
    assert 0 <= lo and hi < (1 << 16)
    z2 = with_zvalue(ev, ["user_id", "value"], bits=8)
    a = sorted((r["event_id"], r["__z"]) for r in z1.collect())
    b = sorted((r["event_id"], r["__z"]) for r in z2.collect())
    assert a == b


def test_zorder_layout_skips_more_files_than_single_column_sort(spark, tmp_path):
    """The point of the layout: for box predicates over BOTH interleaved
    columns, footer min/max pruning must read fewer files from the
    z-ordered layout than from a single-column (user_id) sort, summed
    over a grid of boxes covering the space."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value"
    )
    zpath, upath = str(tmp_path / "zord"), str(tmp_path / "usort")
    write_zordered(ev, ["user_id", "value"], zpath, bits=8, n_files=16)
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(upath)
    )

    zr = parquet_file_ranges(zpath, ["user_id", "value"])
    ur = parquet_file_ranges(upath, ["user_id", "value"])
    assert len(zr) > 1 and len(ur) > 1

    ulo, uhi, vlo, vhi = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    z_total = u_total = 0
    G = 4
    for i in range(G):
        for j in range(G):
            box = {
                "user_id": (
                    ulo + (uhi - ulo) * i // G,
                    ulo + (uhi - ulo) * (i + 1) // G,
                ),
                "value": (
                    vlo + (vhi - vlo) * j / G,
                    vlo + (vhi - vlo) * (j + 1) / G,
                ),
            }
            z_total += files_overlapping_box(zr, box)
            u_total += files_overlapping_box(ur, box)
    # single-column sort cannot skip on `value`; the z-layout must
    # strictly beat it across the grid
    assert z_total < u_total, (z_total, u_total)


def test_zordered_roundtrip_preserves_rows(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "zrt")
    write_zordered(ev, ["user_id", "value"], path, bits=8, n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)
    assert back.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, tmp_path):
    """Dynamic partition pruning: when a Hive-partitioned fact joins a
    FILTERED dimension on the partition column, Catalyst must inject a
    runtime pruning subquery (dynamicpruning expression) so only the
    dimension-selected partitions are scanned — the join-driven
    complement of the static pruning asserted in the partitioned-lake
    roundtrip. At 100 TB this is the difference between scanning 2 and
    2000 date partitions of a fact table."""
    path = str(tmp_path / "dpp_fact")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.select("event_id", "user_id", "value", "event_type").write.mode(
        "overwrite"
    ).partitionBy("event_type").parquet(path)
    fact = spark.read.parquet(path)
    # the dim must be a real relation (a literal local relation would be
    # constant-folded into a STATIC partition filter — correct but not
    # the runtime path under test)
    dim_path = str(tmp_path / "dpp_dim")
    (
        spark.range(1)
        .select(F.lit("click").alias("etype"), F.lit(1).alias("flag"))
        .union(spark.range(1).select(F.lit("view"), F.lit(2)))
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    dim = spark.read.parquet(dim_path)
    joined = fact.join(
        dim.filter(F.col("flag") == 1), fact.event_type == F.col("etype")
    )
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    physical = joined._jdf.queryExecution().executedPlan().toString()
    assert (
        "dynamicpruning" in plan.lower() or "dynamicpruning" in physical.lower()
    ), "no dynamic partition pruning subquery in the plan"
    # and the result must still be correct: only click rows survive
    got = joined.agg(F.count(F.lit(1))).collect()[0][0]
    want = ev.filter(F.col("event_type") == "click").count()
    assert got == want
