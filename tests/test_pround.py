"""The portable-rounding layer is load-bearing for every oracle — test
the SQL rewriter and cross-engine agreement directly (no Spark needed
for the DuckDB half)."""

from __future__ import annotations

import math

import duckdb
import pytest

from cicevse2024_tfm_datapipeline_spark.plans.common import portable_round_sql


def py_pround(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


def test_rewrites_simple():
    out = portable_round_sql("SELECT round(avg(x), 4) AS a FROM t")
    assert "floor" in out and "round(" not in out.lower().replace("floor", "")
    assert "* 10000.0 + 0.5" in out


def test_rewrites_nested():
    out = portable_round_sql("round(round(sum(x), 2) / count(*), 6)")
    assert out.count("floor") == 2
    assert "100.0" in out and "1000000.0" in out


def test_rewrites_preserves_non_round_words():
    sql = "SELECT surround, round(x, 2) FROM t"
    out = portable_round_sql(sql)
    assert "surround" in out
    assert out.count("floor") == 1


def test_rewrites_commas_inside_nesting():
    out = portable_round_sql("round(coalesce(a, b), 3)")
    assert "coalesce(a, b)" in out and "1000.0" in out


@pytest.mark.parametrize(
    "x,n",
    [
        (38.378750000000004, 4),
        (307.03 / 8, 4),
        (2.675, 2),
        (0.0015, 3),
        (1.0000005, 6),
        (123.456789, 4),
        (-2.5, 0),
        (0.125, 2),
    ],
)
def test_duckdb_floor_form_matches_python(x, n):
    # bind the float as a parameter: a decimal LITERAL would be parsed as
    # DECIMAL first and re-rounded before the cast
    con = duckdb.connect()
    sql = portable_round_sql(f"SELECT round(CAST(? AS DOUBLE), {n}) AS v")
    got = con.execute(sql, [x]).fetchone()[0]
    assert got == py_pround(x, n), (x, n, got)


def test_spark_pround_matches_python(spark):
    from pyspark.sql import functions as F

    from cicevse2024_tfm_datapipeline_spark.plans.common import pround

    cases = [(38.378750000000004, 4), (307.03 / 8, 4), (2.675, 2), (0.0015, 3), (-2.5, 0)]
    cols = [pround(F.lit(x), n).alias(f"c{i}") for i, (x, n) in enumerate(cases)]
    row = spark.range(1).select(*cols).collect()[0]
    for i, (x, n) in enumerate(cases):
        assert row[f"c{i}"] == py_pround(x, n), (x, n, row[f"c{i}"])
