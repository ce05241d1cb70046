"""Property test: the portable floor-rounding form agrees between DuckDB
and Python IEEE arithmetic for arbitrary doubles — the invariant every
oracle comparison rests on."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from cicevse2024_tfm_datapipeline_spark.plans.common import portable_round_sql

_con = duckdb.connect()


def py_pround(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


@settings(max_examples=300, deadline=None)
@given(
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=6),
)
def test_pround_duckdb_matches_python(x, n):
    sql = portable_round_sql(f"SELECT round(CAST(? AS DOUBLE), {n}) AS v")
    got = _con.execute(sql, [x]).fetchone()[0]
    assert got == py_pround(x, n), (x, n, got)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-10**12, max_value=10**12),
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=0, max_value=6),
)
def test_pround_of_exact_ratios(num, den, n):
    """Rational inputs (the decimal-data mean shape sum/count)."""
    x = num / den
    sql = portable_round_sql(f"SELECT round(CAST(? AS DOUBLE) / CAST(? AS DOUBLE), {n}) AS v")
    got = _con.execute(sql, [float(num), float(den)]).fetchone()[0]
    assert got == py_pround(x, n), (num, den, n, got)
