"""Property-based differential for the lineage-free bounds scan: for ANY
small frame — integer or double keys, heavy or no ties, with or without
nulls, ascending or descending — ``global_cumsum(bucketing='bounds')``
must equal the pinned range-exchange path row for row. The example count
is capped (each example runs Spark jobs); the generator biases toward
the hard cases: duplicate-heavy key domains and null mixtures."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _keys = st.one_of(
        # heavy ties: tiny integer domain
        st.lists(st.integers(min_value=0, max_value=5), min_size=2, max_size=120),
        # continuous-ish doubles, occasional nulls
        st.lists(
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ),
            min_size=2,
            max_size=120,
        ),
    )

    @pytest.mark.usefixtures("spark")
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(keys=_keys, descending=st.booleans())
    def test_bounds_equals_pinned_on_random_frames(spark, keys, descending):
        from cicevse2024_tfm_datapipeline_spark.operators.scan import (
            global_cumsum,
        )

        rows = [(i, None if k is None else float(k), 1 + (i % 3)) for i, k in enumerate(keys)]
        df = spark.createDataFrame(rows, "id long, k double, v int")
        kw = dict(
            order_cols=["k", "id"],
            sum_cols=["v"],
            descending=descending,
            with_totals=True,
        )
        pinned = {
            r["id"]: (r["cum_v"], r["tot_v"])
            for r in global_cumsum(df, **kw).collect()
        }
        bounds = {
            r["id"]: (r["cum_v"], r["tot_v"])
            for r in global_cumsum(df, bucketing="bounds", **kw).collect()
        }
        assert pinned == bounds

    @pytest.mark.usefixtures("spark")
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        keys=_keys,
        descending=st.booleans(),
        grid=st.lists(
            st.one_of(
                st.none(),
                st.just(float("nan")),
                st.just(float("inf")),
                st.just(float("-inf")),
                st.floats(min_value=-2e6, max_value=2e6),
            ),
            max_size=12,
        ),
    )
    def test_fixed_bounds_equals_pinned_on_random_frames(
        spark, keys, descending, grid
    ):
        """Round-10 path: caller-literal DOMAIN grids (scan fixed_bounds,
        ridden by the a13/a11 window queries) must match the pinned scan
        for ANY grid — unsorted, duplicated, out of the data's range,
        polluted with NaN/inf/None — against ANY key frame. A grid can
        only move bucket BOUNDARIES, never results."""
        from cicevse2024_tfm_datapipeline_spark.operators.scan import (
            global_cumsum,
        )

        rows = [
            (i, None if k is None else float(k), 1 + (i % 3))
            for i, k in enumerate(keys)
        ]
        df = spark.createDataFrame(rows, "id long, k double, v int")
        kw = dict(
            order_cols=["k", "id"],
            sum_cols=["v"],
            descending=descending,
            with_totals=True,
        )
        pinned = {
            r["id"]: (r["cum_v"], r["tot_v"])
            for r in global_cumsum(df, **kw).collect()
        }
        fixed = {
            r["id"]: (r["cum_v"], r["tot_v"])
            for r in global_cumsum(
                df, bucketing="bounds", fixed_bounds=grid, **kw
            ).collect()
        }
        assert pinned == fixed
