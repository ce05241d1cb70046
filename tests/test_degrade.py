"""R1-R5: seeded degradations — reference semantics
(/root/reference/func_aux/func_test.py:548-574) + the distributed-
determinism property the reference never needed (partition independence)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def make_windows(spark, n=6, T=5, F_=3):
    rows = []
    for w in range(n):
        mat = [[float(w * 100 + t * 10 + f) for f in range(F_)] for t in range(T)]
        rows.append((w, mat))
    return spark.createDataFrame(rows, "window_id long, matrix array<array<double>>")


@pytest.mark.parametrize("kind", ["packet_loss", "missing_variables", "clock_offset", "drift"])
def test_degrade_deterministic_under_repartition(spark, kind):
    from cicevse2024_tfm_datapipeline_spark.operators.degrade import degrade_windows

    df = make_windows(spark)
    a = degrade_windows(df, "matrix", "window_id", 0.5, kind, seed=123)
    b = degrade_windows(df.repartition(5), "matrix", "window_id", 0.5, kind, seed=123)
    pa = {r["window_id"]: r["matrix"] for r in a.collect()}
    pb = {r["window_id"]: r["matrix"] for r in b.collect()}
    assert pa == pb


def test_packet_loss_zeroes_whole_timesteps(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.degrade import degrade_windows

    df = make_windows(spark, n=4, T=8, F_=3)
    out = degrade_windows(df, "matrix", "window_id", 0.6, "packet_loss", seed=1).collect()
    changed = False
    for r in out:
        m = np.array(r["matrix"]) + 1.0  # originals have no -1 values
        for t in range(m.shape[0]):
            row = m[t] - 1.0
            assert (row == 0).all() or (row != 0).all() or t == 0  # whole-row zeroing
            changed |= (row == 0).all()
    assert changed


def test_missing_variables_zeroes_whole_features(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.degrade import degrade_windows

    df = make_windows(spark, n=4, T=5, F_=4)
    out = degrade_windows(df, "matrix", "window_id", 0.5, "missing_variables", seed=2).collect()
    for r in out:
        m = np.array(r["matrix"])
        zero_cols = (m == 0).all(axis=0)
        partial = ((m == 0).any(axis=0)) & ~zero_cols
        assert not partial.any()  # a feature is zeroed everywhere or nowhere


def test_clock_offset_is_circular_roll(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.degrade import degrade_windows

    df = make_windows(spark, n=3, T=6, F_=2)
    orig = {r["window_id"]: np.array(r["matrix"]) for r in df.collect()}
    out = degrade_windows(df, "matrix", "window_id", 0.5, "clock_offset", seed=3).collect()
    for r in out:
        m = np.array(r["matrix"])
        o = orig[r["window_id"]]
        assert any((np.roll(o, s, axis=0) == m).all() for s in range(-3, 4))


def test_severity_zero_is_identity(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.degrade import degrade_windows

    df = make_windows(spark)
    out = degrade_windows(df, "matrix", "window_id", 0.0, "drift", seed=9)
    assert {r["window_id"]: r["matrix"] for r in out.collect()} == {
        r["window_id"]: r["matrix"] for r in df.collect()
    }


def test_r5_permutation_preserves_multiset(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.degrade import permute_feature_globally

    df = spark.createDataFrame([(i, float(i * 7 % 13)) for i in range(50)], ["rid", "v"])
    out = permute_feature_globally(df, "v", seed=5, order_tiebreak="rid")
    vals_in = sorted(r["v"] for r in df.collect())
    vals_out = sorted(r["v"] for r in out.collect())
    assert vals_in == vals_out
    assert out.count() == 50
    # deterministic given the seed
    again = permute_feature_globally(df, "v", seed=5, order_tiebreak="rid")
    assert {r["rid"]: r["v"] for r in out.collect()} == {
        r["rid"]: r["v"] for r in again.collect()
    }


@pytest.mark.parametrize("kind", ["packet_loss", "missing_variables", "clock_offset", "drift"])
def test_hash_degrade_deterministic_under_repartition(spark, kind):
    from cicevse2024_tfm_datapipeline_spark.operators.degrade import degrade_windows_hash

    df = make_windows(spark)
    a = degrade_windows_hash(df, "matrix", "window_id", 0.5, kind, seed=123)
    b = degrade_windows_hash(df.repartition(5), "matrix", "window_id", 0.5, kind, seed=123)
    pa = {r["window_id"]: r["matrix"] for r in a.collect()}
    pb = {r["window_id"]: r["matrix"] for r in b.collect()}
    assert pa == pb


def test_hash_clock_offset_is_circular_roll(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.degrade import degrade_windows_hash

    df = make_windows(spark, n=8, T=5, F_=3)
    orig = {r["window_id"]: r["matrix"] for r in df.collect()}
    out = degrade_windows_hash(df, "matrix", "window_id", 0.5, "clock_offset", seed=9)
    got = {r["window_id"]: r["matrix"] for r in out.collect()}
    for wid, mat in got.items():
        x, y = np.array(orig[wid]), np.array(mat)
        rolls = [s for s in range(-2, 3) if np.array_equal(np.roll(x, s, axis=0), y)]
        assert rolls, wid  # result must be SOME roll within ±int(0.5·T)


def test_hash_drift_adds_linear_ramps(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.degrade import degrade_windows_hash

    T, F_ = 5, 3
    df = make_windows(spark, n=4, T=T, F_=F_)
    orig = {r["window_id"]: r["matrix"] for r in df.collect()}
    out = degrade_windows_hash(df, "matrix", "window_id", 0.4, "drift", seed=9)
    for r in out.collect():
        diff = np.array(r["matrix"]) - np.array(orig[r["window_id"]])
        # row 0 untouched; row t = t/(T-1) · coef — proportional ramps
        assert np.allclose(diff[0], 0.0)
        coef = diff[T - 1]
        for t_ in range(T):
            assert np.allclose(diff[t_], coef * t_ / (T - 1), atol=1e-12), t_
