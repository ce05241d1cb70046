"""Unit tests for W1 chronological split arithmetic (SURVEY §7.4 risk 1).

The split-size arithmetic must reproduce the reference's
``int(frac*n)`` truncation + small-group guard exactly
(/root/reference/func_aux/func_preproc.py:168-181).
"""

from __future__ import annotations

import datetime

import pytest


def ref_sizes(n: int, train_frac: float = 0.7, val_frac: float = 0.15) -> tuple[int, int, int]:
    """Reference split arithmetic, re-derived from its documented behavior."""
    n_train = int(train_frac * n)
    n_val = int(val_frac * n)
    if n_train + n_val >= n:
        n_train = max(1, n_train)
        n_val = max(0, min(n - n_train - 1, n_val))
    return n_train, n_val, n - n_train - n_val


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6, 7, 10, 13, 20, 99, 100, 101])
@pytest.mark.parametrize("fracs", [(0.7, 0.15), (0.8, 0.2), (0.5, 0.5)])
def test_split_sizes_match_reference(spark, n, fracs):
    tf, vf = fracs
    from cicevse2024_tfm_datapipeline_spark.operators.split import chrono_split

    base = datetime.datetime(2024, 1, 1)
    rows = [("g", "s", base + datetime.timedelta(seconds=i), i) for i in range(n)]
    df = spark.createDataFrame(rows, ["attack", "state", "ts", "event_id"])
    out = chrono_split(df, ["attack", "state"], "ts", "event_id", tf, vf)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    exp_tr, exp_va, exp_te = ref_sizes(n, tf, vf)
    assert counts.get("train", 0) == exp_tr, (n, fracs, counts)
    assert counts.get("val", 0) == exp_va, (n, fracs, counts)
    assert counts.get("test", 0) == exp_te, (n, fracs, counts)


def test_split_is_chronological(spark):
    from pyspark.sql import functions as F

    from cicevse2024_tfm_datapipeline_spark.operators.split import chrono_split

    base = datetime.datetime(2024, 1, 1)
    rows = [("g", "s", base + datetime.timedelta(seconds=i), i) for i in range(20)]
    df = spark.createDataFrame(rows, ["attack", "state", "ts", "event_id"])
    out = chrono_split(df, ["attack", "state"], "ts", "event_id").collect()
    by_split = {}
    for r in out:
        by_split.setdefault(r["split"], []).append(r["event_id"])
    assert max(by_split["train"]) < min(by_split["val"]) < min(by_split["test"])
