"""Direct (Spark-free) tests of the stateful-fold closures behind
stateful_episode_counts / sprt_decision_state — incremental multi-batch
equivalence vs a sequential scan, and the ENFORCED cross-batch ordering
contract (out-of-order delivery must raise, not silently corrupt)."""

from __future__ import annotations

import pandas as pd
import pytest

from cicevse2024_tfm_datapipeline_spark.streaming.stream_ops import (
    make_episode_fold,
    make_sprt_fold,
)


class FakeState:
    def __init__(self):
        self._val = None

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, val):
        self._val = tuple(val)


def _drive(fold, batches, state=None):
    state = state or FakeState()
    out = None
    for batch in batches:
        out = list(fold((7,), iter([batch]), state))[-1]
    return out, state


def _episode_batch(rows):
    return pd.DataFrame(rows, columns=["ts", "eid", "y", "p"])


def _ref_episodes(y, p):
    total = detected = 0
    i, n = 0, len(y)
    while i < n:
        if y[i] == 1:
            total += 1
            j = i
            while j < n and y[j] == 1:
                j += 1
            if any(p[t] == 1 for t in range(i, j)):
                detected += 1
            i = j
        else:
            i += 1
    return total, detected


@pytest.mark.parametrize("split_at", [1, 3, 5, 7])
def test_episode_fold_multi_batch_matches_sequential(split_at):
    fold = make_episode_fold("g", "ts", "eid", "y", "p")
    y = [0, 1, 1, 0, 1, 0, 1, 1, 1]
    p = [0, 0, 1, 0, 0, 1, 0, 1, 0]
    rows = [(i, i, y[i], p[i]) for i in range(len(y))]
    batches = [_episode_batch(rows[:split_at]), _episode_batch(rows[split_at:])]
    out, _ = _drive(fold, batches)
    exp_total, exp_det = _ref_episodes(y, p)
    assert int(out["episodes_total"].iloc[0]) == exp_total
    assert int(out["episodes_detected"].iloc[0]) == exp_det


def test_episode_fold_rejects_out_of_order_batches():
    fold = make_episode_fold("g", "ts", "eid", "y", "p")
    state = FakeState()
    list(fold((7,), iter([_episode_batch([(10, 1, 1, 0), (11, 2, 1, 1)])]), state))
    with pytest.raises(ValueError, match="ordering contract"):
        list(fold((7,), iter([_episode_batch([(5, 3, 1, 0)])]), state))


def _sprt_batch(rows):
    return pd.DataFrame(rows, columns=["ts", "eid", "llr"])


@pytest.mark.parametrize("split_at", [1, 2, 4])
def test_sprt_fold_multi_batch_matches_sequential(split_at):
    upper, lower = 5, -5
    llrs = [2, 2, 2, -1, 3, 3]  # crosses +5 at index 2 (cum 6)
    rows = [(i, i, llrs[i]) for i in range(len(llrs))]
    fold = make_sprt_fold("g", "ts", "eid", "llr", upper, lower)
    out, _ = _drive(fold, [_sprt_batch(rows[:split_at]), _sprt_batch(rows[split_at:])])
    assert int(out["n_events"].iloc[0]) == len(llrs)
    assert int(out["decision_code"].iloc[0]) == 1
    assert int(out["n_to_decision"].iloc[0]) == 3  # 1-based first crossing
    assert int(out["llr_at"].iloc[0]) == 6


def test_sprt_fold_rejects_out_of_order_batches():
    fold = make_sprt_fold("g", "ts", "eid", "llr", 100, -100)
    state = FakeState()
    list(fold((7,), iter([_sprt_batch([(10, 1, 1), (12, 2, 1)])]), state))
    # equal ts but smaller tiebreak than the folded tail → also a violation
    with pytest.raises(ValueError, match="ordering contract"):
        list(fold((7,), iter([_sprt_batch([(12, 1, 1)])]), state))


def test_sprt_fold_decision_sticky_across_batches():
    fold = make_sprt_fold("g", "ts", "eid", "llr", 3, -3)
    out, _ = _drive(
        fold,
        [_sprt_batch([(0, 0, 4)]), _sprt_batch([(1, 1, -20), (2, 2, -20)])],
    )
    assert int(out["decision_code"].iloc[0]) == 1  # sticky accept-H1
    assert int(out["n_to_decision"].iloc[0]) == 1
    assert int(out["n_events"].iloc[0]) == 3
