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


def test_episode_fold_buffers_out_of_order_chunks_within_batch():
    """r05 advisory: a batch split across Arrow chunks in non-sorted
    chunk order must fold correctly (full-batch buffer + sort), not raise
    — only CROSS-batch regressions violate the contract."""
    fold = make_episode_fold("g", "ts", "eid", "y", "p")
    y = [0, 1, 1, 0, 1, 0]
    p = [0, 0, 1, 0, 1, 0]
    rows = [(i, i, y[i], p[i]) for i in range(len(y))]
    # later-sorting chunk delivered FIRST within the same micro-batch
    chunks = [_episode_batch(rows[3:]), _episode_batch(rows[:3])]
    state = FakeState()
    out = list(fold((7,), iter(chunks), state))[-1]
    exp_total, exp_det = _ref_episodes(y, p)
    assert int(out["episodes_total"].iloc[0]) == exp_total
    assert int(out["episodes_detected"].iloc[0]) == exp_det
    # and a subsequent regressing batch still raises
    with pytest.raises(ValueError, match="ordering contract"):
        list(fold((7,), iter([_episode_batch([(0, 99, 1, 0)])]), state))


def test_sprt_fold_buffers_out_of_order_chunks_within_batch():
    fold = make_sprt_fold("g", "ts", "eid", "llr", 5, -5)
    llrs = [2, 2, 2, -1, 3, 3]
    rows = [(i, i, llrs[i]) for i in range(len(llrs))]
    chunks = [_sprt_batch(rows[2:]), _sprt_batch(rows[:2])]
    out, _ = _drive_chunks(fold, chunks)
    assert int(out["decision_code"].iloc[0]) == 1
    assert int(out["n_to_decision"].iloc[0]) == 3
    assert int(out["llr_at"].iloc[0]) == 6


def _drive_chunks(fold, chunks, state=None):
    state = state or FakeState()
    out = list(fold((7,), iter(chunks), state))[-1]
    return out, state


def test_order_key_tz_aware_and_nulls():
    """r05 advisory: tz-aware timestamps must normalize (not TypeError);
    null order keys must raise a clear contract error."""
    from cicevse2024_tfm_datapipeline_spark.streaming.stream_ops import (
        _order_key_i64,
    )

    tz = pd.Series(pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 01:00:00"])).dt.tz_localize(
        "US/Eastern"
    )
    keys = _order_key_i64(tz)
    assert keys[1] - keys[0] == 3_600_000_000  # one hour in microseconds
    naive = tz.dt.tz_convert("UTC").dt.tz_localize(None)
    assert (_order_key_i64(naive) == keys).all()
    with pytest.raises(ValueError, match="contains nulls"):
        _order_key_i64(pd.Series([1.0, None], name="ts"))


def test_null_tiebreak_raises_clear_contract_error():
    """r06 advisory: a null TIEBREAK must get the same clear contract
    error as a null ts (it previously died inside a bare int64 cast)."""
    fold = make_sprt_fold("g", "ts", "eid", "llr", 100, -100)
    batch = pd.DataFrame(
        {"ts": [1, 2], "eid": [1.0, None], "llr": [1, 1]}
    )
    with pytest.raises(ValueError, match="'eid' contains nulls"):
        list(fold((7,), iter([batch]), FakeState()))
    fold2 = make_episode_fold("g", "ts", "eid", "y", "p")
    batch2 = pd.DataFrame(
        {"ts": [1, 2], "eid": [1.0, None], "y": [1, 0], "p": [0, 0]}
    )
    with pytest.raises(ValueError, match="'eid' contains nulls"):
        list(fold2((7,), iter([batch2]), FakeState()))


def test_sprt_fold_decision_sticky_across_batches():
    fold = make_sprt_fold("g", "ts", "eid", "llr", 3, -3)
    out, _ = _drive(
        fold,
        [_sprt_batch([(0, 0, 4)]), _sprt_batch([(1, 1, -20), (2, 2, -20)])],
    )
    assert int(out["decision_code"].iloc[0]) == 1  # sticky accept-H1
    assert int(out["n_to_decision"].iloc[0]) == 1
    assert int(out["n_events"].iloc[0]) == 3


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    def _chunked(batch, n_chunks, reverse):
        """Split a micro-batch frame into n Arrow-like chunks, optionally
        in reversed chunk order — the fold must buffer+sort the whole
        batch, so chunking/ordering within a batch cannot matter."""
        if n_chunks <= 1 or len(batch) < 2:
            return [batch]
        k = max(1, len(batch) // n_chunks)
        chunks = [batch.iloc[i : i + k] for i in range(0, len(batch), k)]
        return list(reversed(chunks)) if reverse else chunks

    def _drive_chunked(fold, batches, n_chunks, reverse):
        state = FakeState()
        out = None
        for batch in batches:
            out = list(fold((7,), iter(_chunked(batch, n_chunks, reverse)), state))[-1]
        return out, state

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.lists(
            st.tuples(st.integers(0, 1), st.integers(0, 1), st.sampled_from("ab")),
            min_size=1,
            max_size=40,
        ),
        cuts=st.lists(st.integers(1, 39), max_size=4),
        n_chunks=st.integers(1, 3),
        reverse=st.booleans(),
    )
    def test_episode_fold_split_invariant(data, cuts, n_chunks, reverse):
        """ANY partition of the event sequence into ordered micro-batches
        — each batch delivered as ANY chunking in ANY chunk order — must
        produce the same final (total, detected) as one batch AND as
        the sequential reference scan."""
        rows = [(i, i, y, p) for i, (y, p, _) in enumerate(data)]
        bounds = sorted({c for c in cuts if c < len(rows)})
        batches, prev = [], 0
        for b in bounds + [len(rows)]:
            if b > prev:
                batches.append(
                    pd.DataFrame(rows[prev:b], columns=["ts", "eid", "y", "p"])
                )
                prev = b
        fold = make_episode_fold("g", "ts", "eid", "y", "p")
        out, _ = _drive_chunked(fold, batches, n_chunks, reverse)
        y = [r[2] for r in rows]
        p = [r[3] for r in rows]
        exp_total, exp_det = _ref_episodes(y, p)
        assert int(out["episodes_total"].iloc[0]) == exp_total
        assert int(out["episodes_detected"].iloc[0]) == exp_det

    @settings(max_examples=60, deadline=None)
    @given(
        llrs=st.lists(st.integers(-4, 4), min_size=1, max_size=40),
        cuts=st.lists(st.integers(1, 39), max_size=4),
        bound=st.integers(3, 9),
        n_chunks=st.integers(1, 3),
        reverse=st.booleans(),
    )
    def test_sprt_fold_split_invariant(llrs, cuts, bound, n_chunks, reverse):
        """SPRT first-crossing statistics must be invariant to micro-batch
        boundaries AND to within-batch chunking/chunk order: any ordered
        split equals the sequential fold."""
        rows = [(i, i, v) for i, v in enumerate(llrs)]
        bounds = sorted({c for c in cuts if c < len(rows)})
        batches, prev = [], 0
        for b in bounds + [len(rows)]:
            if b > prev:
                batches.append(pd.DataFrame(rows[prev:b], columns=["ts", "eid", "llr"]))
                prev = b
        fold = make_sprt_fold("g", "ts", "eid", "llr", bound, -bound)
        out, _ = _drive_chunked(fold, batches, n_chunks, reverse)
        # sequential reference
        cum, dec, n_to, llr_at = 0, 0, 0, 0
        for i, v in enumerate(llrs):
            cum += v
            if dec == 0 and (cum >= bound or cum <= -bound):
                dec = 1 if cum >= bound else -1
                n_to, llr_at = i + 1, cum
        assert int(out["n_events"].iloc[0]) == len(llrs)
        assert int(out["decision_code"].iloc[0]) == dec
        assert int(out["n_to_decision"].iloc[0]) == n_to
        assert int(out["llr_at"].iloc[0]) == llr_at
