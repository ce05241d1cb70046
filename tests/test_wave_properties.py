"""Property tests for the wave 4-8 kernel math, independent of Spark:
the candidate filters' losslessness, the integer CUSUM identity, the
interval-union island rule, the weighted-median threshold, and the
quantile-normalization rank mapping. Each mirrors the EXACT integer/
float formulas the queries and their oracles share."""

from __future__ import annotations

import math
from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

# --- prefix-filter losslessness ------------------------------------------

_WORDS = ["a", "b", "c", "d", "e", "f", "g", "h"]


def _shingles(tokens, k=3):
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=14),
        min_size=2,
        max_size=8,
    )
)
def test_prefix_length_positional_filters_are_lossless(docs):
    sets = {i: _shingles(toks) for i, toks in enumerate(docs)}
    # global df, rare-first prefix per doc (df asc, shingle asc) — the
    # query's exact ordering and prefix-length formula
    df = {}
    for s in sets.values():
        for sh in s:
            df[sh] = df.get(sh, 0) + 1
    pref = {}
    pos = {}
    for i, s in enumerate(sets.values()):
        ordered = sorted(s, key=lambda sh: (df[sh], sh))
        n = len(ordered)
        p = int(n - math.floor((n + 1) / 2.0) + 1) if n else 0
        pref[i] = set(ordered[:p])
        pos[i] = {sh: j + 1 for j, sh in enumerate(ordered)}
    for a, b in combinations(range(len(docs)), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        un = len(sa | sb)
        if not (2 * inter >= un):  # J < 0.5: filters owe nothing
            continue
        na, nb = len(sa), len(sb)
        shared_pref = pref[a] & pref[b]
        assert shared_pref, (docs[a], docs[b])  # prefix filter lossless
        assert 2 * min(na, nb) >= max(na, nb)  # length filter lossless
        # positional filter: SOME shared prefix shingle must pass
        ok = any(
            1 + min(na - pos[a][sh], nb - pos[b][sh])
            >= math.floor((na + nb + 2) / 3.0)
            for sh in shared_pref
        )
        assert ok, (docs[a], docs[b])


# --- integer CUSUM identity ----------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=60))
def test_cusum_integer_identity(xs):
    n = len(xs)
    total = sum(xs)
    prefix = 0
    mean = total / n
    run = 0.0
    for i, x in enumerate(xs, start=1):
        prefix += x
        d = n * prefix - i * total  # the query's exact integer statistic
        run += x - mean
        assert abs(d / n - run) < 1e-6 * max(1.0, abs(run))


# --- interval-union islands ----------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=60),
)
def test_interval_islands_match_bruteforce_union(starts, length):
    ivs = sorted((s, s + length) for s in starts)
    # query rule: new island iff start > running max of PRIOR ends
    covered = 0
    islands = 0
    cur_s = cur_e = None
    run_max_e = None
    for s, e in ivs:
        if run_max_e is None or s > run_max_e:
            if cur_s is not None:
                covered += cur_e - cur_s
            islands += 1
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
        run_max_e = e if run_max_e is None else max(run_max_e, e)
    covered += cur_e - cur_s
    # brute force: union of integer points
    pts = set()
    for s, e in ivs:
        pts.update(range(s, e))
    assert covered == len(pts)
    # islands = number of maximal contiguous runs
    runs = 0
    prev = None
    for p in sorted(pts):
        if prev is None or p > prev + 1:
            runs += 1
        prev = p
    assert islands == runs


# --- weighted median threshold -------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**6),  # value (cents)
            st.integers(min_value=1, max_value=100),  # weight
        ),
        min_size=1,
        max_size=50,
    )
)
def test_weighted_median_threshold_rule(pairs):
    pairs = sorted(pairs)
    total = sum(w for _, w in pairs)
    # query rule: smallest value where 2*cum >= total
    cum = 0
    got = None
    for v, w in pairs:
        cum += w
        if 2 * cum >= total:
            got = v
            break
    # definition: smallest v with weight-at-or-below >= half the total
    def wle(v):
        return sum(w for x, w in pairs if x <= v)

    assert got is not None
    assert 2 * wle(got) >= total
    smaller = [v for v, _ in pairs if v < got]
    if smaller:
        assert 2 * wle(max(smaller)) < total


# --- quantile-normalization rank mapping ---------------------------------


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=1000), st.integers(min_value=1, max_value=1000))
def test_quantile_map_is_monotone_and_onto_ends(n_s, N):
    if n_s > N:
        n_s, N = N, n_s
    gs = [int(math.floor((r * N - 1) * 1.0 / n_s) + 1) for r in range(1, n_s + 1)]
    assert all(1 <= g <= N for g in gs)
    assert gs == sorted(gs)  # monotone
    assert gs[-1] == N  # top maps to top
