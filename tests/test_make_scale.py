"""tools/make_scale.py invariants — the sf1/sf10 SCALE.md measurements
rest on the replica fixture being what it claims: disjoint key spaces,
disjoint token spaces (the round-7 \\S+-suffix bug cross-contaminated
replicas until decontamination emptied the corpus), norm-preserving
embedding isometries, and intact fact-join integrity. Built at factor 3
from sf0.001 so the whole test is DuckDB-only and fast."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    from make_scale import build

    out = str(tmp_path_factory.mktemp("sfx"))
    build(SRC, out, factor=3)
    con = duckdb.connect()
    for name in (
        "documents", "embeddings", "events", "lineitem", "orders",
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{os.path.join(out, name)}.parquet')"
        )
        con.execute(
            f"CREATE VIEW src_{name} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SRC, name)}.parquet')"
        )
    return con


def test_row_counts_scale_by_factor(scaled):
    for name in ("documents", "embeddings", "events", "lineitem", "orders"):
        n, n0 = scaled.execute(
            f"SELECT (SELECT count(*) FROM {name}), (SELECT count(*) FROM src_{name})"
        ).fetchone()
        assert n == 3 * n0, name


def test_replica_key_spaces_disjoint(scaled):
    k0, k1, k2, n = scaled.execute(
        """SELECT count(*) FILTER (doc_id < 10000),
                  count(*) FILTER (doc_id >= 10000 AND doc_id < 20000),
                  count(*) FILTER (doc_id >= 20000 AND doc_id < 30000),
                  count(*) FROM documents"""
    ).fetchone()
    assert k0 == k1 == k2 == n // 3
    # the % 10 train/eval split keeps its proportions in every replica
    frac = scaled.execute(
        """SELECT min(f), max(f) FROM (
               SELECT doc_id // 10000 AS k,
                      avg(CASE WHEN doc_id % 10 = 0 THEN 1.0 ELSE 0.0 END) AS f
               FROM documents GROUP BY 1)"""
    ).fetchone()
    assert abs(frac[0] - frac[1]) < 1e-9


def test_replica_token_spaces_disjoint(scaled):
    # whitespace tokens (the engine's tokenizer) of replica 0 vs 1 and 1 vs 2:
    # ZERO overlap — the invariant the \S+-suffix version violated
    overlap = scaled.execute(
        """WITH tok AS (
               SELECT doc_id // 10000 AS k,
                      unnest(regexp_split_to_array(text, '\\s+')) AS t
               FROM documents
           ),
           t0 AS (SELECT DISTINCT t FROM tok WHERE k = 0 AND t <> ''),
           t1 AS (SELECT DISTINCT t FROM tok WHERE k = 1 AND t <> ''),
           t2 AS (SELECT DISTINCT t FROM tok WHERE k = 2 AND t <> '')
           SELECT (SELECT count(*) FROM t0 JOIN t1 USING (t))
                + (SELECT count(*) FROM t1 JOIN t2 USING (t))
                + (SELECT count(*) FROM t0 JOIN t2 USING (t))"""
    ).fetchone()[0]
    assert overlap == 0


def test_n_chars_consistent_with_text(scaled):
    bad = scaled.execute(
        "SELECT count(*) FROM documents WHERE n_chars <> length(text)"
    ).fetchone()[0]
    assert bad == 0


def test_embedding_isometries_preserve_norms(scaled):
    # replica k's vector is a rotation (optionally after reversal) of the
    # base vector: same multiset of components, same norm
    drift = scaled.execute(
        """SELECT max(abs(a.n - b.n)) FROM
               (SELECT vec_id % 10000 AS base_id, vec_id // 10000 AS k,
                       list_reduce(list_transform(embedding, x -> x*x),
                                   (x, y) -> x + y) AS n
                FROM embeddings) a
           JOIN
               (SELECT vec_id AS base_id,
                       list_reduce(list_transform(embedding, x -> x*x),
                                   (x, y) -> x + y) AS n
                FROM src_embeddings) b
           USING (base_id)"""
    ).fetchone()[0]
    assert drift < 1e-3  # float32 re-encode tolerance


def test_fact_join_integrity_preserved(scaled):
    # every replica lineitem row still finds its (strided) order
    orphans = scaled.execute(
        """SELECT count(*) FROM lineitem l
           LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderkey IS NULL"""
    ).fetchone()[0]
    src_orphans = scaled.execute(
        """SELECT count(*) FROM src_lineitem l
           LEFT JOIN src_orders o ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderkey IS NULL"""
    ).fetchone()[0]
    assert orphans == 3 * src_orphans  # no NEW orphans from the stride


def test_events_timeline_and_user_strides(scaled):
    row = scaled.execute(
        """SELECT max(CASE WHEN event_id < 1000000 THEN user_id END),
                  min(CASE WHEN event_id >= 1000000 AND event_id < 2000000
                           THEN user_id END),
                  date_diff('day',
                      (SELECT min(ts) FROM events WHERE event_id < 1000000),
                      (SELECT min(ts) FROM events
                       WHERE event_id >= 1000000 AND event_id < 2000000))
           FROM events"""
    ).fetchone()
    max_u0, min_u1, day_off = row
    assert max_u0 < 10000 <= min_u1
    assert day_off == 31


def test_token_disjointness_guard_trips_on_collision_corpus(tmp_path):
    """build()'s in-build guard must refuse a corpus whose base tokens
    already carry a z<k> suffix (replica 0 keeps raw text, so such a
    token would collide with replica k's suffixed stem) — and must pass
    the real fixtures (r07 ADVICE item 3)."""
    import duckdb as d
    import pytest as pt
    from make_scale import assert_token_disjointness

    con = d.connect()
    bad = os.path.join(tmp_path, "documents.parquet")
    con.execute(
        "COPY (SELECT 1 AS doc_id, 'alpha alphaz1 beta' AS text) "
        f"TO '{bad}' (FORMAT PARQUET)"
    )
    with pt.raises(SystemExit, match="disjointness violated"):
        assert_token_disjointness(con, bad, factor=3)
    # z-suffixes at or beyond the factor are out of the collision range
    assert_token_disjointness(con, bad, factor=1)
    ok = os.path.join(tmp_path, "docs_ok.parquet")
    con.execute(
        "COPY (SELECT 1 AS doc_id, 'alpha beta z zebra blitz' AS text) "
        f"TO '{ok}' (FORMAT PARQUET)"
    )
    assert_token_disjointness(con, ok, factor=128)
    # the shipped fixture the SCALE.md measurements replicate from
    assert_token_disjointness(
        con, os.path.join(SRC, "documents.parquet"), factor=128
    )
