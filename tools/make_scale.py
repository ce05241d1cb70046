"""Synthesize a larger scale factor from sf0.1 by replica-disjoint cloning.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only). To measure the
NEXT decade — the 1000x range sf0.001→sf1 — this tool writes
``.scratch/sf<X>`` tables that are K stitched replicas of sf0.1, each
replica transformed so cross-replica rows can never collide:

- documents: doc_id += k*10_000 (stride is a multiple of 10 so the
  ``doc_id % 10`` train/eval split keeps its proportions); every token of
  ``text`` gets a ``z<k>`` suffix for k>0, applied to ``\\w+`` runs —
  exactly the runs the engine tokenizer (split on ``\\W+``) produces, so
  replica shingle/minhash spaces are FULLY disjoint (a ``\\S+``-based
  suffix leaks punctuation-adjacent tokens unsuffixed: "x-y-z" →
  [x, y, z_2] — measured to cross-contaminate replicas until the fuzzy
  pipeline's decontamination emptied the corpus). Plain text copies would
  instead turn every doc into a 10-way near-dup cluster and measure
  density, not scale. n_chars recomputed.
- embeddings: vec_id += k*10_000; the vector gets a distinct isometry
  per replica — reversed when k >= 64, then cyclically rotated by k % 64
  dimensions, and for k >= 128 additionally sign-flipped on a pattern
  keyed by q = k // 64 (flip dim i iff (i*37 + q*53) % 101 < 50 —
  still an isometry: norms and within-replica geometry preserved; the
  key advances every 64 replicas, in step with the rotation cycle, so
  every (rotation, pattern) combination is distinct).
  Without the flips the reverse x rotate family has only 128 members,
  so factors past 128 would clone vectors EXACTLY and a similarity
  probe would measure duplicate-cluster density, not scale (hit when
  the r09 SRP ladder probe needed a 1M-vector corpus, factor 500).
  k < 128 output is byte-identical to the pre-r09 tool, so existing
  .scratch/sf1 and .scratch/sf10 fixtures remain valid.
- events: event_id += k*1_000_000, user_id += k*10_000 (10x more users at
  the same per-user density — the realistic growth axis), ts += k*31 days
  (longer history, same per-day volume).
- lineitem/orders: orderkey += k*1_000_000 on both sides (join integrity);
  dates/prices/dims untouched.
- customer/supplier/part/nation/region: copied verbatim — dims fixed
  while facts grow is the lakehouse norm and keeps broadcast sides
  broadcastable, which is the plan shape under test.

Every table is written as ONE parquet file so DuckDB's
``read_parquet('<path>')`` (tools/selfcheck.py) reads it unchanged: the
sfX directory is a drop-in ``--sf`` argument, which means the ORACLE GATE
runs at sf1 too, not just the stopwatch.

Usage: python tools/make_scale.py [--factor 10] [--out .scratch/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC_DEFAULT = "/root/testdata/sf0.1"
DIMS = ("customer", "supplier", "part", "nation", "region")


def _copy(con: duckdb.DuckDBPyConnection, sql: str, dst: str) -> None:
    con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 200000)")


def assert_token_disjointness(
    con: duckdb.DuckDBPyConnection, documents_path: str, factor: int
) -> None:
    """Fail loudly if the ``z<k>`` suffix scheme could collide: replica 0
    keeps raw text, so a base token that ALREADY ends in ``z<k>`` for some
    k in [1, factor) would equal replica k's suffixed form of its stem
    (base 'a' + 'az1' collides with replica 1's 'a'->'az1'). Conservative
    check (any token ending z<k>, stem existence not required) over the
    \\W+-split token space — the same split the engine tokenizer and the
    suffix regex use. Runs inside build() at EVERY factor/source instead
    of relying on the factor-3 empirical test (r07 ADVICE item 3)."""
    (bad,) = con.execute(
        f"""
        SELECT count(*) FROM (
            SELECT unnest(regexp_split_to_array(text, '\\W+')) AS tok
            FROM read_parquet('{documents_path}')
        )
        WHERE TRY_CAST(regexp_extract(tok, 'z([0-9]+)$', 1) AS BIGINT)
              BETWEEN 1 AND {factor - 1}
        """
    ).fetchone()
    if bad:
        raise SystemExit(
            f"replica-token disjointness violated: {bad} base token "
            f"occurrences already end in z<k> for k < {factor}; the z<k> "
            "suffix scheme cannot guarantee disjoint replica token spaces "
            "on this corpus — pick a different marker"
        )


def build(src: str, out: str, factor: int, tables: set[str] | None = None) -> None:
    """``tables=None`` builds the full drop-in sf directory. A subset
    (e.g. {'embeddings'}) builds only those tables — the similarity-probe
    path, where cloning 300M lineitem rows for a 1M-vector corpus would
    be pure waste."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    ks = ", ".join(str(k) for k in range(factor))

    def want(name: str) -> bool:
        return tables is None or name in tables

    def p(name: str) -> str:
        return os.path.join(src, f"{name}.parquet")

    if want("documents"):
        assert_token_disjointness(con, p("documents"), factor)
        # documents: disjoint ids, disjoint token space per replica
        _copy(
            con,
            f"""
            WITH rep AS (
                SELECT d.doc_id, d.lang, d.source, k.k,
                       CASE WHEN k.k = 0 THEN d.text
                            ELSE regexp_replace(d.text, '(\\w+)', '\\1z' || k.k, 'g')
                       END AS text
                FROM read_parquet('{p("documents")}') d,
                     (SELECT unnest([{ks}]) AS k) k
            )
            SELECT doc_id + k * 10000 AS doc_id, text, lang, source,
                   length(text) AS n_chars
            FROM rep
            """,
            os.path.join(out, "documents.parquet"),
        )

    if want("embeddings"):
        # embeddings: disjoint ids, a distinct isometry per replica
        # (reverse when k >= 64, rotate by k % 64, sign-flip pattern
        # q = k // 64 for k >= 128 — see module docstring)
        _copy(
            con,
            f"""
            WITH rep AS (
                SELECT e.vec_id, e.label, k.k, k.k % 64 AS r, k.k // 64 AS q,
                       CASE WHEN k.k >= 64 THEN list_reverse(e.embedding)
                            ELSE e.embedding END AS base
                FROM read_parquet('{p("embeddings")}') e,
                     (SELECT unnest([{ks}]) AS k) k
            ),
            rot AS (
                SELECT vec_id, label, k, q,
                       CASE WHEN r = 0 THEN base
                            ELSE list_concat(base[r + 1:], base[:r])
                       END AS v
                FROM rep
            )
            SELECT vec_id + k * 10000 AS vec_id,
                   CASE WHEN q < 2 THEN v
                        ELSE list_transform(v, (x, i) ->
                             CASE WHEN (i * 37 + q * 53) % 101 < 50
                                  THEN -x ELSE x END)
                   END::FLOAT[] AS embedding,
                   label
            FROM rot
            """,
            os.path.join(out, "embeddings.parquet"),
        )

    if want("events"):
        # events: disjoint ids/users, shifted timeline
        _copy(
            con,
            f"""
            SELECT e.event_id + k.k * 1000000 AS event_id,
                   e.ts + to_days(k.k * 31) AS ts,
                   e.user_id + k.k * 10000 AS user_id,
                   e.event_type, e.value, e.props
            FROM read_parquet('{p("events")}') e,
                 (SELECT unnest([{ks}]) AS k) k
            """,
            os.path.join(out, "events.parquet"),
        )

    if want("lineitem"):
        # facts: disjoint orderkeys on both sides of the join
        _copy(
            con,
            f"""
            SELECT l.l_orderkey + k.k * 1000000 AS l_orderkey,
                   l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_quantity,
                   l.l_extendedprice, l.l_discount, l.l_tax, l.l_returnflag,
                   l.l_linestatus, l.l_shipdate
            FROM read_parquet('{p("lineitem")}') l,
                 (SELECT unnest([{ks}]) AS k) k
            """,
            os.path.join(out, "lineitem.parquet"),
        )
    if want("orders"):
        _copy(
            con,
            f"""
            SELECT o.o_orderkey + k.k * 1000000 AS o_orderkey,
                   o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate,
                   o.o_orderpriority
            FROM read_parquet('{p("orders")}') o,
                 (SELECT unnest([{ks}]) AS k) k
            """,
            os.path.join(out, "orders.parquet"),
        )

    for name in DIMS:
        if want(name):
            _copy(
                con,
                f"SELECT * FROM read_parquet('{p(name)}')",
                os.path.join(out, f"{name}.parquet"),
            )

    for name in (
        "documents", "embeddings", "events", "lineitem", "orders", *DIMS
    ):
        if not want(name):
            continue
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{os.path.join(out, name)}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch",
            "sf1",
        ),
    )
    ap.add_argument(
        "--tables",
        default="",
        help="comma-separated subset of tables to build (default: all)",
    )
    args = ap.parse_args()
    tables = {t for t in args.tables.split(",") if t} or None
    build(args.src, args.out, args.factor, tables)


if __name__ == "__main__":
    main()
