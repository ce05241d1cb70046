"""Generate an i.i.d. pseudo-random embeddings table (hash-derived, no
RNG state) for LSH probes that must separate the LADDER MECHANISM from
FIXTURE DENSITY.

The replica-cloned corpora (tools/make_scale.py) are the right scale
fixtures for end-to-end parity, but their similarity mass is cluster-
structured by construction (isometric replicas of a 2k-vector base), so
candidate/true-pair volume grows super-linearly with factor — any LSH
probe against them measures density, not the index. This table is the
control: each dimension is an independent hash-derived uniform in
[-1, 1], so true-similar pairs are vanishingly rare and candidate
volume isolates the bucket-occupancy behavior of the width ladder.

Usage: python tools/make_iid_embeddings.py --n 1000000 --out .scratch/iid1m
"""

from __future__ import annotations

import argparse
import os

import duckdb


def build(n: int, out: str, dim: int = 64) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT i AS vec_id,
                   list_transform(range({dim}), d ->
                       (CAST(hash(i * {dim} + d) % 2001 AS BIGINT) - 1000) / 1000.0
                   )::FLOAT[] AS embedding,
                   CAST(hash(i) % 4 AS INT) AS label
            FROM range({n}) t(i)
        ) TO '{os.path.join(out, "embeddings.parquet")}'
        (FORMAT PARQUET, ROW_GROUP_SIZE 200000)
        """
    )
    cnt = con.execute(
        f"SELECT count(*) FROM read_parquet('{os.path.join(out, 'embeddings.parquet')}')"
    ).fetchone()[0]
    print(f"embeddings: {cnt} rows (iid, dim {dim})")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    build(args.n, args.out, args.dim)


if __name__ == "__main__":
    main()
