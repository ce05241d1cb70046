"""Scaled-corpus receipt for `j_levenshtein_blocked` (r10 verdict #4).

The registered query (plans/wave42.py) documents the linkage join's one
scale caveat: with a FIXED blocking-key domain, per-block occupancy grows
linearly with the corpus and candidate-pair volume quadratically in
occupancy — and the documented mitigation is that the block key GAINS
BITS as the corpus grows (second token, length band), holding occupancy
and therefore pair volume near-flat. Wave42 shipped the caveat measured
only at the fixed 20k-part fixture; this probe demonstrates the
mitigation at 10x and 100x.

Corpus: synthesized the TPC-H way — names are 5 words hash-indexed from
the REAL 92-word p_name vocabulary of the sf0.1 part table, sz uniform
1..50, brand the 25-member Brand#MN family. That reproduces the real
fixture's block-occupancy statistics (same key domains, same name
lengths) while letting n grow arbitrarily; verbatim row cloning would
instead create distance-0 twins inside every block and measure duplicate
density, not scale. Generation is pure hash arithmetic on spark.range —
deterministic, no data files written.

For each n in {20k, 200k, 2M} and each key in
  base      = (sz, brand, w1)            — the registered 20k key
  +w2       = (sz, brand, w1, w2)        — second token, ~92x more blocks
  +w2+len   = (sz, brand, w1, w2, len/8) — plus a coarse length band
the probe reports candidate pairs, matched pairs (lev<=4) and the wall
of the full aggregate (block equi-join + threshold levenshtein + groupBy
dist), min-of-2.

Note the +len band is a pair-volume instrument: edit distance <= 4 keeps
|len diff| <= 4, so a width-8 floor band only MISSES cross-band pairs
near band edges (the standard banding tradeoff — production would join
adjacent bands too, doubling candidates, same asymptotics).

Usage: python tools/lev_block_probe.py [n ...]   (default 20000 200000 2000000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_LEV_MAX = 4  # the registered query's shared literal


def synth_names(spark, n: int, vocab: list[str]):
    """n-row (id, name, sz, cont, w1, w2) frame, TPC-H-shaped: name =
    5 vocabulary words indexed by per-position xxhash64(id, j) — uniform
    over the vocab, deterministic, and positionally INDEPENDENT (a
    linear-stride index makes same-block names identical: w1 equality
    forces id congruence mod |vocab|, which forces every other position
    equal too — the first cut of this probe measured 490k distance-0
    'pairs' that way)."""
    v = F.lit(vocab)
    words = [
        F.element_at(
            v,
            (F.abs(F.xxhash64(F.col("id"), F.lit(j))) % len(vocab) + 1).cast("int"),
        )
        for j in range(5)
    ]
    return spark.range(n).select(
        "id",
        F.concat_ws(" ", *words).alias("name"),
        (F.col("id") % 50 + 1).cast("int").alias("sz"),
        F.concat(
            F.lit("brand#"),
            ((F.col("id") / 5) % 5 + 1).cast("int"),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("cont"),
        words[0].alias("w1"),
        words[1].alias("w2"),
    )


def measure(df, key_cols: list[str], runs: int = 2) -> dict:
    def cand():
        # a FRESH plan per execution: re-collecting one DataFrame object
        # reuses its AdaptiveSparkPlan's already-materialized query
        # stages (broadcast + shuffle), so the second 'run' would time
        # only the final stage (~0.07 s for a 4 s query, measured)
        a = df.select(
            F.col("id").alias("id_a"), F.col("name").alias("name_a"), *key_cols
        )
        b = df.select(
            F.col("id").alias("id_b"), F.col("name").alias("name_b"), *key_cols
        )
        return a.join(b, key_cols).filter(F.col("id_a") < F.col("id_b"))

    n_cand = cand().count()
    walls = []
    matched = 0
    for _ in range(runs):
        agg = (
            cand()
            .select(
                F.levenshtein(F.col("name_a"), F.col("name_b"), _LEV_MAX).alias(
                    "dist"
                )
            )
            .filter((F.col("dist") >= 0) & (F.col("dist") <= _LEV_MAX))
            .groupBy("dist")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
        )
        t0 = time.perf_counter()
        rows = agg.collect()
        walls.append(round(time.perf_counter() - t0, 3))
        matched = sum(r["n_pairs"] for r in rows)
    return {"cand_pairs": n_cand, "matched": matched, "wall": min(walls)}


def main() -> None:
    ns = [int(x) for x in sys.argv[1:]] or [20_000, 200_000, 2_000_000]

    from cicevse2024_tfm_datapipeline_spark.plans.common import t
    from cicevse2024_tfm_datapipeline_spark.session import get_spark

    spark = get_spark("lev-block-probe")
    vocab = sorted(
        r["w"]
        for r in t(spark, _SF_DIR, "part")
        .select(F.explode(F.split(F.lower("p_name"), " ")).alias("w"))
        .distinct()
        .collect()
    )
    keys = {
        "base": ["sz", "cont", "w1"],
        "+w2": ["sz", "cont", "w1", "w2"],
    }
    out = {"probe": "lev_block_probe", "vocab": len(vocab), "rows": []}
    for n in ns:
        df = synth_names(spark, n, vocab).localCheckpoint()  # freeze the
        # synthesized corpus once per n so every key variant reads the
        # same materialized rows (generation cost excluded from walls)
        for kname, kcols in keys.items():
            r = measure(df, kcols)
            row = {"n": n, "key": kname, **r}
            out["rows"].append(row)
            print(json.dumps(row), flush=True)
        lenband = df.withColumn("lb", (F.length("name") / 8).cast("int"))
        r = measure(lenband, ["sz", "cont", "w1", "w2", "lb"])
        row = {"n": n, "key": "+w2+len", **r}
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
        df.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
