"""SRP band-count recall/cost probe at 1M vectors (r09 verdict item 3).

The registered `sim_srp_lsh_pairs` pins 2 bands so the benched candidate
volume stays comparable round over round; the BAND COUNT is the
production recall knob (OR-construction: P(candidate) = 1-(1-p^w)^b,
~linear candidate cost per band). The r07 width probe charted the knob
at sf0.1 only; this probe charts it at 1M vectors — past the old w=16
saturation point, at the shipped ladder width — so a deployment sizing
b against a recall target reads a measured curve, not an extrapolation.

For each b in {2, 3, 4} on the FROZEN stride-64 layout (band b's plane j
= coefficient row b*64 + j — bands 2/3 extend the registered family
without moving bands 0/1):

  - candidate pairs (union of b band-key self-equi-joins, distinct) +
    min-of-2 join wall from MATERIALIZED signatures (the one-time
    signature fold cost is reported separately — on a cluster it is
    embarrassingly parallel map work),
  - recall vs brute-force ground truth on the registered query's audit
    slice (smaller id < 64, exact cosine >= 0.35): truth via a numpy
    matmul in mapInPandas (probe-only shortcut; borderline-tau float
    disagreement vs the sequential fold is possible and harmless here),
    found = truth pairs agreeing on >= 1 of the first b band signatures.

Also prints per-band occupancy stats (intra-bucket pairs vs the uniform
C(n,2)/2^w expectation, max bucket) for the Jensen-floor check (SCALE.md
round 10): even iid vectors collide E[p(theta)^w]/2^-w above uniform
because p = 1 - theta/pi spreads around 1/2 and x^w is convex.

Usage: python tools/srp_band_probe.py [corpus_dir ...]
       (default .scratch/emb1m .scratch/iid1m)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEFAULT = [
    os.path.join(_REPO, ".scratch", "emb1m"),
    os.path.join(_REPO, ".scratch", "iid1m"),
]
_AUDIT_N = 64
_TAU = 0.35
_MAX_BANDS = 4


def _band_sig(col, band: int, width: int):
    """Frozen-stride band signature for ANY band index (the registered
    query's _SRP literal table only materializes bands 0/1; bands 2/3
    read coefficient rows band*64 + j straight from the mix)."""
    from cicevse2024_tfm_datapipeline_spark.operators.similarity import dot_expr
    from cicevse2024_tfm_datapipeline_spark.plans.wave27 import (
        _BAND_STRIDE,
        _srp_coef,
    )

    sig = F.lit(0)
    for j in range(width):
        p = band * _BAND_STRIDE + j
        w = F.slice(
            F.lit([float(_srp_coef(p, d)) for d in range(64)]), 1, F.size(col)
        )
        sig = sig + F.when(dot_expr(col, w) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sig.cast("long")


def _truth_pairs(spark, emb, slice_rows):
    """Brute-force audit truth: (t_a < 64, t_a < t_b, cosine >= tau) via a
    numpy matmul over Arrow batches — probe-only (the registered query's
    in-result contract uses the exact sequential fold)."""
    ids = np.array([r["vec_id"] for r in slice_rows], dtype=np.int64)
    S = np.array([r["v"] for r in slice_rows], dtype=np.float64)
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)

    def gen(batches):
        for pdf in batches:
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            cos = Vn @ Sn.T  # batch x slice
            vid = pdf["vec_id"].to_numpy()
            bi, si = np.nonzero(cos >= _TAU)
            ta, tb = ids[si], vid[bi]
            keep = ta < tb
            yield pd.DataFrame({"t_a": ta[keep], "t_b": tb[keep]})

    vecs = emb.select("vec_id", "v")
    return vecs.mapInPandas(gen, schema="t_a long, t_b long")


def probe_corpus(spark, d: str, scratch: str) -> None:
    from cicevse2024_tfm_datapipeline_spark.operators.similarity import (
        as_double_array,
    )
    from cicevse2024_tfm_datapipeline_spark.operators.skew import (
        ensure_min_parallelism,
    )
    from cicevse2024_tfm_datapipeline_spark.plans.wave27 import _ladder_width
    from cicevse2024_tfm_datapipeline_spark.sources.readers import load_table

    emb = ensure_min_parallelism(load_table(spark, d, "embeddings")).select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    n = emb.count()
    width = _ladder_width(n)
    name = os.path.basename(d)
    print(f"== {name}: n={n} ladder w={width}", flush=True)

    # one-time signature materialization (4 bands)
    sig_path = os.path.join(scratch, f"srp_band_probe_sigs_{name}")
    t0 = time.perf_counter()
    emb.select(
        "vec_id",
        *[_band_sig(F.col("v"), b, width).alias(f"s{b}") for b in range(_MAX_BANDS)],
    ).write.mode("overwrite").parquet(sig_path)
    t_sig = time.perf_counter() - t0
    sigs = spark.read.parquet(sig_path)
    print(f"   sig fold+write ({_MAX_BANDS} bands): {t_sig:.1f}s", flush=True)

    # occupancy stats per band (Jensen-floor check)
    uniform = n * (n - 1) / 2.0 / (1 << width)
    for b in range(_MAX_BANDS):
        row = (
            sigs.groupBy(f"s{b}")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                (F.sum(F.col("c") * (F.col("c") - 1)) / 2).alias("pairs"),
                F.max("c").alias("mx"),
                F.count(F.lit(1)).alias("nbkt"),
            )
            .first()
        )
        print(
            f"   band {b}: intra-bucket pairs {row['pairs']:.0f} "
            f"({row['pairs'] / uniform:.2f}x uniform {uniform:.0f}), "
            f"max bucket {row['mx']}, buckets {row['nbkt']}",
            flush=True,
        )

    # audit truth once
    slice_rows = emb.filter(F.col("vec_id") < _AUDIT_N).collect()
    truth = _truth_pairs(spark, emb, slice_rows)
    tdf = (
        truth.join(
            sigs.select(
                F.col("vec_id").alias("t_a"),
                *[F.col(f"s{b}").alias(f"a{b}") for b in range(_MAX_BANDS)],
            ),
            "t_a",
        )
        .join(
            sigs.select(
                F.col("vec_id").alias("t_b"),
                *[F.col(f"s{b}").alias(f"b{b}") for b in range(_MAX_BANDS)],
            ),
            "t_b",
        )
        .select(
            *[
                (F.col(f"a{b}") == F.col(f"b{b}")).cast("int").alias(f"m{b}")
                for b in range(_MAX_BANDS)
            ]
        )
        .collect()
    )
    n_truth = len(tdf)
    print(f"   audit truth pairs (slice<{_AUDIT_N}, tau={_TAU}): {n_truth}", flush=True)

    for nb in (2, 3, 4):
        bands = sigs.select(
            "vec_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.col(f"s{b}").alias("band_val"),
                        )
                        for b in range(nb)
                    ]
                )
            ).alias("x"),
        ).select("vec_id", "x.band_idx", "x.band_val")
        a = bands.select(F.col("vec_id").alias("id_a"), "band_idx", "band_val")
        bb = bands.select(F.col("vec_id").alias("id_b"), "band_idx", "band_val")
        cand = (
            a.join(bb, ["band_idx", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        best, pairs = float("inf"), -1
        for _ in range(2):
            t0 = time.perf_counter()
            pairs = cand.count()
            best = min(best, time.perf_counter() - t0)
        found = sum(1 for r in tdf if any(r[f"m{b}"] for b in range(nb)))
        rec = found / n_truth if n_truth else float("nan")
        print(
            f"   b={nb}: candidates={pairs} join-wall={best:.1f}s "
            f"found={found}/{n_truth} recall={rec:.4f}",
            flush=True,
        )


def main() -> None:
    from cicevse2024_tfm_datapipeline_spark.session import get_spark

    dirs = sys.argv[1:] or _DEFAULT
    scratch = os.path.join(_REPO, ".scratch")
    spark = get_spark("srp-band-probe")
    for d in dirs:
        if not os.path.isdir(d):
            print(f"skip {d} (missing)", flush=True)
            continue
        probe_corpus(spark, d, scratch)


if __name__ == "__main__":
    main()
