"""SRP-LSH signature-width scaling probe (round 7; remedy APPLIED round 8).

The sf1 probe (SCALE.md) found the one super-linear scaler in the heavy
tier: `sim_srp_lsh_pairs` at 11.7x for 10x data, because its 16-bit
signature in two fixed 8-bit bands gives a 2x256-key bucket space —
bucket occupancy, and therefore exact-verify candidate volume, grows
quadratically once the corpus outgrows the key space.

Round 8 applied the measured remedy to the registered query
(plans/wave27.py): band signatures masked to a count-driven width
(integer occupancy ladder, identical in both engines); round 9 extended
the ladder to w in [8, 24] on a frozen stride-64 coefficient layout
(occupancy bounded to n <= 8*2^24 ~ 134M vectors per corpus). This probe remains the measurement of the underlying
width/bands trade surface at FIXED configurations — the identical plan
shape (sign-projection signature → banded explode → band-key
self-equi-join → distinct pairs) run at:

- 16 planes, 2 x 8-bit bands   (the pre-r08 registered shape)
- 32 planes, 2 x 16-bit bands  (width only — occupancy fix, recall cost)
- 64 planes, 4 x 16-bit bands  (width AND bands — the production tuning)

at sf0.1 and .scratch/sf1 (tools/make_scale.py). Wider bands are
STRICTER per band (16 planes must agree instead of 8), so the probe also
measures recall: the fraction of TRUE pairs (exact cosine >= 0.35 over
the query shape's verified candidates) each scaled shape retains.

Usage: python tools/srp_width_probe.py [--sf1 .scratch/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _srp_coef(p: int, d: int) -> int:
    # the query's own coefficient mix (avalanche, r09) so probe planes
    # stay comparable with the registered family
    from cicevse2024_tfm_datapipeline_spark.plans.wave27 import (
        _srp_coef as _coef,
    )

    return _coef(p, d)


def candidate_pairs(spark, sf_dir: str, n_planes: int, band_bits: int,
                    n_bands: int = 2):
    """Band values are computed per band directly (bits 0..band_bits-1 of
    that band's own planes) — a monolithic n_planes-bit signature would
    overflow a signed long at 64 planes (1 << 63)."""
    from cicevse2024_tfm_datapipeline_spark.operators.similarity import (
        as_double_array,
        dot_expr,
    )
    from cicevse2024_tfm_datapipeline_spark.operators.skew import (
        ensure_min_parallelism,
    )
    from cicevse2024_tfm_datapipeline_spark.sources.readers import load_table

    assert n_bands * band_bits == n_planes
    emb = ensure_min_parallelism(load_table(spark, sf_dir, "embeddings"))
    col = as_double_array("embedding")

    def band_val(band: int) -> F.Column:
        v = F.lit(0).cast("long")
        for j in range(band_bits):
            p = band * band_bits + j
            w = F.slice(
                F.lit([float(_srp_coef(p, d)) for d in range(64)]),
                1,
                F.size(col),
            )
            v = v + F.when(dot_expr(col, w) >= 0, F.lit(1 << j)).otherwise(
                F.lit(0)
            )
        return v

    bands = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        band_val(i).alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "b.band_idx", "b.band_val")
    a = bands.select(
        F.col("vec_id").alias("id_a"), "band_idx", "band_val"
    )
    b = bands.select(
        F.col("vec_id").alias("id_b"), "band_idx", "band_val"
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def shipped_candidate_pairs(spark, sf_dir: str):
    """The REGISTERED query's candidate set (round-8 shape): two bands of
    the plan-time ladder width w, band b drawing coefficient rows
    _plane(b, 0..w-1) (wave27's exact frozen-stride layout and expressions) — so the probe measures the
    shipped config's recall on the same brute-force ground truth as the
    fixed configs."""
    from cicevse2024_tfm_datapipeline_spark.operators.skew import (
        ensure_min_parallelism,
    )
    from cicevse2024_tfm_datapipeline_spark.plans.wave27 import (
        _ladder_width,
        srp_band_sig_expr,
    )
    from cicevse2024_tfm_datapipeline_spark.operators.similarity import (
        as_double_array,
    )
    from cicevse2024_tfm_datapipeline_spark.sources.readers import load_table

    emb = ensure_min_parallelism(load_table(spark, sf_dir, "embeddings"))
    width = _ladder_width(emb.count())
    col = as_double_array("embedding")
    bands = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        srp_band_sig_expr(col, i, width).alias("band_val"),
                    )
                    for i in range(2)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "b.band_idx", "b.band_val")
    a = bands.select(F.col("vec_id").alias("id_a"), "band_idx", "band_val")
    b = bands.select(F.col("vec_id").alias("id_b"), "band_idx", "band_val")
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    ), width


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--sf1",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch",
            "sf1",
        ),
    )
    args = ap.parse_args()

    from cicevse2024_tfm_datapipeline_spark.session import get_spark

    spark = get_spark("srp-width-probe")
    configs = [
        (16, 8, 2, "16-bit / 2x8-bit (query shape)"),
        (32, 16, 2, "32-bit / 2x16-bit (width only)"),
        (64, 16, 4, "64-bit / 4x16-bit (width + bands)"),
    ]
    for sf_name, sf_dir in (("sf0.1", args.sf01), ("sf1", args.sf1)):
        n_vecs = (
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
        )
        # ground truth at sf0.1: BRUTE-FORCE all-pairs exact cosine
        # (2M pairs — cheap); at sf1 (200M pairs) recall is skipped and
        # only candidate volume + wall are compared
        truth = _bruteforce_true_pairs(spark, sf_dir) if sf_name == "sf0.1" else None
        truth_n = truth.count() if truth is not None else 0
        for planes, bits, nb, label in configs:
            cand = candidate_pairs(spark, sf_dir, planes, bits, nb)
            best, pairs = 1e9, -1
            for _ in range(2):
                t0 = time.perf_counter()
                pairs = cand.count()
                best = min(best, time.perf_counter() - t0)
            if truth is not None:
                kept = cand.join(truth, ["id_a", "id_b"]).count()
                rec = f"recall={kept / truth_n:.3f} ({kept}/{truth_n})"
            else:
                rec = "recall=skipped (brute force at 200M pairs)"
            print(
                f"{sf_name} ({n_vecs} vecs)  {label}: "
                f"candidates={pairs}  wall={best:.2f}s  {rec}",
                flush=True,
            )
        # the registered query's round-8 shape (plan-time ladder width)
        cand, width = shipped_candidate_pairs(spark, sf_dir)
        best, pairs = 1e9, -1
        for _ in range(2):
            t0 = time.perf_counter()
            pairs = cand.count()
            best = min(best, time.perf_counter() - t0)
        if truth is not None:
            kept = cand.join(truth, ["id_a", "id_b"]).count()
            rec = f"recall={kept / truth_n:.3f} ({kept}/{truth_n})"
        else:
            rec = "recall=skipped (brute force at 200M pairs)"
        print(
            f"{sf_name} ({n_vecs} vecs)  SHIPPED 2x{width}-bit (ladder): "
            f"candidates={pairs}  wall={best:.2f}s  {rec}",
            flush=True,
        )


def _bruteforce_true_pairs(spark, sf_dir: str):
    """ALL pairs with exact cosine >= 0.35 — the unbiased recall
    denominator (the query's own candidate set would make its recall
    1.0 by construction)."""
    from cicevse2024_tfm_datapipeline_spark.operators.similarity import (
        as_double_array,
        dot_expr,
        norm_expr,
    )
    from cicevse2024_tfm_datapipeline_spark.sources.readers import load_table

    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    a = vecs.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = vecs.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    cos = dot_expr(F.col("va"), F.col("vb")) / (
        norm_expr(F.col("va")) * norm_expr(F.col("vb"))
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(cos >= 0.35)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )


if __name__ == "__main__":
    main()
