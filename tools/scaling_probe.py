"""Measured scaling probe: run flagship queries at sf0.001 / sf0.01 /
sf0.1 (a 100x data range) in ONE session and print the wall-time growth
ratios — the empirical check behind SCALE.md's "would this survive
100x" claims. A query whose plan is scale-safe should grow sublinearly
at these sizes (fixed stage overhead dominates) and never superlinearly.

Usage: python tools/scaling_probe.py [--only name1,name2]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIPS = [
    "w1_chrono_split_counts",
    "tpch_q1_pricing_summary",
    "w6_sessionize_ttd",
    "a13_roc_auc",
    "dedup_minhash_lsh_pairs",
    "dedup_exact_group_sizes",
    "dedup_prefix_filter_jaccard",
    "sim_bruteforce_cosine_topk",
    "text_token_stats",
    "a_bitmap_intersection",
    "w_interval_coverage",
    "a_incremental_rollup_merge",
    # round-4 tier (waves 21-41)
    "sim_srp_lsh_pairs",
    "ml_gbm_two_stumps",
    "ml_logreg_irls_two_rounds",
    "sample_dsir_importance",
    "sample_doremi_weights",
    "j_fellegi_sunter_linkage",
    "g_kcore_two_rounds",
    # round-6 certification-window tier (heaviest of the r06 driver window
    # per the sf0.01 selfcheck: candidate-pair / association / triangle
    # shapes whose cost could in principle track data volume)
    "a_cramers_v_matrix",
    "a_association_rules",
    "dedup_contamination_fraction",
    "dedup_sorted_neighborhood",
    "sim_hard_negatives",
    "g_triangle_count_lsh",
    "j_salted_skew_join",
    "a_peak_concurrency",
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    names = args.only.split(",") if args.only else FLAGSHIPS

    from cicevse2024_tfm_datapipeline_spark.plans import load_all
    from cicevse2024_tfm_datapipeline_spark.session import get_spark

    queries = load_all()
    spark = get_spark("scaling-probe")
    queries["w1_chrono_split_counts"].spark(spark, SFS[0]).count()  # warmup

    print(f"{'query':34s} {'sf.001':>7s} {'sf.01':>7s} {'sf.1':>7s} {'x100 ratio':>10s}")
    for name in names:
        walls = []
        for sf in SFS:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                queries[name].spark(spark, sf).count()
                best = min(best, time.perf_counter() - t0)
            walls.append(best)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        ratio = walls[2] / walls[0] if walls[0] > 0 else float("inf")
        print(
            f"{name:34s} {walls[0]:7.2f} {walls[1]:7.2f} {walls[2]:7.2f} {ratio:9.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
