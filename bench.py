"""Benchmark harness (driver contract, BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() action — full plan runs,
nothing collected to the driver beyond the count). A warmup query first
absorbs JVM/codegen startup so the numbers measure the plans, not the VM.

Host-noise discipline (r05 verdict item 4): the recorded number per query
is the MIN of N runs (N = $SPARK_GRAFT_BENCH_RUNS, default 3) and the
artifact carries every raw run plus a loadavg marker taken before and
after the sweep, so a roster-wide swing (r05 saw 1.17× on unchanged code)
can be attributed to host contention in-artifact instead of by argument.

Output framing (r06 verdict wrong #1): the driver's tail capture holds
~2.1 KB, and the r06 single-line output with embedded raw runs grew to
~4.8 KB — BENCH_r06.json came back `parsed: null`. So the bulky detail
(raw runs, loadavg) is printed on its OWN earlier line, and the FINAL
printed line is a compact summary (2dp mins, no spaces) pinned under
2000 bytes by tests/test_bench_framing.py.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "w1_chrono_split_counts",
    "w3_sliding_window_stats",
    "w5_train_only_standardize",
    "w6_sessionize_ttd",
    "tpch_q1_pricing_summary",
    "j1_broadcast_lookup_join",
    "a13_roc_auc",
    "a16_tumbling_window_avg",
    "dedup_minhash_lsh_pairs",
    "dedup_exact_group_sizes",
    "sim_bruteforce_cosine_topk",
    "sim_ivf_topk",
    "text_token_stats",
    "text_tfidf_topk",
    "j_tpch_q3_shipping_priority",
    "dedup_latest_per_key",
    "dedup_decontaminate_train",
    "sample_mixture_by_source",
    "pack_concat_chunks",
    "a11_multiclass_auc",
    "pipeline_corpus_prep",
    "text_pii_redaction",
    "r5_hash_permutation",
    "pipeline_fuzzy_corpus",
    "j_tpch_q5_local_supplier",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "dedup_semdedup_cells",
    "text_quality_linear_classifier",
    "dedup_bloom_novelty",
    "w_ewma_smoothing",
    "s10_zorder_cells",
    "dedup_duplicate_spans",
    "j_tpch_q18_large_orders",
    "j_tpch_q7_nation_volume",
    "j_tpch_q10_returned_topk",
    "w_cdc_apply_changelog",
    "w_range_frame_rolling",
    "dedup_prefix_filter_jaccard",
    "sim_rrf_fusion",
    "a_bitmap_intersection",
    "w_interval_coverage",
    "a_growth_accounting",
    "a_cusum_changepoint",
    "a_weighted_median",
    "text_inverted_index",
    "f_feature_hashing",
    "a_incremental_rollup_merge",
    "a_hll_deterministic",
    "a_kaplan_meier",
    "j_shapley_attribution",
    "a_psi_drift",
    "sample_dsir_importance",
    "ml_logreg_irls_two_rounds",
    "sample_doremi_weights",
    "sim_srp_lsh_pairs",
    "a_ips_snips_offpolicy",
    "ml_ridge_closed_form",
]


def host_speed_canary(n: int = 2_000_000, runs: int = 3) -> float:
    """Fixed CPU-bound calibration (r08 verdict "Next round" #5): sort a
    deterministic 2M-int LCG sequence, min-of-3 wall seconds. The work is
    constant across hosts and rounds, so cross-day bench totals can be
    NORMALIZED against the canary ratio instead of argued from loadavg
    readings (r07→r08 drifted +6.5% on a host running at loadavg 2.9;
    the same-day builder artifact had to carry the burden of proof).
    Pure Python on one core — measures the host, not Spark."""
    best = float("inf")
    for _ in range(runs):
        x = 123456789
        seq = []
        append = seq.append
        t0 = time.perf_counter()
        for _ in range(n):
            x = (1103515245 * x + 12345) % 2147483648
            append(x)
        seq.sort()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _env_runs(default: int = 3) -> int:
    """Parse $SPARK_GRAFT_BENCH_RUNS; non-numeric falls back to the
    default with a stderr warning instead of a ValueError traceback."""
    raw = os.environ.get("SPARK_GRAFT_BENCH_RUNS", str(default))
    try:
        return max(1, int(raw))
    except ValueError:
        print(
            f"bench: SPARK_GRAFT_BENCH_RUNS={raw!r} is not an integer; "
            f"using default {default}",
            file=sys.stderr,
        )
        return default


def format_detail_line(
    raw_runs: dict[str, list[float]],
    load_before: tuple[float, ...],
    load_after: tuple[float, ...],
    canary_sec: float | None = None,
) -> str:
    """The bulky per-run detail — its own output line, NOT the final one
    (the driver's tail capture only retains ~2.1 KB of the last line)."""
    obj = {
        "detail": "bench_raw_runs",
        "queries_runs": raw_runs,
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in load_after],
    }
    if canary_sec is not None:
        obj["canary_sec"] = canary_sec
    return json.dumps(obj)


def format_final_line(
    timings: dict[str, float], sf: float, n_runs: int, canary_sec: float | None = None
) -> str:
    """The FINAL printed line: compact driver-contract summary. 2dp mins,
    no separators-whitespace — must stay under 2000 bytes for the full
    roster (pinned by tests/test_bench_framing.py). ``canary_sec`` is the
    host-speed calibration (host_speed_canary): divide two rounds'
    totals by their canary ratio to normalize out host-speed drift."""
    total = round(sum(timings.values()), 3)
    obj = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "runs_per_query": n_runs,
        "queries": {k: round(v, 2) for k, v in timings.items()},
    }
    if canary_sec is not None:
        obj["canary_sec"] = canary_sec
    return json.dumps(obj, separators=(",", ":"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from cicevse2024_tfm_datapipeline_spark.plans import load_all
    from cicevse2024_tfm_datapipeline_spark.session import get_spark

    queries = load_all()
    spark = get_spark("bench")

    # warmup: JVM + codegen + parquet footer caches
    queries["w1_chrono_split_counts"].spark(spark, sf_dir).count()

    # min of N runs per query: this VM shows 1.5-3x run-to-run jitter
    # from host contention; the min is the standard steady-state estimate
    # (JVM/codegen warm either way — the warmup above covers first-run
    # compilation, and each query's first timed run warms its own scans)
    import gc

    n_runs = _env_runs()
    load_before = os.getloadavg()
    # host-speed calibration BEFORE the roster (fixed CPU-bound work):
    # cross-day totals normalize against the canary ratio
    canary = host_speed_canary()

    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        q = queries[name]
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
        raw_runs[name] = runs
        timings[name] = min(runs)
        # release prior queries' localCheckpoint blocks: the JVM frees
        # them only after the driver-side DataFrame is collected — left
        # alone they pile up across the suite and stall later queries in
        # executor-memory GC
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    load_after = os.getloadavg()
    # bulky detail first, compact summary LAST (driver tail-capture contract)
    print(format_detail_line(raw_runs, load_before, load_after, canary))
    print(format_final_line(timings, sf, n_runs, canary))


if __name__ == "__main__":
    main()
