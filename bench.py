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

Burst attribution (r09 verdict wrong #2): min-of-3 failed to absorb a
multi-second mid-roster host burst (w_ewma_smoothing 1.71 s vs a 0.22 s
same-tree receipt), and one pre-roster canary couldn't attribute it. Two
instruments fix that: host-speed canary samples are INTERLEAVED
(start/mid/end, "canaries" in both lines), and any query whose min
exceeds OUTLIER_FACTOR x its best-ever committed driver record
(best_ever_records over BENCH_r*.json) is automatically re-measured
after a GC pause — pre/post/best ship in the final line's "rr" map next
to the re-measured "queries" value, so a burst AND how far it healed are
explained inside the artifact.

Host-noise prevention (r10 verdict "Next round" #2, AMENDED r11
optimization round): bench samples the start canary and resamples up to
CANARY_GATE_RETRIES times when it exceeds the gate — but by default it
then RUNS THE ROSTER ANYWAY and flags the exceedance in-artifact
("gate_exceeded" + every sample in the detail line). The r10-verdict
refusal behavior assumed host slowness is transient contention; this
sandbox demonstrated a PERSISTENTLY slow host (loadavg 0.34 idle, canary
2.1 vs the 1.14 the r11 builder record was set at), and on such a host a
refusal means the official driver artifact carries NO queries map at all
— a violation of the driver bench contract that is strictly worse than a
flagged slow-host roster (canary_sec normalization, in-artifact since
r08, is the cross-host comparison instrument). The refusal mode remains
available for unattended record-book runs via
$SPARK_GRAFT_CANARY_GATE_STRICT=1; $SPARK_GRAFT_CANARY_GATE still
configures or disables the threshold, and the detail line records the
gate it ran under either way.

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


#: outlier re-run rule (r09 verdict "Next round" #2): a query whose
#: min-of-N exceeds OUTLIER_FACTOR x its best-ever committed driver record
#: is re-measured (OUTLIER_RERUNS runs after a GC pause) so a mid-roster
#: host burst — r09's w_ewma_smoothing read 1.71 s against a 0.22 s
#: same-tree builder receipt — is attributed IN the artifact instead of
#: by cross-artifact argument. ALL THREE figures ship in the final line's
#: "rr" map — {"pre": first min, "post": re-run min, "best": record} —
#: while "queries" carries the overall min (r10 verdict #5: the bare
#: pre-rerun float couldn't distinguish "healed to best-ever" from
#: "healed to 1.4x best-ever" without the detail file).
#: Factor lowered 2.0 → 1.5 (r10 verdict #2b): sample_doremi_weights at
#: 1.60x sat under the old trigger with no in-artifact receipt either way.
OUTLIER_FACTOR = 1.5
OUTLIER_RERUNS = 5
OUTLIER_MAX_QUERIES = 3  # final-line byte budget (the r09 burst lifted
#                          exactly 3 queries past 2x; a wider burst shows
#                          in the interleaved canaries instead)

#: start-canary gate (r10 verdict "Next round" #2a): the r10 builder
#: artifacts were recorded on a host reading canaries 1.19–1.43 while the
#: record book was set at ~1.09, so every cross-round comparison needed
#: canary arithmetic. Prevention beats annotation: bench REFUSES TO OPEN
#: the roster when the start canary exceeds the gate — resampling a few
#: times first so a transient burst doesn't kill an unattended run — and
#: prints a self-explaining refusal line with every sample. Configure via
#: $SPARK_GRAFT_CANARY_GATE (seconds; "off"/"0" disables — the detail
#: line then carries the explicit override note).
CANARY_GATE_DEFAULT = 1.15
CANARY_GATE_RETRIES = 4
CANARY_GATE_PAUSE_SEC = 30.0


def canary_gate_strict() -> bool:
    """$SPARK_GRAFT_CANARY_GATE_STRICT=1 restores the r10-verdict refusal
    (print the non-roster refusal line and exit without running). Default
    is advisory: an exceeded gate is flagged in-artifact but the roster
    still runs, so the official driver artifact always carries the
    contract queries map even on a persistently slow host."""
    return os.environ.get("SPARK_GRAFT_CANARY_GATE_STRICT", "").strip() in (
        "1",
        "true",
        "yes",
    )


def canary_gate_threshold() -> float | None:
    """$SPARK_GRAFT_CANARY_GATE: unset → the default gate; "off"/"0"/
    "none"/"disabled" (or any non-positive number) → None (gate off);
    a positive float → that threshold; garbage → default + warning."""
    raw = os.environ.get("SPARK_GRAFT_CANARY_GATE", "").strip()
    if not raw:
        return CANARY_GATE_DEFAULT
    if raw.lower() in ("off", "none", "disabled"):
        return None
    try:
        val = float(raw)
    except ValueError:
        print(
            f"bench: SPARK_GRAFT_CANARY_GATE={raw!r} is not a number or "
            f"'off'; using default {CANARY_GATE_DEFAULT}",
            file=sys.stderr,
        )
        return CANARY_GATE_DEFAULT
    return val if val > 0 else None


def canary_gate_check(
    threshold: float | None,
    sample=host_speed_canary,
    retries: int = CANARY_GATE_RETRIES,
    pause_sec: float = CANARY_GATE_PAUSE_SEC,
    sleep=time.sleep,
) -> tuple[bool, list[float]]:
    """Sample the host-speed canary until it reads at-or-under the gate
    or ``retries`` resamples (after ``pause_sec`` settles) are exhausted.
    Returns ``(ok, samples)`` — the LAST sample is the start canary the
    roster records when ok."""
    samples = [round(sample(), 4)]
    if threshold is None:
        return True, samples
    while samples[-1] > threshold and len(samples) <= retries:
        sleep(pause_sec)
        samples.append(round(sample(), 4))
    return samples[-1] <= threshold, samples


def format_gate_refusal_line(
    samples: list[float], threshold: float, sf: float
) -> str:
    """The final line when the gate refuses: a DIFFERENT metric name (so
    best_ever_records and cross-round total comparisons can never ingest
    it as a roster record) carrying every canary sample and the gate."""
    return json.dumps(
        {
            "metric": "canary_gate_refused",
            "unit": "sec",
            "value": samples[-1],
            "sf": sf,
            "canary_gate": threshold,
            "canary_samples": samples,
            "note": "host too slow/busy to record a comparable roster; "
            "settle the host or set SPARK_GRAFT_CANARY_GATE",
        },
        separators=(",", ":"),
    )


def best_ever_records(repo_dir: str | None = None) -> dict[str, float]:
    """Per-query best-ever seconds across the committed official driver
    artifacts (BENCH_r*.json, skipping *_builder* side files and rounds
    the driver failed to parse). The in-repo record book the outlier rule
    compares against — self-maintaining as rounds accrue."""
    import glob

    repo_dir = repo_dir or os.path.dirname(os.path.abspath(__file__))
    best: dict[str, float] = {}
    for path in sorted(glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))):
        if "_builder" in os.path.basename(path):
            continue
        try:
            with open(path) as fh:
                parsed = json.load(fh).get("parsed")
            queries = parsed.get("queries", {}) if parsed else {}
        except (OSError, ValueError, AttributeError):
            continue
        for name, sec in queries.items():
            if isinstance(sec, (int, float)) and sec > 0:
                best[name] = min(best.get(name, float("inf")), float(sec))
    return best


def detect_outliers(
    timings: dict[str, float],
    best: dict[str, float],
    factor: float = OUTLIER_FACTOR,
    cap: int = OUTLIER_MAX_QUERIES,
) -> list[str]:
    """Names whose measured min exceeds ``factor`` x their best-ever
    record, worst exceedance first, at most ``cap`` (each re-run costs
    OUTLIER_RERUNS full executions — a roster-wide burst re-running
    everything would double the bench)."""
    flagged = [
        (timings[n] / best[n], n)
        for n in timings
        if n in best and best[n] > 0 and timings[n] > factor * best[n]
    ]
    flagged.sort(key=lambda t: (-t[0], t[1]))
    return [n for _, n in flagged[:cap]]


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
    canaries: list[float] | None = None,
    outlier_reruns: dict[str, dict] | None = None,
    canary_gate: float | str | None = None,
    gate_exceeded: bool = False,
    gate_samples: list[float] | None = None,
) -> str:
    """The bulky per-run detail — its own output line, NOT the final one
    (the driver's tail capture only retains ~2.1 KB of the last line).
    ``canaries``/``outlier_reruns`` are appended LAST in the object: the
    tail capture keeps the END of this line, so the burst-attribution
    evidence survives even in the truncated driver artifact.
    ``canary_gate`` records the gate the roster opened under — the float
    threshold, or the literal "off" when the env override disabled it
    (the r10 verdict's explicit gate-override note)."""
    obj = {
        "detail": "bench_raw_runs",
        "queries_runs": raw_runs,
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in load_after],
    }
    if canary_sec is not None:
        obj["canary_sec"] = canary_sec
    if canary_gate is not None:
        obj["canary_gate"] = canary_gate
    if gate_exceeded:
        # advisory-mode flag (r11): the roster ran on a host whose start
        # canary never settled under the gate — every sample recorded so
        # the slow-host evidence is in the artifact, not an argument
        obj["gate_exceeded"] = True
        if gate_samples is not None:
            obj["gate_samples"] = gate_samples
    if canaries is not None:
        obj["canaries"] = canaries
    if outlier_reruns:
        obj["outlier_reruns"] = outlier_reruns
    return json.dumps(obj)


def format_final_line(
    timings: dict[str, float],
    sf: float,
    n_runs: int,
    canary_sec: float | None = None,
    canaries: list[float] | None = None,
    rr: dict[str, dict] | None = None,
) -> str:
    """The FINAL printed line: compact driver-contract summary. 2dp mins,
    no separators-whitespace — must stay under 2000 bytes for the full
    roster (pinned by tests/test_bench_framing.py). ``canary_sec`` is the
    host-speed calibration (host_speed_canary): divide two rounds'
    totals by their canary ratio to normalize out host-speed drift.
    ``canaries`` interleaves start/mid/end samples so a mid-roster burst
    is visible in-artifact; ``rr`` maps each outlier-re-run query to
    ``{"pre": first min, "post": re-run min, "best": best-ever record}``
    (r10 verdict #5: self-sufficient healing receipts — ``queries``
    carries min(pre, post))."""
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
    if canaries is not None:
        obj["canaries"] = canaries
    if rr:
        obj["rr"] = {
            name: {k: round(v, 3) for k, v in fig.items()}
            for name, fig in rr.items()
        }
    return json.dumps(obj, separators=(",", ":"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # start-canary gate BEFORE any Spark work. Advisory by default: an
    # exceeded gate is flagged in-artifact ("gate_exceeded" in the detail
    # line) but the roster still runs — the driver contract requires a
    # queries map in the final line no matter how slow the host is.
    # SPARK_GRAFT_CANARY_GATE_STRICT=1 restores the refusal behavior for
    # unattended record-book runs.
    gate = canary_gate_threshold()
    gate_ok, gate_samples = canary_gate_check(gate)
    if not gate_ok and canary_gate_strict():
        print(format_gate_refusal_line(gate_samples, gate, sf))
        return
    if not gate_ok:
        print(
            f"bench: start canary {gate_samples[-1]} exceeds gate {gate} "
            f"after {len(gate_samples)} samples; proceeding (advisory "
            "mode) — numbers are comparable only canary-normalized",
            file=sys.stderr,
        )

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
    # host-speed calibration INTERLEAVED through the roster (r09 verdict
    # #2): start/mid/end samples, so a burst confined to one stretch of
    # the sweep — r09's w_ewma_smoothing window — shows up as a canary
    # spike at the matching sample instead of being invisible to a single
    # pre-roster reading. canary_sec stays the start sample (the r08
    # normalization contract) — reused from the gate check, which already
    # measured the host at roster open.
    canaries = [gate_samples[-1]]
    mid_at = len(HEADLINE) // 2

    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    for i, name in enumerate(HEADLINE):
        if i == mid_at:
            canaries.append(host_speed_canary(runs=1))
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
    canaries.append(host_speed_canary(runs=1))

    # outlier re-run rule: any min exceeding OUTLIER_FACTOR x its
    # best-ever committed driver record gets a second chance after a GC
    # pause — pre/post/best all ship in the artifact so a transient burst
    # is attributable (and its healing judgeable) in-round
    best = best_ever_records()
    rr: dict[str, dict] = {}
    rerun_detail: dict[str, dict] = {}
    for name in detect_outliers(timings, best):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        reruns: list[float] = []
        for _ in range(OUTLIER_RERUNS):
            t0 = time.perf_counter()
            queries[name].spark(spark, sf_dir).count()
            reruns.append(round(time.perf_counter() - t0, 3))
        pre, post = timings[name], min(reruns)
        timings[name] = min(pre, post)
        rr[name] = {"pre": pre, "post": post, "best": best[name]}
        rerun_detail[name] = {
            "first_min": pre,
            "rerun_min": post,
            "rerun_runs": reruns,
            "best_ever": best[name],
        }

    load_after = os.getloadavg()
    canaries = [round(c, 4) for c in canaries]
    # bulky detail first, compact summary LAST (driver tail-capture contract)
    print(
        format_detail_line(
            raw_runs,
            load_before,
            load_after,
            canaries[0],
            canaries=canaries,
            outlier_reruns=rerun_detail,
            canary_gate=gate if gate is not None else "off",
            gate_exceeded=not gate_ok,
            gate_samples=[round(s, 4) for s in gate_samples] if not gate_ok else None,
        )
    )
    print(
        format_final_line(
            timings, sf, n_runs, canaries[0], canaries=canaries, rr=rr
        )
    )


if __name__ == "__main__":
    main()
