"""bench.py output framing contract (r06 verdict wrong #1).

The driver captures only the TAIL (~2.1 KB) of bench.py's stdout and
parses the last line as the BENCH artifact. Round 6's single-line output
with embedded raw runs grew to ~4.8 KB and truncated mid-object
(BENCH_r06.json: parsed=null). These tests pin the fix: the final line is
a compact summary that always fits the tail window, the bulky detail
lives on its own earlier line, and both lines are independently valid
JSON.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_final_line_under_2000_bytes_worst_case():
    # worst case: every roster query at a 3-digit-seconds value — wider
    # than any real measurement (full roster totals ~40-75 s)
    timings = {name: 999.99 for name in bench.HEADLINE}
    line = bench.format_final_line(timings, sf=0.1, n_runs=3)
    assert len(line.encode()) < 2000, (
        f"final bench line is {len(line.encode())} bytes; the driver tail "
        f"capture holds ~2100 — it would truncate again"
    )
    assert "\n" not in line


def test_final_line_parses_with_contract_fields():
    timings = {name: 1.234 for name in bench.HEADLINE}
    obj = json.loads(bench.format_final_line(timings, sf=0.1, n_runs=3))
    assert obj["metric"] == "headline_queries_total_wall"
    assert obj["unit"] == "sec"
    assert obj["sf"] == 0.1
    assert obj["runs_per_query"] == 3
    assert set(obj["queries"]) == set(bench.HEADLINE)
    assert abs(obj["value"] - round(1.234 * len(bench.HEADLINE), 3)) < 1e-9
    # per-query values are 2dp mins
    assert all(v == 1.23 for v in obj["queries"].values())


def test_detail_line_is_valid_json_and_separate():
    raw = {name: [1.5, 1.2, 1.1] for name in bench.HEADLINE}
    line = bench.format_detail_line(raw, (1.0, 2.0, 3.0), (4.0, 5.0, 6.0))
    obj = json.loads(line)
    assert obj["detail"] == "bench_raw_runs"
    assert obj["queries_runs"] == raw
    assert obj["loadavg_before"] == [1.0, 2.0, 3.0]
    assert "\n" not in line


def test_canary_present_in_both_lines_and_fits():
    """r08 verdict "Next round" #5: the host-speed canary must ride in
    BOTH output lines (summary for the judge's normalization, detail for
    the receipts) without breaking the 2000-byte tail-capture budget."""
    timings = {name: 999.99 for name in bench.HEADLINE}
    line = bench.format_final_line(timings, sf=0.1, n_runs=3, canary_sec=0.1234)
    assert len(line.encode()) < 2000
    assert json.loads(line)["canary_sec"] == 0.1234
    raw = {name: [1.5] for name in bench.HEADLINE}
    detail = bench.format_detail_line(raw, (1.0,), (2.0,), canary_sec=0.1234)
    assert json.loads(detail)["canary_sec"] == 0.1234


def test_canary_measures_fixed_work():
    """The canary is deterministic CPU-bound work: a tiny run returns a
    small positive wall time and scales with n (sanity, not a benchmark
    of the benchmark)."""
    t_small = bench.host_speed_canary(n=20_000, runs=1)
    assert 0 < t_small < 5.0


def test_env_runs_graceful_on_garbage(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "five")
    assert bench._env_runs() == 3
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "7")
    assert bench._env_runs() == 7
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "0")
    assert bench._env_runs() == 1  # clamped to at least one run
    monkeypatch.delenv("SPARK_GRAFT_BENCH_RUNS")
    assert bench._env_runs() == 3
