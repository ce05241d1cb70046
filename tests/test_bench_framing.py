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


def test_final_line_under_budget_worst_case():
    # worst-case envelope: every roster query at 9.99 s SIMULTANEOUSLY
    # (~2.75x the all-time per-query max, 3.62 s r10 sim_srp_lsh_pairs;
    # roster totals run ~40-75 s ALL-IN so 58x9.99 = 579 s is already
    # absurd — and the new canary gate refuses the hosts that could
    # plausibly produce it), plus every optional field at full width:
    # three canary samples and the OUTLIER_MAX_QUERIES-capped rr receipt
    # map ({"pre","post","best"}, r10 verdict #5) on the LONGEST roster
    # names. Budget 2050 < the ~2.1 KB driver tail capture; the byte
    # arithmetic: base line ~1815, each rr receipt ~73 (30-char name +
    # three keyed 4-char figures) — the self-describing receipt keys the
    # r10 verdict demanded cost ~100 bytes of the old 99.99-everywhere
    # <2000 envelope, paid from the envelope, not from the receipts.
    timings = {name: 9.99 for name in bench.HEADLINE}
    longest = sorted(bench.HEADLINE, key=len, reverse=True)
    rr = {
        name: {"pre": 9.999, "post": 9.999, "best": 9.999}
        for name in longest[: bench.OUTLIER_MAX_QUERIES]
    }
    line = bench.format_final_line(
        timings,
        sf=0.1,
        n_runs=3,
        canary_sec=1.3578,
        canaries=[1.3578, 1.3578, 1.3578],
        rr=rr,
    )
    assert len(line.encode()) < 2050, (
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


def test_best_ever_records_reads_committed_artifacts():
    """The outlier rule's record book: per-query best-ever across the
    committed official BENCH_r*.json files — builder side-files excluded,
    unparseable rounds (r06's truncated line) skipped."""
    best = bench.best_ever_records(REPO)
    assert best, "committed BENCH_r*.json artifacts should yield records"
    # r01's a13 record — the figure the r09 verdict's watch item cites
    assert best["a13_roc_auc"] <= 0.605 + 1e-9
    assert best["w_ewma_smoothing"] <= 0.22 + 1e-9
    assert all(v > 0 for v in best.values())


def test_best_ever_records_skips_builder_and_garbage(tmp_path):
    import json as _json

    (tmp_path / "BENCH_r01.json").write_text(
        _json.dumps({"parsed": {"queries": {"q": 1.5, "p": 2.0}}})
    )
    (tmp_path / "BENCH_r02.json").write_text(
        _json.dumps({"parsed": {"queries": {"q": 0.9}}})
    )
    (tmp_path / "BENCH_r03.json").write_text(_json.dumps({"parsed": None}))
    (tmp_path / "BENCH_r04.json").write_text("{not json")
    # builder side-file must NOT contribute (different host discipline)
    (tmp_path / "BENCH_r05_builder.json").write_text(
        _json.dumps({"parsed": {"queries": {"q": 0.1}}})
    )
    best = bench.best_ever_records(str(tmp_path))
    assert best == {"q": 0.9, "p": 2.0}


def test_detect_outliers_flags_caps_and_orders():
    assert bench.OUTLIER_FACTOR == 1.5  # r10 verdict #2b: 1.60x rows must rr
    best = {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0, "e": 1.0, "nobest": 0.0}
    timings = {
        "a": 1.6,   # 1.6x -> flagged (the r10 sample_doremi_weights case)
        "b": 1.4,   # under 1.5x -> clean
        "c": 9.0,   # worst exceedance -> first
        "d": 3.0,
        "e": 2.5,
        "f": 99.0,  # no record -> never flagged (first round of a new query)
        "nobest": 9.0,  # zero record -> guarded, never flagged
    }
    out = bench.detect_outliers(timings, best)
    assert out == ["c", "d", "e", "a"][: bench.OUTLIER_MAX_QUERIES]
    # cap respected when more queries exceed than the budget allows
    wide_best = {f"q{i}": 1.0 for i in range(10)}
    wide_t = {f"q{i}": 5.0 + i for i in range(10)}
    capped = bench.detect_outliers(wide_t, wide_best)
    assert len(capped) == bench.OUTLIER_MAX_QUERIES
    assert capped[0] == "q9"  # worst exceedance first


def test_rerun_and_canary_fields_in_both_lines():
    timings = {name: 1.0 for name in bench.HEADLINE}
    line = bench.format_final_line(
        timings,
        sf=0.1,
        n_runs=3,
        canary_sec=1.1,
        canaries=[1.1, 2.9, 1.2],
        rr={"a_ips_snips_offpolicy": {"pre": 1.2614, "post": 0.8253, "best": 0.58}},
    )
    obj = json.loads(line)
    assert obj["canaries"] == [1.1, 2.9, 1.2]
    # r10 verdict #5: the headline rr receipt is self-sufficient —
    # pre-rerun min, post-rerun min AND the best-ever record, 3dp
    assert obj["rr"] == {
        "a_ips_snips_offpolicy": {"pre": 1.261, "post": 0.825, "best": 0.58}
    }
    detail = bench.format_detail_line(
        {"q": [1.0]},
        (1.0,),
        (2.0,),
        canary_sec=1.1,
        canaries=[1.1, 2.9, 1.2],
        outlier_reruns={
            "w_ewma_smoothing": {
                "first_min": 1.71,
                "rerun_min": 0.22,
                "rerun_runs": [0.3, 0.25, 0.22, 0.24, 0.23],
                "best_ever": 0.22,
            }
        },
        canary_gate=1.15,
    )
    dobj = json.loads(detail)
    assert dobj["canaries"] == [1.1, 2.9, 1.2]
    assert dobj["canary_gate"] == 1.15
    assert dobj["outlier_reruns"]["w_ewma_smoothing"]["best_ever"] == 0.22
    # burst evidence must sit at the END of the detail object so the
    # driver's ~2.1 KB tail capture retains it even when the line truncates
    assert detail.rstrip("}").rfind("outlier_reruns") > detail.rfind("queries_runs")
    # empty rerun map must not emit the key at all (keeps old shape)
    assert "rr" not in json.loads(
        bench.format_final_line(timings, sf=0.1, n_runs=3, rr={})
    )
    # the gate-override note: "off" rides in the detail line when disabled
    off = bench.format_detail_line({"q": [1.0]}, (1.0,), (2.0,), canary_gate="off")
    assert json.loads(off)["canary_gate"] == "off"


def test_canary_gate_threshold_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CANARY_GATE", raising=False)
    assert bench.canary_gate_threshold() == bench.CANARY_GATE_DEFAULT
    monkeypatch.setenv("SPARK_GRAFT_CANARY_GATE", "1.4")
    assert bench.canary_gate_threshold() == 1.4
    for off in ("off", "OFF", "0", "none", "disabled", "-1"):
        monkeypatch.setenv("SPARK_GRAFT_CANARY_GATE", off)
        assert bench.canary_gate_threshold() is None
    monkeypatch.setenv("SPARK_GRAFT_CANARY_GATE", "fast")
    assert bench.canary_gate_threshold() == bench.CANARY_GATE_DEFAULT


def test_canary_gate_check_passes_retries_and_refuses():
    # passes immediately: one sample, no sleeping
    slept: list[float] = []
    ok, samples = bench.canary_gate_check(
        1.15, sample=lambda: 1.05, sleep=slept.append
    )
    assert ok and samples == [1.05] and slept == []
    # disabled gate: always ok, still returns the start sample
    ok, samples = bench.canary_gate_check(None, sample=lambda: 9.9, sleep=slept.append)
    assert ok and samples == [9.9] and slept == []
    # burst settles on the third sample -> roster opens with THAT sample
    readings = iter([1.9, 1.4, 1.08])
    slept = []
    ok, samples = bench.canary_gate_check(
        1.15, sample=lambda: next(readings), sleep=slept.append
    )
    assert ok and samples == [1.9, 1.4, 1.08]
    assert slept == [bench.CANARY_GATE_PAUSE_SEC] * 2
    # never settles -> refuses after CANARY_GATE_RETRIES resamples
    slept = []
    ok, samples = bench.canary_gate_check(
        1.15, sample=lambda: 1.5, sleep=slept.append
    )
    assert not ok
    assert len(samples) == 1 + bench.CANARY_GATE_RETRIES
    # the refusal line: valid compact JSON under a NON-roster metric name
    line = bench.format_gate_refusal_line(samples, 1.15, sf=0.1)
    obj = json.loads(line)
    assert obj["metric"] == "canary_gate_refused"
    assert obj["metric"] != "headline_queries_total_wall"
    assert obj["canary_samples"] == samples and obj["canary_gate"] == 1.15
    assert "queries" not in obj  # best_ever_records can never ingest it
    assert len(line.encode()) < 2000 and "\n" not in line


def test_canary_gate_advisory_by_default(monkeypatch):
    """r11 optimization round: the gate is ADVISORY unless
    $SPARK_GRAFT_CANARY_GATE_STRICT=1 — a persistently slow host (this
    sandbox read canary 2.1 at loadavg 0.34) must still produce the
    contract final line with the queries map; refusal would void the
    official driver artifact entirely. The exceedance evidence moves
    into the detail line instead."""
    monkeypatch.delenv("SPARK_GRAFT_CANARY_GATE_STRICT", raising=False)
    assert not bench.canary_gate_strict()
    for on in ("1", "true", "yes"):
        monkeypatch.setenv("SPARK_GRAFT_CANARY_GATE_STRICT", on)
        assert bench.canary_gate_strict()
    monkeypatch.setenv("SPARK_GRAFT_CANARY_GATE_STRICT", "0")
    assert not bench.canary_gate_strict()
    # detail line carries the flag + every gate sample when exceeded
    detail = bench.format_detail_line(
        {"q": [1.0]},
        (1.0,),
        (2.0,),
        canary_gate=1.15,
        gate_exceeded=True,
        gate_samples=[1.59, 2.09, 1.93, 2.26, 2.51],
    )
    dobj = json.loads(detail)
    assert dobj["gate_exceeded"] is True
    assert dobj["gate_samples"] == [1.59, 2.09, 1.93, 2.26, 2.51]
    # and is absent entirely when the gate passed (old shape preserved)
    clean = bench.format_detail_line({"q": [1.0]}, (1.0,), (2.0,), canary_gate=1.15)
    cobj = json.loads(clean)
    assert "gate_exceeded" not in cobj and "gate_samples" not in cobj


def test_env_runs_graceful_on_garbage(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "five")
    assert bench._env_runs() == 3
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "7")
    assert bench._env_runs() == 7
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "0")
    assert bench._env_runs() == 1  # clamped to at least one run
    monkeypatch.delenv("SPARK_GRAFT_BENCH_RUNS")
    assert bench._env_runs() == 3
