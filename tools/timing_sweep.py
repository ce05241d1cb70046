"""Whole-registry timing sweep (Spark side only) — the scale smoke test.

Runs EVERY registered query at --sf (default sf0.1) once cold + once warm
and prints per-query wall seconds sorted descending, flagging outliers.
Complements bench.py (curated headliners, min-of-2) by catching the
long tail: a query that is pathologically slow at 10× data but green at
sf0.01 shows up here first — exactly how the single-partition shingle
explode in dedup_duplicate_spans was caught.

Usage: python tools/timing_sweep.py [--sf DIR] [--threshold SEC]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--threshold", type=float, default=5.0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from cicevse2024_tfm_datapipeline_spark.plans import load_all
    from cicevse2024_tfm_datapipeline_spark.session import get_spark

    spark = get_spark("timing-sweep")
    queries = load_all()
    import gc

    timings: dict[str, float] = {}
    for name, q in queries.items():
        best = float("inf")
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                q.spark(spark, args.sf).count()
                best = min(best, time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001
            print(f"[ERROR] {name}: {e}", flush=True)
            continue
        timings[name] = round(best, 3)
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        flag = "  <-- SLOW" if sec > args.threshold else ""
        print(f"{sec:8.3f}  {name}{flag}", flush=True)
    total = round(sum(timings.values()), 3)
    print(f"\n{len(timings)} queries, total {total}s (min-of-2 each)")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"sf_dir": args.sf, "total": total, "queries": timings}, fh, indent=1)


if __name__ == "__main__":
    main()
