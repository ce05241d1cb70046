"""Per-query build/exec split profiler (optimization round instrument).

For each headline query, measures the three components of one bench run
(bench.py times ``q.spark(spark, sf_dir).count()``):

- build_s: Python DataFrame construction — py4j expression building plus
  any EAGER plan-time driver work (approxQuantile bound passes, ladder
  counts, CI collects);
- first_s: first ``.count()`` on the fresh DataFrame — Catalyst
  analysis/optimization + execution (localCheckpoints materialize here);
- second_s: a second ``.count()`` on the SAME DataFrame object —
  re-executes the physical plan with analysis cached and checkpoint
  blocks already materialized, so it approximates pure re-execution.

bench-run cost ~= build_s + first_s. The gap (build_s + first_s -
second_s) is the per-run plan/driver constant — invariant in data size,
i.e. the part that vanishes against executor work at 100 TB (SCALE.md
"where the bench time actually goes").

Usage: python tools/plansplit.py [--sf DIR] [--only a,b] [--runs N] [--out F]
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
    ap.add_argument("--only", default="")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from bench import HEADLINE

    from cicevse2024_tfm_datapipeline_spark.plans import load_all
    from cicevse2024_tfm_datapipeline_spark.session import get_spark

    spark = get_spark("plansplit")
    queries = load_all()
    names = args.only.split(",") if args.only else list(HEADLINE)

    # warmup (bench contract: JVM/codegen/footer caches absorbed once)
    queries["w1_chrono_split_counts"].spark(spark, args.sf).count()

    import gc

    report: dict[str, dict] = {}
    for name in names:
        q = queries[name]
        best = {"build_s": float("inf"), "first_s": float("inf"), "second_s": float("inf")}
        for _ in range(max(1, args.runs)):
            spark.sparkContext.setJobDescription(f"plansplit:{name}")
            t0 = time.perf_counter()
            df = q.spark(spark, args.sf)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            df.count()
            t3 = time.perf_counter()
            best["build_s"] = min(best["build_s"], t1 - t0)
            best["first_s"] = min(best["first_s"], t2 - t1)
            best["second_s"] = min(best["second_s"], t3 - t2)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        row = {k: round(v, 3) for k, v in best.items()}
        row["bench_s"] = round(best["build_s"] + best["first_s"], 3)
        report[name] = row
        print(
            f"{row['bench_s']:7.3f}  build {row['build_s']:6.3f}  "
            f"first {row['first_s']:6.3f}  second {row['second_s']:6.3f}  {name}",
            flush=True,
        )
    total = round(sum(r["bench_s"] for r in report.values()), 3)
    print(f"\n{len(report)} queries, bench-style total {total}s")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"sf_dir": args.sf, "total": total, "queries": report}, fh, indent=1)


if __name__ == "__main__":
    main()
