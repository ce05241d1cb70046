"""Physical-plan audit: prints the scale-relevant plan features for the
headline queries — filter/column pushdown into the parquet scan, join
strategies, exchange (shuffle) counts, codegen coverage.

Usage: python tools/explain_audit.py [--sf DIR] [--only name1,name2] [--full]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    from cicevse2024_tfm_datapipeline_spark.plans import load_all
    from cicevse2024_tfm_datapipeline_spark.session import get_spark

    spark = get_spark("explain-audit")
    queries = load_all()
    from bench import HEADLINE

    names = args.only.split(",") if args.only else HEADLINE
    for name in names:
        df = queries[name].spark(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        if args.full:
            print(f"==== {name} ====\n{plan}\n")
            continue
        n_exchange = len(re.findall(r"\bExchange\b|\bShuffle\b", plan.split("\n\n")[0]))
        joins = sorted(set(re.findall(r"(\w*HashJoin\w*|SortMergeJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan)))
        scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        # Under AQE the pre-execution plan hides WholeStageCodegen (stages
        # are compiled as they execute), so codegen coverage must be read
        # off the EXECUTED plan: run the query, then count distinct
        # codegen ids (`*(n)` operator prefixes) in the final plan.
        df.collect()
        final = df._jdf.queryExecution().executedPlan().toString()
        codegen = len(set(re.findall(r"\*\((\d+)\)", final)))
        print(f"==== {name}")
        print(f"  exchanges(top-plan): {n_exchange}  joins: {joins or '-'}  codegen-spans(executed): {codegen}")
        for i, (f, s) in enumerate(zip(scans, schemas)):
            cols = [c.split(":")[0] for c in s.split(",") if c]
            print(f"  scan{i}: pushed=[{f[:80]}] cols={cols}")
        print()


if __name__ == "__main__":
    main()
