"""Dump `.explain("formatted")` for queries to plans/<tag>/<name>_<suffix>.txt.

The optimization-round evidence artifact: before/after physical plans for
every touched query (the judge checks plan claims against these files).

Usage:
    python tools/dump_plans.py --suffix before [--sf DIR] [--only a,b] [--tag r11]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default="")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--tag", default="r11")
    args = ap.parse_args()

    from bench import HEADLINE

    from cicevse2024_tfm_datapipeline_spark.plans import load_all
    from cicevse2024_tfm_datapipeline_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans")
    queries = load_all()
    names = args.only.split(",") if args.only else list(HEADLINE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = queries[name].spark(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)


if __name__ == "__main__":
    main()
