"""W3 tensor-path scaling probe (r05 verdict item 6).

`sliding_windows` (the ARRAY-MATERIALIZING W3 variant behind the tensor
sink) is the one §2 operator whose 100x behavior was argued in SCALE.md
(row width O(features·seq_len)) but absent from the measured probe table.
This probe measures it at the reference shape — seq_len 30 × 70 features
(func_aux/func_preproc.py builds 30-step windows over ~70 power
channels) — against `windows_via_pandas` (per-group NumPy striding) on
the same frame, at sf0.001/sf0.01/sf0.1, so SCALE.md can state a measured
cutover rule instead of an argument.

The 70 features are derived projections of events.value (value + k):
Catalyst cannot collapse the 70 collect_list frame aggregates into one,
so the measured cost is the real 70-channel row-width behavior; user_id
partitions the window (events has ~1k users at sf0.1 — wide groups,
narrow count, the stress case for per-group striding).

Usage: python tools/w3_tensor_probe.py [--seq-len 30] [--n-feat 70]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq-len", type=int, default=30)
    ap.add_argument("--n-feat", type=int, default=70)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cicevse2024_tfm_datapipeline_spark.operators.windows import (
        sliding_windows,
        windows_via_pandas,
    )
    from cicevse2024_tfm_datapipeline_spark.session import get_spark
    from cicevse2024_tfm_datapipeline_spark.sources.readers import load_table

    spark = get_spark("w3-tensor-probe")
    feats = [f"f{i:02d}" for i in range(args.n_feat)]

    def frame(sf_dir):
        ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
        for i, f in enumerate(feats):
            ev = ev.withColumn(f, F.col("value") + F.lit(float(i)))
        return ev

    # warmup
    frame(SFS[0]).count()

    print(f"seq_len={args.seq_len} n_feat={args.n_feat} loadavg={os.getloadavg()}")
    print(f"{'variant':22s} {'sf.001':>7s} {'sf.01':>7s} {'sf.1':>7s} {'x100 ratio':>10s}")
    for label, fn in (
        ("sliding_windows", sliding_windows),
        ("windows_via_pandas", windows_via_pandas),
    ):
        walls = []
        for sf in SFS:
            ev = frame(sf)
            kwargs = dict(
                group_cols=["user_id"],
                time_col="ts",
                tiebreak_col="event_id",
                features=feats,
                seq_len=args.seq_len,
                step=1,
            )
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                # noop sink: forces FULL materialization of the window
                # arrays (a bare count() lets Catalyst prune the 70
                # collect_list aggregates from the JVM variant's plan,
                # which would measure nothing)
                fn(ev, **kwargs).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            walls.append(best)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        ratio = walls[2] / walls[0] if walls[0] > 0 else float("inf")
        print(
            f"{label:22s} {walls[0]:7.2f} {walls[1]:7.2f} {walls[2]:7.2f} {ratio:9.1f}x",
            flush=True,
        )
    print(f"loadavg after={os.getloadavg()}")


if __name__ == "__main__":
    main()
