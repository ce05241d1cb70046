"""Same-host A/B cost receipt for the SRP recall contract (r10 verdict
"Next round" #3).

Round 10 added the in-result recall audit to `sim_srp_lsh_pairs`
(truth = brute-force cosine over the id<_AUDIT_N slice, found decided
truth-side, audit sides derived from the sigs frame). The builder
measured the contract at ~+0.5 s, but the r10 driver row (3.62 s vs
2.30 r09) landed on a 1.2-1.4x-canary host, so the delta kept needing
re-adjudication. This probe pins it: ALTERNATING contract-on /
contract-off executions in ONE Spark session on ONE host (paired, so
ambient drift hits both arms), min-of-N each, with the host canary
sampled before and after. The figures go in SCALE.md next to the +0.5 s
claim.

Usage: python tools/srp_contract_ab.py [sf_dir] [n_runs]
       (default /root/testdata/sf0.1, 5)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import bench
    from cicevse2024_tfm_datapipeline_spark.plans.wave27 import _srp_pairs
    from cicevse2024_tfm_datapipeline_spark.session import get_spark

    canary_start = bench.host_speed_canary()
    spark = get_spark("srp-contract-ab")
    # warmup both arms once (JVM/codegen/parquet footers)
    _srp_pairs(spark, sf_dir, with_audit=True).count()
    _srp_pairs(spark, sf_dir, with_audit=False).count()

    import gc

    on: list[float] = []
    off: list[float] = []
    for _ in range(n_runs):
        for with_audit, sink in ((True, on), (False, off)):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            _srp_pairs(spark, sf_dir, with_audit=with_audit).count()
            sink.append(round(time.perf_counter() - t0, 3))
    canary_end = bench.host_speed_canary()

    print(
        json.dumps(
            {
                "probe": "srp_contract_ab",
                "sf_dir": sf_dir,
                "n_runs": n_runs,
                "contract_on_runs": on,
                "contract_off_runs": off,
                "contract_on_min": min(on),
                "contract_off_min": min(off),
                "contract_cost_sec": round(min(on) - min(off), 3),
                "canaries": [canary_start, canary_end],
            }
        )
    )


if __name__ == "__main__":
    main()
