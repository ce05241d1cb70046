"""SRP ladder growth probe past the old w=16 saturation point (r09).

The r08 verdict's remaining SRP caveat: the occupancy ladder capped at
w=16, so candidate volume was bounded only up to n ~ 8*2^16 ~ 524k
vectors; sf10's 200k corpus already picked w=15 — one doubling from the
cap. Round 9 extended the ladder to w in [8, 24] on a frozen stride-64
coefficient layout (plans/wave27.py). This probe measures candidate
volume and wall at corpus sizes that CROSS the old cap:

    .scratch/sf1    20k vectors  -> ladder width 12
    .scratch/sf10  200k vectors  -> ladder width 15
    .scratch/emb1m   1M vectors  -> ladder width 17  (past the old cap)

(emb1m: tools/make_scale.py --factor 500 --tables embeddings — the
factor-500 isometry family needs the r09 sign-flip extension to stay
duplicate-free.) For each corpus: the REGISTERED query's band shape at
the plan-time ladder width (srp_width_probe.shipped_candidate_pairs),
candidate count, min-of-2 wall, and the growth ratios normalized per
data decade: ratio_decade = (cand_b/cand_a) ** (1/log10(n_b/n_a)).
Healthy = sub-10x per decade (linear would be exactly 10x with constant
occupancy; the ladder trades a little candidate growth for recall as
width rungs land between corpus sizes).

Usage: python tools/srp_ladder_probe.py [dirs...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEFAULT = [
    os.path.join(_REPO, ".scratch", "sf1"),
    os.path.join(_REPO, ".scratch", "sf10"),
    os.path.join(_REPO, ".scratch", "emb1m"),
]


def main() -> None:
    dirs = sys.argv[1:] or _DEFAULT
    from cicevse2024_tfm_datapipeline_spark.session import get_spark
    from tools.srp_width_probe import shipped_candidate_pairs

    spark = get_spark("srp-ladder-probe")
    prev = None
    for d in dirs:
        cand, width = shipped_candidate_pairs(spark, d)
        n_vecs = spark.read.parquet(
            os.path.join(d, "embeddings.parquet")
        ).count()
        best, pairs = float("inf"), -1
        for _ in range(2):
            t0 = time.perf_counter()
            pairs = cand.count()
            best = min(best, time.perf_counter() - t0)
        line = (
            f"{os.path.basename(d)}: n={n_vecs} w={width} "
            f"candidates={pairs} wall={best:.2f}s"
        )
        if prev is not None:
            pn, pp, pw = prev
            decades = math.log10(n_vecs / pn)
            ratio = (pairs / pp) ** (1 / decades) if pp else float("nan")
            wratio = (best / pw) ** (1 / decades) if pw else float("nan")
            line += (
                f"  growth/decade: candidates {ratio:.1f}x wall {wratio:.1f}x"
            )
        print(line, flush=True)
        prev = (n_vecs, pairs, best)


if __name__ == "__main__":
    main()
