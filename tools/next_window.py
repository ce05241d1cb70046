"""Materialize the next round's certification window from _ROTATION_RULE.

Reads the committed CORRECTNESS_r01..r0N artifacts (explicit range — the
same discipline as tests/test_coverage_doc.py), the registry's raw
registration order and oracle map, and an optional comma-separated list
of changed-plan names, then prints the 50-name window as a ready-to-paste
``_PRIORITY`` literal. The window policy itself lives in
``plans/__init__._ROTATION_RULE`` / ``rotation_window()``; this CLI only
feeds it the current ledger state.

Usage:
    python tools/next_window.py --rounds 8 [--changed name1,name2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def latest_driven(last_round: int) -> dict[str, int]:
    latest: dict[str, int] = {}
    for r in range(1, last_round + 1):
        path = os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")
        if not os.path.exists(path):
            raise SystemExit(f"missing committed artifact: {path}")
        for name in json.load(open(path)):
            latest[name] = r
    return latest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--rounds",
        type=int,
        required=True,
        help="highest committed CORRECTNESS round number (artifacts "
        "r01..rN are read; all must exist)",
    )
    ap.add_argument(
        "--changed",
        default="",
        help="comma-separated changed-plan names in re-drive priority "
        "order (the round's _R0x_CHANGED declaration)",
    )
    args = ap.parse_args()

    from cicevse2024_tfm_datapipeline_spark import plans
    from cicevse2024_tfm_datapipeline_spark.plans import load_all
    from cicevse2024_tfm_datapipeline_spark.plans.registry import registry

    load_all()
    reg = registry()
    latest = latest_driven(args.rounds)
    changed = [n for n in args.changed.split(",") if n]
    unknown = [n for n in changed if n not in reg]
    if unknown:
        raise SystemExit(f"--changed names not registered: {unknown}")
    window = plans.rotation_window(
        registration_order=list(reg),
        oracled={n for n, q in reg.items() if q.oracle is not None},
        latest_round=latest,
        changed=changed,
    )
    never = [n for n in window if n not in latest]
    print(f"# window after r{args.rounds:02d}: {len(window)} names "
          f"({len(never)} never-driven, {len(changed)} declared changed)")
    print("_PRIORITY = [")
    for n in window:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
