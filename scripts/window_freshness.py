"""Driver-window rotation helper: per-query verification staleness.

The driver's CORRECTNESS gate checks a capped prefix (~50 entries) of
``__spark_entry__.queries()``, so the prefix must ROTATE each round
toward the queries whose latest driver row is oldest (or whose code
changed since it). This script reads every checked-in
``CORRECTNESS_r*.json``, reports each registered query's latest driver
round, and prints the suggested next 50-slot prefix: never-driver-seen
queries first, then ascending by latest-verified round, registration
order as the tiebreak.

Usage: python scripts/window_freshness.py [--window 50]
"""

from __future__ import annotations

import argparse
import glob
import importlib.util
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def registered_queries() -> list[str]:
    spec = importlib.util.spec_from_file_location(
        "_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.queries())


def latest_driver_round() -> dict[str, int]:
    """query name -> highest round with a driver row (pass or fail)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    names = registered_queries()
    latest = latest_driver_round()
    order = {n: i for i, n in enumerate(names)}
    ranked = sorted(names, key=lambda n: (latest.get(n, 0), order[n]))

    print(f"{'query':40s} {'last driver row':>15s}")
    for n in ranked:
        rnd = latest.get(n)
        print(f"{n:40s} {('r%02d' % rnd) if rnd else 'NEVER':>15s}")

    stale = [n for n in ranked if latest.get(n, 0) == 0]
    print(f"\n{len(names)} registered; {len(stale)} never driver-verified")
    print(f"\nSuggested next {args.window}-slot prefix (stalest first):")
    for n in ranked[: args.window]:
        print(f'        "{n}": q_{n},')


if __name__ == "__main__":
    main()
