"""Driver-window rotation helper (VERDICT r6 #1 discipline, made a
one-command step for every future round): prints the queries that have
NEVER earned a driver row in any CORRECTNESS_r0*.json, grouped by
whether they are already in the current window. Fill next round's 25
rotation slots exclusively from the "never rowed, not in window" list,
bump ROTATION_BASE_ROUND in __spark_entry__.py, and
tests/test_r7_window.py keeps the discipline honest. Usage::

    python scripts/rotation_candidates.py
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    rowed = set()
    for f in sorted(glob.glob("CORRECTNESS_r[0-9]*.json")):
        rowed |= set(json.load(open(f)).keys())
    spec = importlib.util.spec_from_file_location(
        "se", os.path.join(os.getcwd(), "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    window = list(mod.DRIVER_WINDOW)
    from python_cdc_component_spark.queries import ORACLES, QUERIES
    never = [q for q in QUERIES if q not in rowed]
    in_window = [q for q in never if q in window]
    candidates = [q for q in never if q not in window]
    print(f"queries: {len(QUERIES)}  driver-rowed ever: {len(rowed)}")
    print(f"never rowed: {len(never)}  (in current window, will row "
          f"this round: {len(in_window)})")
    print(f"\nrotation candidates for the NEXT window "
          f"({len(candidates)}):")
    for q in candidates:
        tag = "" if q in ORACLES else "  [NO ORACLE]"
        print(f"  {q}{tag}")

    # Post-completion discipline (round 10+): once never-rowed runs
    # dry, filler slots refresh the STALEST rows (smallest last-rowed
    # round, alphabetical within a tier; pinned flagships excluded).
    last = {}
    for f in sorted(glob.glob("CORRECTNESS_r[0-9]*.json")):
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r"):-len(".json")])
        for k in json.load(open(f)):
            last[k] = max(last.get(k, 0), rnd)
    pinned = set(window[:25])
    pool = sorted((r, q) for q, r in last.items()
                  if q in QUERIES and q not in pinned)
    n_fill = 25 - len(candidates) - len(in_window)
    if n_fill > 0:
        print(f"\nstaleness filler for the NEXT window ({n_fill} of "
              f"{len(pool)} rowed non-pinned):")
        for r, q in pool[:n_fill]:
            print(f"  r{r}  {q}")


if __name__ == "__main__":
    main()
