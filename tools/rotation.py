"""Driver-row rotation bookkeeping (VERDICT r9 list #2 workflow).

For every registry key, find the newest ROUND whose CORRECTNESS_r*.json
records a green row (rows+schema+hash match, or rows-only by design),
then print the stale cohorts oldest-first — the exact ordering the next
round's ``_CHECK_FIRST`` rotation block should consume. The 50-slot
driver window is the budget: changed-plan keys come first, then this
list fills the rest.

Usage: python tools/rotation.py [--before N]   (default N = current-4)
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_green_rows() -> dict[str, int]:
    newest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f)[13:15])
        for key, v in json.load(open(f)).items():
            if v.get("err") == "no_oracle":
                # rows-only by design: green iff the query ran and
                # produced rows (the driver's weaker check)
                green = (v.get("spark_rows") or 0) > 0
            else:
                green = bool(v.get("rows_match")
                             and v.get("schema_match", True)
                             and v.get("hash_match", True))
            if green:
                newest[key] = max(newest.get(key, 0), rnd)
    return newest


def main() -> None:
    sys.path.insert(0, REPO)
    import __spark_entry__ as E
    keys = set(E.queries())
    newest = newest_green_rows()
    latest = max(newest.values(), default=0)
    before = latest - 3
    if "--before" in sys.argv:
        before = int(sys.argv[sys.argv.index("--before") + 1])
    never = sorted(keys - set(newest))
    stale = sorted(((newest[k], k) for k in keys & set(newest)
                    if newest[k] < before))
    print(f"# latest recorded round: r{latest:02d}; "
          f"stale = newest green row < r{before:02d}")
    if never:
        print(f"# NEVER-ROWED ({len(never)}) — queue these first:")
        for k in never:
            print(f"  - {k}")
    print(f"# stale cohort ({len(stale)}), oldest first:")
    for rnd, k in stale:
        print(f"  r{rnd:02d}  {k}")


if __name__ == "__main__":
    main()
