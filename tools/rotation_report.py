"""Driver-window rotation report: what the next round's _PRIORITY front
should contain, COMPUTED from the repo's own CORRECTNESS_r*.json evidence.

Round 6's lesson (VERDICT r6 "What's wrong #1"): the window was rotated by
hand-estimated counts and missed the stale-FAIL block three rounds running.
tests/test_rotation.py asserts the invariants; this tool prints the work
list for the human (or agent) rebuilding queries.py's _PRIORITY next round.

Usage: python tools/rotation_report.py [window_size]

Prints, in order:
  1. entries whose LAST driver row is a FAIL            (must lead the window)
  2. entries never driver-checked, in catalog order     (fill the window,
                                                         overflow front-loads
                                                         the round after)
  3. entries whose last green row is oldest             (staleness tail)
The caller still prepends any entry whose code changed since its last green
row — that context lives in the working tree, not the evidence files.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def evidence():
    checked, last = set(), {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        for name, row in json.load(open(path)).items():
            checked.add(name)
            ok = bool(row.get("hash_match")) if isinstance(row, dict) else False
            prev = last.get(name)
            if prev is None or rnd >= prev[0]:
                last[name] = (rnd, ok)
    return checked, last


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from ffn_polars_spark.queries import QUERY_FNS

    names = list(QUERY_FNS)
    checked, last = evidence()

    stale_fail = [n for n in names if n in last and not last[n][1]]
    never = [n for n in names if n not in checked]
    green = sorted(
        (n for n in names if n in last and last[n][1]),
        key=lambda n: last[n][0],
    )

    print(f"catalog: {len(names)} entries; window: {window}")
    print(f"\n1. stale-FAIL (last driver row failed) — {len(stale_fail)}:")
    for n in stale_fail:
        print(f"   {n}  (r{last[n][0]})")
    print(f"\n2. never driver-checked — {len(never)}:")
    for n in never[: window]:
        print(f"   {n}")
    if len(never) > window:
        print(f"   ... and {len(never) - window} more (front-load the round after)")
    budget = window - len(stale_fail) - min(len(never), window)
    # print the tail to the WINDOW budget, not a fixed 15 — round 12's
    # whole-tail refresh needed all 47 names and had to re-derive them
    # by hand from the evidence files
    print(f"\n3. oldest green rows (staleness tail; window slots left ≈ {max(budget, 0)}):")
    for n in green[: max(budget, 0) or 15]:
        print(f"   {n}  (green r{last[n][0]})")
    print(
        "\nRemember: prepend entries whose CODE changed since their last"
        " green row, and keep 2-3 canaries from a green block."
    )


if __name__ == "__main__":
    main()
