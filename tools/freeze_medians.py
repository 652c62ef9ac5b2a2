"""Fold N bench_full-style JSON runs into one frozen median table.

    python tools/freeze_medians.py run1.json run2.json run3.json

Prints (a) the median-of-runs per-query markdown table in BASELINE.md's
3-queries-per-row format, and (b) the totals line. Used to produce the
per-round freeze table that tools/bench_compare.py reads ("later tables
override earlier ones"), so each round appends ONE authoritative table
instead of hand-merging addition tables.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    runs = [json.loads(open(p).read())["queries"] for p in sys.argv[1:]]
    if not runs:
        sys.exit("usage: freeze_medians.py run1.json [run2.json ...]")
    names = sorted(set().union(*runs))
    med = {}
    for n in names:
        ts = [r[n] for r in runs if n in r and r[n] >= 0]
        if not ts:
            print(f"WARNING: {n} failed in every run", file=sys.stderr)
            continue
        med[n] = statistics.median(ts)
    totals = [round(sum(t for t in r.values() if t >= 0), 1) for r in runs]
    print(f"runs: totals {' / '.join(str(t) for t in totals)} s; "
          f"median-sum {round(sum(med.values()), 1)} s across {len(med)} queries")
    print()
    cells = [f"| {n} | {med[n]:.2f} " for n in sorted(med)]
    while len(cells) % 3:
        cells.append("| — | — ")
    for i in range(0, len(cells), 3):
        print("".join(cells[i : i + 3]) + "|")


if __name__ == "__main__":
    main()
