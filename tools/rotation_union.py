"""Regenerate the gate-rotation age union from the CORRECTNESS
artifacts — the r7/r8 verdict rule ("regenerate the list from the
artifact union, not the narrative") as a tool instead of a per-round
hand computation.

For every query, the latest round with a green driver row
(rows_match && err == null) is computed across CORRECTNESS_r*.json;
the output lists the age histogram and the oldest-first candidate
window for the next round (the driver caps its run at the FIRST 50
entries of queries() — see registry.set_gate_order).

Usage: python tools/rotation_union.py [window_size]
Prints a human-readable summary and one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_green() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", f)
        rnd = int(m.group(1))
        d = json.load(open(f))
        for name, row in d.items():
            if (
                isinstance(row, dict)
                and row.get("err") is None
                and row.get("rows_match")
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    latest = latest_green()
    sys.path.insert(0, _REPO)
    from sparkga1_spark.plans.registry import all_queries

    registered = list(all_queries())
    never = [q for q in registered if q not in latest]
    hist = Counter(latest[q] for q in registered if q in latest)
    print("age histogram (latest green round -> count):",
          dict(sorted(hist.items())), file=sys.stderr)
    if never:
        print("NEVER-GREEN (must front):", never, file=sys.stderr)
    by_age = sorted(
        (q for q in registered if q in latest), key=lambda q: (latest[q], q)
    )
    candidate = never + by_age[: window - len(never)]
    print(f"oldest-first candidate window ({window}):", file=sys.stderr)
    for q in candidate:
        print(f"  {q}  (r{latest.get(q, 0)})", file=sys.stderr)
    print(json.dumps({
        "n_registered": len(registered),
        "never_green": never,
        "age_histogram": dict(sorted(hist.items())),
        "candidate_window": candidate,
    }))


if __name__ == "__main__":
    main()
