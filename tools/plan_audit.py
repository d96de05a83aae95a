"""Registry-wide physical-plan audit → PLAN_AUDIT_r{N}.json.

Walks every registered query, builds its (AQE-initial) executed plan
WITHOUT collecting results, and records the plan-shape facts the
per-query guards in tests/test_plans.py assert piecemeal:

- exchanges / broadcast exchanges / sort-merge vs broadcast-hash joins
- Python boundaries: MapInPandas / FlatMapGroupsInPandas (the three
  sanctioned Arrow surfaces) vs scalar Batch/ArrowEvalPython (never
  allowed in relational plans)
- CartesianProduct (never allowed); BroadcastNestedLoopJoin is counted
  but EXPECTED where it appears — every instance in this registry is a
  broadcast of a 1-ROW aggregate (corpus totals / thresholds / bounds),
  the documented pattern for attaching global scalars without a
  driver-side collect
- WholeStageCodegen span count (wider = more of the plan fused)

The companion registry-wide guarantee lives in
tests/test_plans.py::test_registry_wide_plan_hygiene.

Usage: python tools/plan_audit.py <round> [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

MARKS = {
    "exchanges": "Exchange",
    "broadcast_exchanges": "BroadcastExchange",
    "sort_merge_joins": "SortMergeJoin",
    "broadcast_hash_joins": "BroadcastHashJoin",
    "cartesian": "CartesianProduct",
    "bnl_joins": "BroadcastNestedLoopJoin",
    "map_in_pandas": "MapInPandas",
    "grouped_pandas": "FlatMapGroupsInPandas",
}


def audit_plan(plan: str) -> dict:
    out = {k: plan.count(v) for k, v in MARKS.items()}
    # BroadcastExchange also contains "Exchange"; report shuffle-only
    out["exchanges"] -= out["broadcast_exchanges"]
    # scalar Python eval nodes, NOT the sanctioned Arrow group/map surfaces
    out["scalar_python"] = len(re.findall(r"(?:Batch|Arrow)EvalPython", plan))
    # executedPlan().toString() marks codegen stages as "*(n) Operator"
    out["codegen_spans"] = len(set(re.findall(r"\*\((\d+)\)", plan)))
    return out


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        _REPO, f"PLAN_AUDIT_r{rnd}.json"
    )

    from sparkga1_spark.operators.cache import release_tracked
    from sparkga1_spark.plans.registry import all_queries
    from sparkga1_spark.session import get_spark

    spark = get_spark("plan-audit")
    results, flagged = {}, []
    for name, fn in all_queries().items():
        release_tracked()
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            row = audit_plan(plan)
        except Exception as e:  # noqa: BLE001
            row = {"error": f"{type(e).__name__}: {e}"}
        results[name] = row
        if row.get("cartesian") or row.get("scalar_python"):
            flagged.append(name)
        print(f"{name:40s} {row}", file=sys.stderr)

    summary = {
        "round": rnd,
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "flagged_cartesian_or_scalar_python": flagged,
        "totals": {
            k: sum(r.get(k, 0) for r in results.values() if "error" not in r)
            for k in [*MARKS, "scalar_python", "codegen_spans"]
        },
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"{len(results)} plans audited, flagged={flagged} -> {out_path}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
