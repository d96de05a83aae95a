"""Registry-wide broadcast-build audit (r13 VERDICT #5).

The session's 64 MB autoBroadcastJoinThreshold produced fact-table
broadcasts at sf0.1 that could never broadcast at 100 TB (q5/q21/assoc,
found by hand and fixed with shuffle_hash hints in r13). This tool
finds the remaining ones MECHANICALLY: it executes queries, walks each
EXECUTED adaptive plan (the exchange_reuse_audit py4j walk), and for
every BroadcastExchange/BroadcastQueryStage records

  - the broadcast's runtime numOutputRows + dataSize metrics,
  - which SCALE-BEARING table scans sit in its build subtree
    (lineitem/orders/customer/supplier/part/documents/events/
    embeddings — everything that grows with SF; region/nation are
    constant-size and never flagged),
  - the max numOutputRows among those scans.

A broadcast is FLAGGED when its build subtree reads a scale-bearing
table AND its output rows are >= FLAG_FRACTION of that scan's rows AND
>= FLAG_MIN_ROWS — i.e. the build side is fact-shaped, not a
genuinely-reducing aggregate/filter. Such a side cannot broadcast at
scale: the plan only works because the whole SF fits under the local
threshold. (A flagged site is a *candidate*: the fix is a shuffle_hash
hint or restructure, verified per query against the oracle.)

Usage: python tools/broadcast_audit.py [sf_dir] [name ... | --all]
Prints one JSON line; per-query progress on stderr.
"""

from __future__ import annotations

import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SCALE_TABLES = (
    "lineitem", "orders", "customer", "supplier", "part",
    "documents", "events", "embeddings",
)
FLAG_FRACTION = 0.10
FLAG_MIN_ROWS = 5_000


def _metric(node, name: str):
    m = node.metrics()
    if m.contains(name):
        return m.apply(name).value()
    return None


def _scan_tables(desc: str) -> list[str]:
    return [t for t in SCALE_TABLES if f"{t}.parquet" in desc or f"/{t}" in desc]


def broadcast_census(jplan) -> list[dict]:
    """All broadcast builds in an executed plan with their runtime
    metrics and the scale-bearing scans feeding them."""
    out: list[dict] = []
    seen_subqueries = set()

    def scan_walk(node, acc):
        """Collect (table, rows) for file scans under a broadcast build."""
        name = node.getClass().getSimpleName()
        if name in ("ReusedExchangeExec", "ReusedSubqueryExec"):
            return
        if name in ("InMemoryTableScanExec", "TableCacheQueryStageExec"):
            # a cached input: its build plan executed elsewhere; treat the
            # cache as opaque (size-bounded by what was persisted)
            acc.append(("__cache__", _metric(node, "numOutputRows")))
            return
        if name == "AdaptiveSparkPlanExec":
            scan_walk(node.executedPlan(), acc)
            return
        if name.endswith("QueryStageExec"):
            scan_walk(node.plan(), acc)
            return
        if name == "FileSourceScanExec":
            desc = node.toString().splitlines()[0]
            for t in _scan_tables(desc):
                acc.append((t, _metric(node, "numOutputRows")))
        kids = node.children()
        for i in range(kids.size()):
            scan_walk(kids.apply(i), acc)

    def walk(node):
        name = node.getClass().getSimpleName()
        if name in ("ReusedExchangeExec", "ReusedSubqueryExec"):
            return
        if name in ("InMemoryTableScanExec", "TableCacheQueryStageExec"):
            return
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name == "BroadcastQueryStageExec":
            inner = node.plan()  # BroadcastExchangeExec (or reused)
            iname = inner.getClass().getSimpleName()
            if iname == "BroadcastExchangeExec":
                acc: list = []
                scan_walk(inner, acc)
                rows = _metric(inner, "numOutputRows")
                out.append({
                    "rows": rows,
                    "data_bytes": _metric(inner, "dataSize"),
                    "scans": acc,
                })
                walk(inner)
            else:
                walk(inner)
            return
        if name == "BroadcastExchangeExec":
            # non-AQE path (uncommon here) — same treatment
            acc = []
            scan_walk(node, acc)
            out.append({
                "rows": _metric(node, "numOutputRows"),
                "data_bytes": _metric(node, "dataSize"),
                "scans": acc,
            })
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        sqs = node.subqueries()
        for i in range(sqs.size()):
            sq = sqs.apply(i)
            if sq.id() not in seen_subqueries:
                seen_subqueries.add(sq.id())
                walk(sq)
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(jplan)
    return out


def main() -> None:
    from sparkga1_spark.operators.cache import release_tracked
    from sparkga1_spark.plans.registry import all_queries
    from sparkga1_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    args = sys.argv[2:]
    qs = all_queries()
    names = list(qs) if (not args or args == ["--all"]) else args
    spark = get_spark("broadcast-audit")
    out = {}
    failed = []
    n_flagged = 0
    for name in names:
        release_tracked()
        try:
            df = qs[name](spark, sf_dir)
            df.collect()
            jplan = df._jdf.queryExecution().executedPlan()
            bcasts = broadcast_census(jplan)
        except Exception as e:  # a broken query must fail the audit run
            failed.append(name)
            print(f"# {name}: ERROR {e}", file=sys.stderr)
            continue
        flagged = []
        for b in bcasts:
            rows = b["rows"] or 0
            fact_rows = max(
                (r or 0 for t, r in b["scans"] if t != "__cache__"),
                default=0,
            )
            if (
                b["scans"]
                and rows >= FLAG_MIN_ROWS
                and fact_rows > 0
                and rows >= FLAG_FRACTION * fact_rows
            ):
                flagged.append({
                    "rows": rows,
                    "data_bytes": b["data_bytes"],
                    "scans": [[t, r] for t, r in b["scans"]],
                })
        if flagged:
            n_flagged += 1
            print(f"# {name}: FLAGGED {flagged}", file=sys.stderr)
        out[name] = {
            "n_broadcasts": len(bcasts),
            "max_broadcast_rows": max((b["rows"] or 0 for b in bcasts),
                                      default=0),
            "flagged": flagged,
        }
    print(json.dumps({
        "sf_dir": sf_dir,
        "flag_fraction": FLAG_FRACTION,
        "flag_min_rows": FLAG_MIN_ROWS,
        "n_queries": len(out),
        "n_flagged": n_flagged,
        "queries": out,
        "failed": failed,
    }))
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
