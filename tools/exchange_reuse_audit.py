"""Post-execution exchange-reuse audit (r7 VERDICT #7; registry-wide r9).

PLAN_AUDIT records AQE-INITIAL plans, where `reused_exchanges` is
always 0 — ReusedExchange is installed by AQE at RUNTIME when two
identical exchange subtrees materialize. This tool EXECUTES queries
and captures the final adaptive plan afterwards, counting Exchange vs
ReusedExchange nodes — answering whether Spark de-duplicates a shared
subtree at runtime or actually rebuilds it.

Measured (r8, sf0.01): reused_exchanges = 0 on EVERY sampled query —
AQE's exchange reuse never fired across diverging aggregate branches,
so a subtree consumed by two branches really does rebuild (the
x_dau_wau / x_cohort_retention distinct scanned events once PER
BRANCH). Fix applied: tracked_persist on the multiply-consumed
distinct in both queries (inmemory_scans 2/3 confirm the cache is
live). Queries whose shared subtree is FACT-SIZED (x_bigram_lm's
bigram stream) stay unpersisted by design — two streaming passes beat
caching a corpus-sized frame at 100 TB.

r9 adds the registry-wide sweep (`--all`, r8 VERDICT #5) and a
duplicate-scan detector built on a py4j PHYSICAL-TREE walk
(physical_scan_census): every FileSourceScanExec reached through real
children()/QueryStage.plan()/first-sighting subqueries — cached build
plans are not children of InMemoryTableScanExec, and Reused* nodes
re-execute nothing, so the text-reprint inflation that defeats string
counting cannot occur. A descriptor appearing k>1 times means the same
source projection truly executes k times in one run. That is only a
defect when the duplicated SUBTREE above the scan is both expensive
and small-output (persist candidates); deliberate two-pass designs
(q11's streamed total, decontaminate's second map-only scan, the
text-scoring families' two corpus passes) read the same scan twice by
documented choice.

Usage: python tools/exchange_reuse_audit.py [sf_dir] [name ... | --all]
Prints one JSON line (and per-query progress on stderr).
"""

from __future__ import annotations

import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Default sample: queries that consume a non-persisted subtree twice.
SAMPLE = [
    "x_dau_wau_stickiness",      # distinct (user, day) -> dau + wau cov
    "tpch_q11_important_stock",  # scoped fact join -> total + group agg
    "x_bigram_lm_logprob",       # bigram stream -> counts + score join
    "x_inverted_index",          # token stream -> df + postings
    "x_cohort_retention",        # first-day frame -> cohort + activity
]


def physical_scan_census(jplan) -> dict:
    """Walk the EXECUTED physical-plan TREE via py4j (r9): text parsing
    cannot scope cached build plans — InMemoryRelation.toString()
    reprints its cacheBuilder subtree with restarted indentation — but
    in the real tree a cached build plan is NOT a child of
    InMemoryTableScanExec, a reused exchange/subquery has no re-executed
    subtree, and an AQE query stage's subtree hangs off .plan().
    Returns {'file_scans': {normalized desc: count}, 'inmemory': n,
    'exchanges': n, 'reused_exchanges': n} counting each node exactly
    once per EXECUTION."""
    out = {"file_scans": {}, "inmemory": 0, "exchanges": 0,
           "reused_exchanges": 0}
    seen_subqueries = set()

    def walk(node):
        name = node.getClass().getSimpleName()
        if name in ("ReusedExchangeExec", "ReusedSubqueryExec"):
            out["reused_exchanges"] += name == "ReusedExchangeExec"
            return
        if name == "InMemoryTableScanExec" or name == "TableCacheQueryStageExec":
            out["inmemory"] += 1
            return
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            out["exchanges"] += 1  # a materialized exchange stage
            walk(node.plan())
            return
        if name.endswith("ExchangeExec"):
            out["exchanges"] += 1
        if name == "FileSourceScanExec":
            desc = re.sub(r"#\d+[A-Za-z]*", "#x", node.toString().splitlines()[0])
            out["file_scans"][desc[:160]] = out["file_scans"].get(desc[:160], 0) + 1
        # uncorrelated subqueries execute once each — count their plans,
        # but only the first sighting of each exprId (every consumer
        # expression references the same SubqueryExec instance)
        sqs = node.subqueries()
        for i in range(sqs.size()):
            sq = sqs.apply(i)
            key = sq.id()
            if key not in seen_subqueries:
                seen_subqueries.add(key)
                walk(sq)
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(jplan)
    return out


def _tree_prefix_len(line: str) -> int:
    """Length of the plan-tree drawing prefix (spaces, ':', '+', '-',
    '*', digits, parens) before the node name — a proxy for depth."""
    m = re.match(r"^[\s:+\-*()0-9]*", line)
    return m.end() if m else 0


def _strip_initial_sections(plan: str) -> str:
    """Drop every '== Initial Plan ==' section (a finalized
    AdaptiveSparkPlan prints BOTH sections, nested ones included —
    counting them doubles every node that survived re-planning)."""
    out = []
    skip_stack: list[int] = []
    for line in plan.splitlines():
        depth = _tree_prefix_len(line)
        # section CONTENT prints at the same prefix length as the
        # marker (the marker's '+- ' is part of its tree prefix), so
        # the section ends strictly shallower; an Initial section is
        # always the LAST child of its AdaptiveSparkPlan block, so no
        # same-depth sibling follows it
        while skip_stack and depth < skip_stack[-1]:
            skip_stack.pop()
        if skip_stack:
            continue
        if "== Initial Plan ==" in line:
            skip_stack.append(depth)
            continue
        out.append(line)
    return "\n".join(out)


def main() -> None:
    from sparkga1_spark.operators.cache import release_tracked
    from sparkga1_spark.plans.registry import all_queries
    from sparkga1_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    args = sys.argv[2:]
    qs = all_queries()
    names = list(qs) if args == ["--all"] else (args or SAMPLE)
    spark = get_spark("exchange-reuse-audit")
    out = {}
    failed = []
    for name in names:
        release_tracked()
        try:
            df = qs[name](spark, sf_dir)
            # collect() executes THIS DataFrame's own QueryExecution —
            # count() would wrap it in a new aggregate plan and leave
            # the printed plan's AQE un-finalized (r9 fix; gate-scale
            # outputs are driver-collectable, the oracle gate already
            # collects every one of them)
            df.collect()
            jplan = df._jdf.queryExecution().executedPlan()
            census = physical_scan_census(jplan)
            plan = _strip_initial_sections(jplan.toString())
        except Exception as e:  # a broken query must fail the audit run
            failed.append(name)
            print(f"# {name}: ERROR {e}", file=sys.stderr)
            continue
        out[name] = {
            "final_plan": "isFinalPlan=true" in plan,
            "exchanges": census["exchanges"],
            "reused_exchanges": census["reused_exchanges"],
            "inmemory_scans": census["inmemory"],
            "file_scans": sum(census["file_scans"].values()),
            "dup_scans": {
                d: c for d, c in census["file_scans"].items() if c > 1
            },
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": out, "failed": failed}))
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
