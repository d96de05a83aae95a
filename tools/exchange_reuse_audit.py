"""Post-execution exchange-reuse audit (r7 VERDICT #7).

PLAN_AUDIT records AQE-INITIAL plans, where `reused_exchanges` is
always 0 — ReusedExchange is installed by AQE at RUNTIME when two
identical exchange subtrees materialize. This tool EXECUTES a sample
of multi-consumer queries (plans whose build re-uses a subtree without
an explicit persist) and captures the final adaptive plan afterwards,
counting Exchange vs ReusedExchange nodes — answering whether Spark
de-duplicates the shared subtree at runtime or actually rebuilds it.

Measured (r8, sf0.01): reused_exchanges = 0 on EVERY sampled query —
AQE's exchange reuse never fired across diverging aggregate branches,
so a subtree consumed by two branches really does rebuild (the
x_dau_wau / x_cohort_retention distinct scanned events once PER
BRANCH). Fix applied: tracked_persist on the multiply-consumed
distinct in both queries (inmemory_scans 2/3 confirm the cache is
live). Queries whose shared subtree is FACT-SIZED (x_bigram_lm's
bigram stream) stay unpersisted by design — two streaming passes beat
caching a corpus-sized frame at 100 TB.

READING file_scans: it counts textual FileScan/Scan-parquet nodes in
the final plan string, and a cached plan PRINTS its cache-build plan
inside every InMemoryTableScan block — so file_scans INFLATES after a
persist; inmemory_scans is the signal that the rebuild is gone (the
build scan runs once at materialization).

Usage: python tools/exchange_reuse_audit.py [sf_dir] [name ...]
Prints one JSON line.
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


def main() -> None:
    from sparkga1_spark.operators.cache import release_tracked
    from sparkga1_spark.plans.registry import all_queries
    from sparkga1_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or SAMPLE
    spark = get_spark("exchange-reuse-audit")
    qs = all_queries()
    out = {}
    for name in names:
        release_tracked()
        df = qs[name](spark, sf_dir)
        df.count()  # execute so AQE finalizes every adaptive subplan
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[name] = {
            "final_plan": "isFinalPlan=true" in plan,
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
            "inmemory_scans": len(re.findall(r"InMemoryTableScan", plan)),
            "file_scans": len(re.findall(r"FileScan|Scan parquet", plan)),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
