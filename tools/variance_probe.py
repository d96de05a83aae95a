"""Within-session variance attribution for iterative/multi-job queries
(r11 VERDICT #3: x_bpe_train_merges spanned [1.55, 7.87] s inside ONE
uncontaminated bench window — a real 2x regression would be invisible
at 3 runs/query, so the cause needs a name).

For one query, runs N timed executions in a single session and records
per run: wall time, JVM GC collection time/count delta (all collector
MX beans), number of Spark jobs launched, and the host-contamination
fields bench.py publishes. Optionally forces a JVM System.gc() before
each run (--gc) to test the "GC pause lands inside the timed window"
hypothesis: if forced collection collapses the spread, the variance is
heap-state timing, not plan cost.

Usage:
    python tools/variance_probe.py <query> [runs] [--gc] [sf_dir]

Prints one JSON line: per-run rows + spread summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import bench  # host probes (single source for contamination math)


def _gc_stats(spark) -> tuple[int, int]:
    """(total GC time ms, total collections) over all collector beans."""
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    t = c = 0
    beans = mf.getGarbageCollectorMXBeans()
    for i in range(beans.size()):
        b = beans.get(i)
        t += b.getCollectionTime()
        c += b.getCollectionCount()
    return t, c


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--gc"]
    force_gc = "--gc" in sys.argv
    name = args[0]
    runs = int(args[1]) if len(args) > 1 else 10
    sf_dir = args[2] if len(args) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from sparkga1_spark.operators.cache import release_tracked
    from sparkga1_spark.plans.registry import all_queries
    from sparkga1_spark.session import get_spark

    spark = get_spark("variance-probe")
    fn = all_queries()[name]
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm-up (same protocol as bench.py: JIT/codegen out of the window)
    warm = "/root/testdata/sf0.001"
    for _ in range(2):
        fn(spark, warm if os.path.isdir(warm) else sf_dir).count()

    rows = []
    for i in range(runs):
        release_tracked()
        if force_gc:
            spark.sparkContext._jvm.java.lang.System.gc()
        g0, c0 = _gc_stats(spark)
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        hp0 = bench._host_probe()
        t0 = time.time()
        fn(spark, sf_dir).count()
        wall = time.time() - t0
        hd = bench._host_delta(hp0, bench._host_probe())
        g1, c1 = _gc_stats(spark)
        j1 = len(tracker.getJobIdsForGroup(None) or [])
        rows.append({
            "run": i,
            "sec": round(wall, 3),
            "gc_ms": g1 - g0,
            "gc_n": c1 - c0,
            "jobs": j1 - j0,
            "steal_frac": hd["steal_frac"],
            "foreign_cpu_frac": hd["foreign_cpu_frac"],
            "contaminated": hd["contaminated"],
        })
        print(f"# {rows[-1]}", file=sys.stderr)

    secs = sorted(r["sec"] for r in rows)
    print(json.dumps({
        "query": name,
        "sf_dir": sf_dir,
        "runs": runs,
        "force_gc": force_gc,
        "min": secs[0],
        "median": secs[len(secs) // 2],
        "max": secs[-1],
        "spread_ratio": round(secs[-1] / secs[0], 2) if secs[0] else None,
        "gc_ms_total": sum(r["gc_ms"] for r in rows),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
