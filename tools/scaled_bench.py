"""Scaled bench point (r13 VERDICT #2): time the heavy bench rows at a
replica-scaled input (tools/scale_smoke.py gen N) with per-row host
evidence.

Why it exists: at sf0.1 the headline bench is scheduling/latency-bound
(8-core total ~= 32-core total; ratio 1.04 in BENCH_r13_c8), so
parallelism/shuffle optimizations are nearly invisible there. This
instrument runs the shuffle-heavy subset at 10x, where per-core scaling
is measurable, using bench.py's exact methodology: 2 warm-up passes at
sf0.001, median of `--runs` timed runs per query with
release_tracked() between runs, host-contamination fields per row
(steal/foreign-CPU probes shared with bench.py).

The ingest pair's first run is the cold regime; like bench.py the cold
number is published separately (runs 2+ are idempotent re-reads).

Usage:
    python tools/scaled_bench.py <scaled_dir> [--runs N] [q1 q2 ...]

Prints ONE JSON line: {queries: {name: median}, spread, host, cold_first_run,
n_contaminated, scaled_dir, runs}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import bench  # host probes: single source for contamination math

# The shuffle/parallelism-sensitive heavy rows (r13 VERDICT #2 list).
DEFAULT_ROWS = [
    "pipeline_end_to_end",
    "x_set_similarity_join",
    "x_assoc_rules_lift",
    "x_graph_triangles",
    "x_rfm_segmentation",
    "x_dedup_minhash_lsh",
    "x_curation_pipeline_v2",
    "x_revenue_gini_lorenz",
    "x_survival_km",
    "s_crawl_ingest_incremental",
]
COLD_FIRST_RUN = {"s_crawl_ingest_incremental", "x_incremental_dedup_bucketed"}


def main() -> None:
    scaled_dir = sys.argv[1]
    args = sys.argv[2:]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args or DEFAULT_ROWS

    from sparkga1_spark.operators.cache import release_tracked
    from sparkga1_spark.plans.registry import all_queries
    from sparkga1_spark.session import get_spark

    spark = get_spark("scaled-bench")
    qs = all_queries()

    warm = "/root/testdata/sf0.001"
    for _ in range(2):
        for name in names:
            try:
                qs[name](spark, warm if os.path.isdir(warm) else scaled_dir).count()
            except Exception:
                pass
        release_tracked()

    times, spread, host, cold, errors = {}, {}, {}, {}, {}
    for name in names:
        rts, rhost = [], []
        try:
            for _ in range(runs):
                release_tracked()
                hp0 = bench._host_probe()
                t0 = time.time()
                n = qs[name](spark, scaled_dir).count()
                rts.append(time.time() - t0)
                rhost.append(bench._host_delta(hp0, bench._host_probe()))
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        med = round(sorted(rts)[len(rts) // 2], 3)
        times[name] = med
        spread[name] = [round(min(rts), 3), round(max(rts), 3)]
        if name in COLD_FIRST_RUN:
            cold[name] = round(rts[0], 3)
        host[name] = {
            "foreign_cpu_frac": [r["foreign_cpu_frac"] for r in rhost],
            "steal_frac": max(r["steal_frac"] for r in rhost),
            "per_run_steal": [r["steal_frac"] for r in rhost],
            "contaminated": any(r["contaminated"] for r in rhost),
        }
        flag = " CONTAMINATED" if host[name]["contaminated"] else ""
        print(
            f"# {name}: {med:.2f}s [{min(rts):.2f}-{max(rts):.2f}]"
            f" ({n} rows){flag}",
            file=sys.stderr,
        )
    print(json.dumps({
        "scaled_dir": scaled_dir,
        "runs": runs,
        "queries": times,
        "spread": spread,
        "cold_first_run": cold,
        "host": host,
        "n_contaminated": sum(1 for v in host.values() if v["contaminated"]),
        **({"errors": errors} if errors else {}),
    }))


if __name__ == "__main__":
    main()
