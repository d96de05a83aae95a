"""Controlled A/B for the r6 bench-drift watch cluster (r6 VERDICT #3).

Runs the four drifted queries (x_dedup_minhash_lsh, a_dedup_keep_best,
s_session_windows, pipeline_end_to_end) under bench.py's exact protocol
(double sf0.001 warm-up, 3 timed runs, median + spread) against ONE
tree given on argv, printing a single JSON line. The orchestrating
shell alternates r5/r6 trees in the same session so host state is
shared across arms; each invocation is its own JVM.

Usage: python tools/drift_ab.py <tree_dir> <label> [query ...]
(query names on argv override the default r6 watch cluster — the r9
run passes the r8 driver-bench drift cluster x_bigram_pmi /
x_dsir_importance / x_bm25_topk / x_ann_ivf_topk).
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = [
    "x_dedup_minhash_lsh",
    "a_dedup_keep_best",
    "s_session_windows",
    "pipeline_end_to_end",
]


def main() -> None:
    tree, label = sys.argv[1], sys.argv[2]
    queries_arg = sys.argv[3:]
    if queries_arg:
        QUERIES[:] = queries_arg
    sys.path.insert(0, tree)
    os.chdir(tree)

    from sparkga1_spark.operators.cache import release_tracked
    from sparkga1_spark.plans.registry import all_queries
    from sparkga1_spark.session import get_spark

    spark = get_spark(f"drift-ab-{label}")
    queries = all_queries()
    sf_dir = "/root/testdata/sf0.1"
    warm = "/root/testdata/sf0.001"
    for _ in range(2):
        for name in QUERIES:
            queries[name](spark, warm).count()

    out: dict[str, object] = {"label": label, "tree": tree}
    for name in QUERIES:
        runs = []
        for _ in range(3):
            release_tracked()
            t0 = time.time()
            queries[name](spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        runs.sort()
        out[name] = {"median": runs[1], "spread": [runs[0], runs[-1]]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
