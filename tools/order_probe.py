"""Order/position probe for the bench drift question (r9 VERDICT #1).

The full bench runs 69 queries in a fixed order inside ONE
SparkSession; the r10 quiet-host run showed the FIRST ~35 queries flat
vs r9 while a late-position subset read 1.5-3.6x slower — a pattern
consistent with within-session accumulation (JVM heap/codegen/Python
worker state), not host load and not per-query code regressions.

This tool times an arbitrary subset, in a given order, in a FRESH
session with the exact bench protocol (2x sf0.001 warmup, 3 timed runs
at sf0.1, median + spread), so a query's isolated-fresh cost can be
compared against its full-bench late-position cost.

Usage: python tools/order_probe.py q1 q2 ...   (names; default = the
r10 slowed subset)
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

DEFAULT = [
    "x_dedup_containment",
    "x_crawl_ingest_pipeline",
    "x_web_corpus_pipeline",
    "x_heaps_vocab_growth",
    "x_text_nfc_clean",
    "x_multimodal_tiff_decode",
    "x_survival_km",
    "x_bpe_train_merges",
    "x_revenue_gini_lorenz",
    "x_touch_attribution",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from sparkga1_spark.operators.cache import release_tracked
    from sparkga1_spark.plans.registry import all_queries
    from sparkga1_spark.session import get_spark

    spark = get_spark("order_probe")
    queries = all_queries()
    warm_dir = "/root/testdata/sf0.001"
    for _ in range(2):
        for name in names:
            try:
                queries[name](spark, warm_dir).count()
            except Exception:
                pass
    out = {}
    for name in names:
        runs = []
        for _ in range(3):
            release_tracked()
            t0 = time.time()
            queries[name](spark, sf_dir).count()
            runs.append(time.time() - t0)
        out[name] = {
            "median": round(sorted(runs)[1], 3),
            "spread": [round(min(runs), 3), round(max(runs), 3)],
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
