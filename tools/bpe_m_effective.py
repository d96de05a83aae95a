"""Measured m-effective for the batched BPE trainer (r7 VERDICT #6):
one instrumented train on the sf0.1 word-frequency distribution at
rounds=64, m=8, reporting kept-pairs-per-round (straight from the
trainer's own (rnd, k) output — no instrumentation hooks), the
jobs-vs-merges ratio, and wall time vs the sequential trainer run to
the same merge count. The r7 claim "most rounds keep 5-8 of m=8" was
an assertion; this is the measurement.

Usage: python tools/bpe_m_effective.py [sf_dir] [rounds] [m]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from sparkga1_spark.functions import text as T
    from sparkga1_spark.operators.tokenizer import (
        bpe_train_merges,
        bpe_train_merges_batched,
    )
    from sparkga1_spark.session import get_spark
    from sparkga1_spark.sources.catalog import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    spark = get_spark("bpe-m-effective")
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(T.words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("f"))
    )
    from sparkga1_spark.operators.cache import tracked_persist

    wf = tracked_persist(wf)
    wf.count()  # materialize outside the timed window

    t0 = time.time()
    batched = bpe_train_merges_batched(spark, wf, rounds=rounds, m=m).collect()
    t_batched = round(time.time() - t0, 2)

    kept = Counter(r.rnd for r in batched)
    per_round = [kept[r] for r in sorted(kept)]
    n_merges = len(batched)
    n_rounds = len(kept)

    # sequential trainer to the SAME merge count: the apples-to-apples
    # jobs comparison (n_merges pair-count jobs vs n_rounds)
    t0 = time.time()
    seq = bpe_train_merges(spark, wf, rounds=n_merges).collect()
    t_seq = round(time.time() - t0, 2)

    dist = Counter(per_round)
    out = {
        "sf_dir": sf_dir,
        "rounds_requested": rounds,
        "m": m,
        "rounds_run": n_rounds,
        "merges_learned": n_merges,
        "m_effective": round(n_merges / n_rounds, 3),
        "kept_per_round_hist": {str(k): v for k, v in sorted(dist.items())},
        "jobs_vs_merges_ratio": round(n_rounds / n_merges, 4),
        "batched_sec": t_batched,
        "sequential_same_merges_sec": t_seq,
        "speedup": round(t_seq / t_batched, 2) if t_batched else None,
        "sequential_merges_agree_prefix": sum(
            1
            for a, b in zip(
                [(r.pair, r.merged) for r in seq],
                [(r.pair, r.merged) for r in batched],
            )
            if a == b
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
