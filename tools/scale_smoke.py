"""N× scale smoke for the heavy trio (r2 VERDICT #6).

Replicates the base-SF big tables (lineitem, orders, documents) by a
factor with DISTINCT key spaces — ids shift by r·SHIFT + r²·SCATTER
per replica (order↔lineitem join integrity preserved; see the SHIFT
comment for why the scatter term matters), and
document text gets a per-replica suffix so near-dup/dedup workloads
keep realistic selectivity instead of exploding into cross-replica
identical-text cliques. Small dims are copied as-is. Then times:

- x_dedup_minhash_lsh   (shingle → minhash → band join; shuffle-heavy)
- o_global_sort_vcf     (distributed global_rank — the two-pass ranker)
- x_curation_pipeline   (dedup → quality → PII → split, one lazy plan)

Usage:
    python tools/scale_smoke.py gen  <factor> [base_sf_dir] [out_dir]
    python tools/scale_smoke.py time <sf_dir> [runs]

`time` prints one JSON line per query: median + [min,max] of `runs`
timed executions (tracked caches released between runs), plus the max
tasks-per-stage observed so a new single-task funnel is visible.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

TRIO = ["x_dedup_minhash_lsh", "o_global_sort_vcf", "x_curation_pipeline"]
# QUADRATIC-SCATTER replica shift (r7). The old flat 10_000_000 stride
# resonated with the host graph's node modulus m = count(lineitem)/10:
# at 100x, m = 6M and 10M mod 6M = 4M, so all 100 replicas' orderkeys
# collapsed onto THREE residue classes — the "100x graph" had 1.14M
# nodes instead of ~6M, src nodes degraded to degree-1 pendants, and
# BFS from node 0 reached 350 nodes. A prime stride (10_000_019) is
# NOT enough: coprimality spreads the offsets' COUNT, not their
# placement — 10_000_019 mod 6M = (2/3)·6M + 19, three tight clusters
# with a ±19r drift, measured 773k of 6M src values. Any fixed stride
# has some rational resonance with some m; the r²·SCATTER term breaks
# arithmetic-progression structure mod EVERY m (measured 5,997,100 of
# 6M distinct src at 100x, 599,914 of 600k at 10x). shift(r) is
# strictly increasing with inter-replica gaps > 10M > every base id
# (sf0.1 orderkeys ≤ 6M), so replica id spaces stay disjoint and
# consecutive-block properties (planted residue classes appearing in
# every replica) are preserved.
SHIFT = 10_000_019
SCATTER = 911
SMALL = "region nation customer supplier part".split()


def _rep_shift(F):
    """Per-replica id shift as a Column: r·SHIFT + r²·SCATTER."""
    r = F.col("_rep")
    return r * SHIFT + r * r * SCATTER


def gen(factor: int, base: str, out: str) -> None:
    from pyspark.sql import functions as F

    from sparkga1_spark.session import get_spark

    spark = get_spark("scale-gen")
    os.makedirs(out, exist_ok=True)
    reps = spark.range(factor).select(F.col("id").alias("_rep"))

    li = spark.read.parquet(f"{base}/lineitem.parquet")
    (
        li.crossJoin(reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + _rep_shift(F))
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )
    od = spark.read.parquet(f"{base}/orders.parquet")
    (
        od.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + _rep_shift(F))
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    docs = spark.read.parquet(f"{base}/documents.parquet")
    # Decorrelate replicas for the shingle-based workloads by making
    # each replica an ISOMORPHIC copy of the corpus in a disjoint token
    # space: every word is prefixed with the replica id. Within a
    # replica all pairwise similarities equal the base corpus exactly
    # (consistent token renaming); across replicas no shingle matches.
    # The smoke then models "N× more DISTINCT corpus" — N-way
    # duplicate cliques would instead be an output-quadratic workload
    # (a plain text suffix left cross-replica Jaccard ≈ 0.9: 7M pairs
    # at 10×; constant padding created false WITHIN-replica pairs).
    renamed = F.array_join(
        F.transform(
            F.split(F.trim(F.col("text")), " +"),
            lambda w: F.concat(F.lit("q"), F.col("_rep").cast("string"), w),
        ),
        " ",
    )
    (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + _rep_shift(F))
        .withColumn("text", renamed)
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )
    # events: N× more USERS (user_id shift) — the right axis for the
    # keyed stream workloads (SCD2, sessions); event ids stay unique.
    ev = spark.read.parquet(f"{base}/events.parquet")
    (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + _rep_shift(F))
        .withColumn("user_id", F.col("user_id") + _rep_shift(F))
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )
    # embeddings: N× more vectors in disjoint id spaces. Vector values
    # repeat across replicas — fine for encode/assignment workloads
    # (each replica quantizes identically). NOTE the scaling axis for
    # modulus-planted fixtures (vec_id % 25 twins, % 20 ANN queries):
    # each replica is a CONSECUTIVE id block, so every residue class —
    # and therefore a proportional share of planted ids — appears in
    # EVERY replica regardless of the shift value. Embedding-family
    # smokes thus measure N× corpus WITH N× queries/planted pairs
    # (sublinear timings under that axis are conservative); only the
    # literal vec_id < 4 codebook rows stay replica-0-only.
    em = spark.read.parquet(f"{base}/embeddings.parquet")
    (
        em.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + _rep_shift(F))
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    for t in SMALL:
        src = f"{base}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)
    print(f"generated {factor}x at {out}")


def time_trio(sf_dir: str, runs: int = 2, names: list[str] | None = None) -> None:
    from sparkga1_spark.operators.cache import release_tracked
    from sparkga1_spark.plans.registry import all_queries
    from sparkga1_spark.session import get_spark

    spark = get_spark("scale-smoke")
    sc = spark.sparkContext
    qs = all_queries()
    names = names or TRIO
    # JIT warm-up on the smallest SF so timings measure the plan
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir  # standalone hosts: warm on the target itself
    for name in names:
        qs[name](spark, warm_dir).count()
        release_tracked()
    out = {}
    for name in names:
        ts, max_tasks = [], 0
        for _ in range(runs):
            release_tracked()
            tracker = sc.statusTracker()
            before = set(tracker.getJobIdsForGroup() or [])
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            ts.append(round(time.time() - t0, 2))
            for jid in set(tracker.getJobIdsForGroup() or []) - before:
                info = tracker.getJobInfo(jid)
                for sid in info.stageIds if info else []:
                    si = tracker.getStageInfo(sid)
                    if si:
                        max_tasks = max(max_tasks, si.numTasks)
        out[name] = {
            # lower-middle: with runs=2 the upper-middle would report
            # the MAX (a cold-cache outlier published as the headline)
            "median": sorted(ts)[(len(ts) - 1) // 2],
            "spread": [min(ts), max(ts)],
            "rows": n,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "queries": out}))


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "gen":
        factor = int(sys.argv[2])
        base = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        out = sys.argv[4] if len(sys.argv) > 4 else f"/tmp/scale{factor}x"
        gen(factor, base, out)
    elif mode == "time":
        time_trio(
            sys.argv[2],
            int(sys.argv[3]) if len(sys.argv) > 3 else 2,
            sys.argv[4:] or None,
        )
    else:
        raise SystemExit("usage: scale_smoke.py gen|time ...")
