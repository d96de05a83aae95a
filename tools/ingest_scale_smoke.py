"""Streaming crawl-ingest scale smoke (r7 VERDICT #5): one availableNow
drain of s_crawl_ingest_incremental's pipeline at a replicated scale
point, with the phase costs SEPARATED — standing-index build, WARC
fixture planting (prep, not pipeline), and the stream drain itself —
plus admitted-row count, so the claim "admission cost is
batch-proportional against a standing bucketed index" gets a measured
point instead of an assertion. The micro-batch count is fixed (4
chunk files) while per-batch volume scales with the corpus, so
drain-time growth ≈ admitted-volume growth is the pass signal; the
index build is a one-time cost amortized across every future batch.

r9 (r8 VERDICT #7): an optional PARALLEL arm measures the ingest's
parallelism axis — the same corpus split across 4×N WARC files drained
with maxFilesPerTrigger=N (4 micro-batches of N files each, so the
per-batch WARC parse runs N Python tasks instead of 1) against a fresh
admitted table over the SAME standing index. Pass signal: admitted
rows IDENTICAL to the oracle arm (admission is batching-invariant) and
drain time dropping toward min(N, cores)× on the parse-bound fraction.
The gate query keeps maxFilesPerTrigger=1 — the determinism rule its
4-round unrolled oracle depends on; the parallel arm is
measurement-only.

Usage: python tools/ingest_scale_smoke.py <sf_dir> [parallel_N]
Prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    from sparkga1_spark.plans import queries as Q
    from sparkga1_spark.session import get_spark

    sf_dir = sys.argv[1]
    spark = get_spark("ingest-scale-smoke")

    base = f"/tmp/sparkga1_stream-{spark.sparkContext.applicationId}"
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    src_dir = f"{base}/{tag}/incoming"
    admitted = f"{base}/{tag}/admitted"
    ckpt = f"{base}/{tag}/ckpt"

    t0 = time.time()
    Q._standing_dedup_index(spark, sf_dir)
    t_index = round(time.time() - t0, 2)

    t0 = time.time()
    Q._plant_warc_chunk_files(spark, sf_dir, src_dir)
    t_plant = round(time.time() - t0, 2)

    t0 = time.time()
    Q._crawl_ingest_stream(spark, src_dir, admitted, ckpt, sf_dir)
    t_drain = round(time.time() - t0, 2)

    n_admitted = spark.read.parquet(admitted).count()
    n_corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    out = {
        "sf_dir": sf_dir,
        "n_corpus_docs": n_corpus,
        "n_admitted": n_admitted,
        "index_build_sec": t_index,
        "fixture_plant_sec": t_plant,
        "stream_drain_sec": t_drain,
        "micro_batches": 4,
        "drain_sec_per_admitted_krow": (
            round(t_drain / (n_admitted / 1000.0), 3) if n_admitted else None
        ),
    }

    par_n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if par_n > 1:
        src_p = f"{base}/{tag}/incoming_par{par_n}"
        admitted_p = f"{base}/{tag}/admitted_par{par_n}"
        ckpt_p = f"{base}/{tag}/ckpt_par{par_n}"
        t0 = time.time()
        Q._plant_warc_chunk_files(spark, sf_dir, src_p, n_files=4 * par_n)
        t_plant_p = round(time.time() - t0, 2)
        t0 = time.time()
        Q._crawl_ingest_stream(
            spark, src_p, admitted_p, ckpt_p, sf_dir,
            files_per_trigger=par_n,
        )
        t_drain_p = round(time.time() - t0, 2)
        n_admitted_p = spark.read.parquet(admitted_p).count()
        out["parallel_arm"] = {
            "files": 4 * par_n,
            "files_per_trigger": par_n,
            "micro_batches": 4,
            "fixture_plant_sec": t_plant_p,
            "stream_drain_sec": t_drain_p,
            "n_admitted": n_admitted_p,
            "admitted_matches_oracle_arm": n_admitted_p == n_admitted,
            "drain_speedup_vs_single": (
                round(t_drain / t_drain_p, 2) if t_drain_p else None
            ),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
