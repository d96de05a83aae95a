"""Steal-verified COLD-ingest bracket (r12 VERDICT #4).

The cold first-run number for the ingest pair —
`x_incremental_dedup_bucketed` (session index registration + first
MERGE) then `s_crawl_ingest_incremental` (streaming checkpoint init +
the four availableNow micro-batches) — drifted 13.2→14.8 s across
r10-r12, each time attributed to hypervisor steal on neighbouring
bench rows. This tool pins the number under measured-host evidence:

Each SAMPLE is a fresh subprocess (fresh JVM + fresh applicationId, so
the per-app /tmp checkpoint tree guarantees the cold regime) that
replays bench.py's protocol for the pair — sf0.001 warm-up twice (JIT
and codegen out of the window; the warm-up's checkpoint tag differs
from sf0.1's, so the timed run still pays real checkpoint init) — and
times run 1 of each query at the bench SF in bench.py's HEADLINE order
(dedup idx 56 before ingest idx 66), bracketed by bench.py's own host
probes. A sample is CLEAN iff every timed window shows
steal_frac <= 0.01 and no contamination flag; the artifact publishes
the clean-sample bracket [min, max] + median per query, the per-sample
evidence rows, and how many samples the steal filter discarded —
regression-comparable r13→r14 without a per-window excuse.

Usage: python tools/cold_ingest_probe.py [samples] [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEAL_MAX = 0.01
PAIR = ["x_incremental_dedup_bucketed", "s_crawl_ingest_incremental"]

_CHILD = r"""
import glob, json, os, shutil, sys, time
sys.path.insert(0, %(repo)r)
import bench
from sparkga1_spark.plans.registry import all_queries
from sparkga1_spark.session import get_spark

sf_dir = %(sf_dir)r
spark = get_spark("cold-ingest-probe")
qs = all_queries()
warm = "/root/testdata/sf0.001"
if not os.path.isdir(warm):
    # warming at sf_dir would pre-build the index and consume the
    # checkpoint under the SAME tag the timed run uses — the "cold"
    # numbers would silently be warm ones (review-caught). Refuse.
    raise SystemExit(f"warm-up dir {warm} missing; cold probe needs a "
                     "distinct-tag warm-up scale")
for _ in range(2):
    for name in %(pair)r:
        qs[name](spark, warm).count()

rows = {}
for name in %(pair)r:
    hp0 = bench._host_probe()
    t0 = time.time()
    qs[name](spark, sf_dir).count()
    wall = time.time() - t0
    hd = bench._host_delta(hp0, bench._host_probe())
    rows[name] = {
        "cold_sec": round(wall, 3),
        "steal_frac": hd["steal_frac"],
        "foreign_cpu_frac": hd["foreign_cpu_frac"],
        "contaminated": hd["contaminated"],
    }
app_id = spark.sparkContext.applicationId
spark.stop()
shutil.rmtree(f"/tmp/sparkga1_stream-{app_id}", ignore_errors=True)
print("COLDPROBE " + json.dumps(rows))
"""


def main() -> None:
    samples = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    per_sample = []
    n_failed = 0
    for i in range(samples):
        child = _CHILD % {"repo": _REPO, "sf_dir": sf_dir, "pair": PAIR}
        try:
            proc = subprocess.run(
                [sys.executable, "-c", child],
                capture_output=True, text=True, cwd=_REPO, timeout=1800,
            )
        except subprocess.TimeoutExpired:
            # one hung sample must not discard the completed samples'
            # evidence (review-caught) — record and keep probing
            n_failed += 1
            print(f"# sample {i}: TIMEOUT after 1800s", file=sys.stderr)
            continue
        row = None
        for line in proc.stdout.splitlines():
            if line.startswith("COLDPROBE "):
                row = json.loads(line[len("COLDPROBE "):])
        if row is None:
            n_failed += 1
            print(f"# sample {i}: FAILED rc={proc.returncode} "
                  f"{proc.stderr.strip().splitlines()[-1:] or ''}",
                  file=sys.stderr)
            continue
        clean = all(
            r["steal_frac"] <= STEAL_MAX and not r["contaminated"]
            for r in row.values()
        )
        per_sample.append({"sample": i, "clean": clean, "rows": row})
        summary = ", ".join(
            f"{n} {r['cold_sec']:.2f}s steal={r['steal_frac']:.4f}"
            for n, r in row.items()
        )
        print(f"# sample {i} ({'CLEAN' if clean else 'DIRTY'}): {summary}",
              file=sys.stderr)

    def bracket(name):
        vals = sorted(
            s["rows"][name]["cold_sec"] for s in per_sample if s["clean"]
        )
        if not vals:
            return None
        return {
            "median": vals[len(vals) // 2],
            "bracket": [vals[0], vals[-1]],
            "n_clean_samples": len(vals),
        }

    artifact = {
        "sf_dir": sf_dir,
        "protocol": (
            "fresh subprocess per sample (fresh JVM/appId => cold "
            "checkpoint tree); 2x sf0.001 warm-up; timed run 1 per "
            "query in bench HEADLINE order; clean iff steal_frac <= "
            f"{STEAL_MAX} and no contamination flag in either window"
        ),
        # crashed/hung samples are a protocol-health signal distinct
        # from steal-discarded ones (review-caught): n_requested =
        # n_completed + n_failed; steal-discarded = n_completed - n_clean
        "n_requested": samples,
        "n_completed": len(per_sample),
        "n_failed": n_failed,
        "n_clean": sum(1 for s in per_sample if s["clean"]),
        "cold": {n: bracket(n) for n in PAIR},
        "samples": per_sample,
    }
    line = json.dumps(artifact)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)


if __name__ == "__main__":
    main()
