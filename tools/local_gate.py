"""Full-registry driver emulation that writes the LOCAL_GATE artifact.

Reproduces the external driver's correctness gate exactly — a BARE
SparkSession (no engine startup confs), `__spark_entry__.py` loaded by
file path, entry() smoke at sf0.001, then every queries() entry vs its
oracle_sql() on DuckDB at sf0.01 using the driver-strength comparator
in tools/check.py — and dumps per-query verdicts to LOCAL_GATE_r{N}.json
so the committed snapshot covers queries rotated out of the driver's
50-row CORRECTNESS cap.

Usage: python tools/local_gate.py <round> [sf_dir] [out.json]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _sf_of(sf_dir: str):
    """Best-effort scale factor from the dir name — metadata only, must
    never crash AFTER a full gate run (custom dirs like /tmp/scale10x
    would otherwise lose every verdict to a ValueError)."""
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return None


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out_path = (
        sys.argv[3] if len(sys.argv) > 3 else os.path.join(_REPO, f"LOCAL_GATE_r{rnd}.json")
    )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-emulation")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    entry_rows = len(mod.entry(spark).collect())
    print(f"entry smoke: {entry_rows} rows")

    from tools.check import compare, duck_connection

    con = duck_connection(sf_dir)
    qs, osql = mod.queries(), mod.oracle_sql()
    results, failed = {}, []
    for name in qs:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            v = compare(name, df, con, osql[name]) if name in osql else f"rows-only ({df.count()} rows)"
        except Exception as e:  # noqa: BLE001
            v = f"ERROR {type(e).__name__}: {e}"
        ok = str(v).startswith(("OK", "rows-only"))
        if not ok:
            failed.append(name)
        results[name] = str(v)[:200]
        print(f"[{'PASS' if ok else 'FAIL'}] {name:40s} {time.time() - t0:6.2f}s  {str(v)[:120]}")

    artifact = {
        "round": rnd,
        "sf": _sf_of(sf_dir),
        "comparator": "tools/check.py full-precision repr (driver-strength)",
        "session": "bare local[8] driver emulation (.claude/skills/verify/SKILL.md recipe)",
        "entry_rows": entry_rows,
        "n_queries": len(qs),
        "n_pass": len(qs) - len(failed),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"\n{artifact['n_pass']}/{artifact['n_queries']} passed -> {out_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
