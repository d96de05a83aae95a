"""Tracked persist() lifecycle for multi-use sub-plans.

Operators that genuinely re-scan an intermediate (LSH bucket tables,
IVF assignments, skew-bound probes) persist it; but a long-lived
session running many queries (the driver gate runs the whole registry
in one SparkSession) would accumulate those cached partitions and
pressure executor memory. Every persist in this package therefore goes
through `tracked_persist`, and `release_tracked` frees everything in
one call.

Contract: a query's caches stay valid until its consuming action has
run; callers that run many queries call `release_tracked()` between
them (the `__spark_entry__.queries()` wrapper does this before each
build, so the working set is bounded by ONE query regardless of how
many the driver runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register for bulk release."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked DataFrame (blocking=False); returns how
    many were released. Safe to call at any quiescent point."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
