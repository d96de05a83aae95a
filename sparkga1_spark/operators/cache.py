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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKED: list[DataFrame] = []


def scalar_lits(agg_df: DataFrame) -> dict[str, Column]:
    """Materialize a 1-row aggregate ONCE at build time and return its
    values as literal Columns (cast back to the aggregate's exact
    dtypes, so decimal precision/scale and integer widths survive the
    Python round-trip).

    This is the r6/r7-proven de-replication pattern (see
    plans/queries.py `_host_graph_edges`): attaching a scalar total via
    `crossJoin(broadcast(agg))` leaves a BroadcastNestedLoopJoin whose
    build side REPLICATES the aggregate's whole subtree into every
    consumer — a query that self-joins k times re-executes the
    fact-table scan k times at 100 TB. A `.first()` is a 1-row pull
    (the sanctioned scalar materialization, not a driver-side loop),
    the aggregate runs exactly once, and the literal folds into
    whole-stage codegen. If the aggregate's input is itself reused by
    the main plan, `tracked_persist` it first so the build-time action
    and the final plan share one scan."""
    row = agg_df.first()
    out: dict[str, Column] = {}
    for f in agg_df.schema.fields:
        v = None if row is None else row[f.name]
        out[f.name] = F.lit(v).cast(f.dataType)
    return out


def attach_scalar_agg(df: DataFrame, agg_df: DataFrame) -> DataFrame:
    """Drop-in replacement for `df.crossJoin(F.broadcast(agg_df))` when
    `agg_df` is a 1-row aggregate: same output columns, but the scalar
    is materialized once at build time (see `scalar_lits`)."""
    return df.withColumns(scalar_lits(agg_df))


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
