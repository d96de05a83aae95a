"""Incremental aggregate-state maintenance (partial-agg merge).

At 100 TB, re-scanning the corpus to refresh a rollup after every
ingest batch is the anti-pattern: the scalable form keeps per-key
ALGEBRAIC state — count, decimal-guarded sum, min, max, HLL sketch
registers — and folds each batch in O(|batch| + |touched state|),
because every component merges associatively and commutatively:

    count  ⊕ count  = +        sum(decimal) ⊕ sum = +   (exact, so
    min    ⊕ min    = least    max ⊕ max = greatest      order-free)
    hll    ⊕ hll    = register-wise max (hll_union_agg)

Derived metrics (avg, distinct estimate) are FINALIZED from state,
never maintained directly — an avg-of-avgs is the classic wrong merge.
The decimal(18,6) guard makes the sum component exactly associative
(no float summation-order drift), which is what lets the driver's
DuckDB oracle certify incremental == batch-recompute equality to the
last bit.

Reference parity: the reference unions per-chunk outputs and combines
them downstream (SparkGA1.scala chunk aggregation); this module is
that pattern generalized to keyed algebraic state with a mergeable
distinct sketch. At cluster scale the state table lives partitioned
by key (sources/sinks.py bucketed writers) so a batch merge shuffles
only the batch side.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from sparkga1_spark.functions.numeric import hround

_GUARD = "decimal(18,6)"
_WIDE = "decimal(38,6)"


def aggregate_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    distinct_col: str | None = None,
    lgk: int = 12,
) -> DataFrame:
    """One ingest batch → per-key algebraic state. Columns: state_cnt,
    state_sum (decimal-guarded: exactly associative), state_min,
    state_max, and state_hll (Datasketches HLL registers) when
    `distinct_col` is given. Map-side partial aggregation applies —
    one shuffle of pre-combined partials per batch."""
    aggs = [
        F.count(F.col(value_col)).alias("state_cnt"),
        # pinned to the WIDEST decimal so a state table re-read from
        # parquet unions with fresh batch state without type widening
        # drift across merge generations
        F.sum(F.col(value_col).cast(_GUARD)).cast(_WIDE).alias("state_sum"),
        F.min(value_col).alias("state_min"),
        F.max(value_col).alias("state_max"),
    ]
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(distinct_col, F.lit(lgk)).alias("state_hll"))
    return df.groupBy(*keys).agg(*aggs)


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold any number of state frames into one: union + per-key
    algebraic merge. Associative and commutative component-wise, so
    batch arrival order cannot change the result — pinned by pytest
    against the single-pass batch aggregate."""
    if not states:
        raise ValueError("merge_states needs at least one state frame")
    u = reduce(lambda a, b: a.unionByName(b), states)
    aggs = [
        F.sum("state_cnt").alias("state_cnt"),
        F.sum("state_sum").cast(_WIDE).alias("state_sum"),
        F.min("state_min").alias("state_min"),
        F.max("state_max").alias("state_max"),
    ]
    if "state_hll" in u.columns:
        aggs.append(F.hll_union_agg("state_hll").alias("state_hll"))
    return u.groupBy(*keys).agg(*aggs)


def finalize_state(state: DataFrame, keys: list[str], *, n: int = 2) -> DataFrame:
    """State → user-facing metrics: n_rows, sum/min/max, and avg
    derived from (sum, count) — the only correct merge-safe average.
    Rounding mirrors dsum/davg (floor(x·10ⁿ + 0.5) on a single
    decimal→double conversion) so the DuckDB oracle can restate it."""
    m = 10**n
    sum_rounded = (
        F.floor(state["state_sum"] * F.lit(m) + F.lit("0.5").cast("decimal(2,1)"))
        .cast("double")
        / F.lit(float(m))
    )
    avg = hround(state["state_sum"].cast("double") / state["state_cnt"], 6)
    cols = [
        *keys,
        state["state_cnt"].alias("n_rows"),
        sum_rounded.alias("sum_value"),
        state["state_min"].alias("min_value"),
        state["state_max"].alias("max_value"),
        avg.alias("avg_value"),
    ]
    if "state_hll" in state.columns:
        cols.append(F.hll_sketch_estimate("state_hll").alias("distinct_est"))
    return state.select(*cols)
