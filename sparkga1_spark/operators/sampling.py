"""Deterministic weighted sampling (Efraimidis–Spirakis A-ES).

Training-data curation needs weight-proportional sampling (sample docs
proportionally to length/quality) that is REPRODUCIBLE: a cluster
re-run, a resumed pipeline, and the audit oracle must all select the
same rows. Spark's rand()-based sample() is partition-order dependent;
the A-ES scheme (Efraimidis & Spirakis 2006, "Weighted random sampling
with a reservoir") instead gives every row the key u^(1/w) with u
uniform in (0,1) and takes the global top-k — weight-proportional
inclusion, no coordination, and u here is derived from a seeded md5 of
the row id (functions/hashing.py), so the draw is a pure function of
the data.

Scale shape: one scan computes the key, then TakeOrderedAndProject
(per-partition top-k, k rows per partition to a k-sized reducer) — no
full sort, no shuffle of the corpus, identical at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sparkga1_spark.functions.hashing import keyed_hash

# u is quantized to ~2^20 distinct levels: plenty for sampling, and the
# SAME rational arithmetic is exactly representable in both engines
# (the subsequent pow() is the only float op, rounded at the output).
_U_MOD = 1_048_573  # prime < 2^20


def es_key(id_col: Column, weight_col: Column, *, a: int = 41, b: int = 977) -> Column:
    """The A-ES priority key u^(1/w), u = seeded-hash uniform in (0,1).
    SQL mirror (keyed_hash_sql for the inner hash):
    power((kh % 1048573 + 1) / 1048574.0, 1.0 / w).

    Weights must be strictly positive: w = 0 degenerates to u^inf and
    w < 0 to keys > 1 that OUTRANK every valid row — silent
    selection-bias garbage, so invalid weights raise at runtime
    instead (the round's validate-at-the-operator precedent)."""
    u = (keyed_hash(id_col.cast("string"), a, b) % _U_MOD + 1) / F.lit(
        float(_U_MOD + 1)
    )
    w = F.when(
        weight_col <= 0,
        F.raise_error(
            F.concat(
                F.lit("es_key: non-positive weight for id "), id_col.cast("string")
            )
        ).cast("double"),
    ).otherwise(weight_col.cast("double"))
    return F.pow(u, F.lit(1.0) / w)


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    *,
    a: int = 41,
    b: int = 977,
) -> DataFrame:
    """Top-k rows by the A-ES key — a weight-proportional sample
    without replacement. Key is ROUNDED to 6dp with the id as a
    tiebreak before the top-k cut so the selected SET is stable under
    cross-engine pow() ulp differences (the float policy of
    plans/queries.py applied to the selection itself)."""
    from sparkga1_spark.functions.numeric import hround

    key = hround(es_key(F.col(id_col), F.col(weight_col), a=a, b=b), 6)
    return (
        df.withColumn("es_key", key)
        .orderBy(F.desc("es_key"), id_col)
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    *,
    a: int = 41,
    b: int = 977,
) -> DataFrame:
    """Stratified A-ES: an independent weight-proportional top-k per
    group (curation samples per SOURCE, not globally — a global cut
    would let one giant crawl starve every small high-quality source).
    row_number over (group, key desc, id) then rank ≤ k: the window
    partitions by group, so no group's rows ever gather beyond one
    partition — skew-safe as long as single groups fit a partition,
    the same envelope every per-source operator here shares."""
    from pyspark.sql import Window

    from sparkga1_spark.functions.numeric import hround

    key = hround(es_key(F.col(id_col), F.col(weight_col), a=a, b=b), 6)
    w = Window.partitionBy(group_col).orderBy(F.desc("es_key"), id_col)
    return (
        df.withColumn("es_key", key)
        .withColumn("es_rank", F.row_number().over(w))
        .filter(F.col("es_rank") <= k)
        .drop("es_rank")
    )
