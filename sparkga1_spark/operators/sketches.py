"""Mergeable frequency sketches (count-min) as DataFrame plans.

The reference's accounting counters (SparkGA1.scala's per-chunk count
accumulators) are exact because its keyspace is tiny; an LLM-data
corpus has 10^8-10^9 distinct tokens, where exact per-token state is a
full vocabulary shuffle. A count-min sketch bounds that to d×w cells
(here 4×512 = 2048) regardless of corpus size, merges by cell-wise sum
(commutative — partition order irrelevant), and overestimates only
(est ≥ true, with P[err > εN] ≤ δ for w = e/ε, d = ln 1/δ). Hashing is
the engine-standard seeded md5 (functions/hashing.py) so the DuckDB
oracle reproduces every cell bit-for-bit.

Scale shape: one vocabulary-sized aggregate (identical to what any
token-frequency pass already pays), then 4 tiny rows per vocab entry
into a 2048-cell aggregate — the sketch itself never grows with data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sparkga1_spark.functions.hashing import keyed_hash_col, stable_hash64

CMS_DEPTHS = 4
CMS_WIDTH = 512
CMS_SALT = 9176


def cms_cells(
    counts: DataFrame,
    key_col: str,
    cnt_col: str,
    *,
    depths: int = CMS_DEPTHS,
    width: int = CMS_WIDTH,
    salt: int = CMS_SALT,
) -> DataFrame:
    """(key, cnt) → (key, cnt, depth, bucket): each key's d sketch
    coordinates. Kept as a separate stage so both the sketch build and
    the point-estimate probe share one hashing definition — a seed or
    modulus drift between build and probe would silently destroy the
    est ≥ true guarantee."""
    h = stable_hash64(F.col(key_col))
    coords = F.array(
        *[
            F.struct(
                F.lit(d).alias("depth"),
                (keyed_hash_col(h, F.lit(d), salt) % width).alias("bucket"),
            )
            for d in range(depths)
        ]
    )
    return counts.select(
        key_col, cnt_col, F.explode(coords).alias("c")
    ).select(key_col, cnt_col, "c.depth", "c.bucket")


def cms_sketch(cells: DataFrame, cnt_col: str) -> DataFrame:
    """Sketch table: (depth, bucket, bc) — d×w rows total, mergeable by
    summing bc (so per-partition partial sketches combine map-side)."""
    return cells.groupBy("depth", "bucket").agg(
        F.sum(cnt_col).cast("long").alias("bc")
    )


def cms_point_estimates(
    probe_cells: DataFrame, sketch: DataFrame, key_col: str, cnt_col: str
) -> DataFrame:
    """min over depths of the probed buckets — the CMS point query.
    The sketch is d×w rows, always broadcast; the probe set is
    typically a top-k, so this join never shuffles the corpus."""
    return (
        probe_cells.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy(key_col, cnt_col)
        .agg(F.min("bc").alias("cms_est"))
    )
