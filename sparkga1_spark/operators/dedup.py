"""Deduplication operators (SURVEY.md §2.3 A-7, §2.6 U-3, plus the
training-data-pipeline dedup family: exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine).

The reference's duplicate handling is Picard MarkDuplicates (keep the
best-quality representative per locus group, SparkGA1.scala:837-839)
and a VCF-line `distinct` (SparkGA1.scala:1241). Both are expressible
as windows/groupBys; the near-dup family follows the standard
shingle→hash→band→bucket-join construction, built entirely from
JVM-side built-ins (no Python UDFs) so it survives 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from sparkga1_spark.functions.hashing import stable_hash64


def keep_best(
    df: DataFrame,
    *,
    keys: Sequence[str],
    order_cols: Sequence[Column | str],
) -> DataFrame:
    """A-7: MarkDuplicates semantics — one representative per key group,
    chosen by the (unique) ordering. Window + row_number()==1; the
    shuffle is on `keys` only, and AQE splits skewed key groups."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup(df: DataFrame, *, text_col: str, id_col: str) -> DataFrame:
    """Exact content dedup via content hash: keep the minimum id per
    distinct text. groupBy on the hash, not the full text, so the
    shuffle carries 8 bytes per row instead of the document."""
    return (
        df.withColumn("_h", stable_hash64(F.col(text_col)))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .drop("_h")
    )
