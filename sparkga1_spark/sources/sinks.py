"""Sinks (SURVEY.md §2.1 S-4/S-6/S-7).

The reference hand-writes three output shapes: per-region coordinate-
sorted BAM+BED files (S-6), a TSV manifest checkpoint between jobs
(S-4), and one globally ordered merged VCF written by the driver (S-7,
SparkGA1.scala:1241-1250). Spark-first equivalents:

- partitioned sink: `partitionBy(keys)` + `sortWithinPartitions` — the
  committer writes each (chr, reg) directory with rows in coordinate
  order; no driver-side byte shuffling.
- checkpoint: just parquet (columnar, splittable — the manifest TSV
  disappears into a stage boundary unless explicitly materialized).
- single-file ordered sink: range-sort globally, then coalesce(1) for
  the final write only. The sort itself is distributed (range exchange);
  only the last write funnels — same topology as the reference's
  driver-side merge, minus the collect. For large outputs prefer the
  partitioned sink; this exists for the "one VCF file" contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned_sorted(
    df: DataFrame,
    path: str,
    *,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """S-6: one directory per partition key, rows coordinate-sorted
    within every output file (SparkGA1.scala:613-651 semantics)."""
    (
        df.repartition(*[df[c] for c in partition_cols])
        .sortWithinPartitions(*partition_cols, *sort_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_single_file_ordered(
    df: DataFrame,
    path: str,
    *,
    order_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """S-7: one globally ordered file (the combined-VCF contract,
    SparkGA1.scala:1241-1250). orderBy does a distributed range sort;
    coalesce(1) only funnels the already-sorted partitions into a single
    writer, preserving order (coalesce keeps partition order and does
    not redistribute rows)."""
    df.orderBy(*order_cols).coalesce(1).write.mode(mode).parquet(path)


def checkpoint_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> DataFrame:
    """S-4: materialize an intermediate (the bwaOut.txt manifest analog)
    and return a fresh scan over it — cuts lineage exactly like the
    reference's between-jobs file relay, but columnar and splittable."""
    df.write.mode(mode).parquet(path)
    return df.sparkSession.read.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: rows hash-partitioned into n_buckets
    files per partition by `bucket_cols`, optionally sorted within each
    bucket. Joins/aggregations on the bucket columns between tables
    bucketed the same way need NO exchange — the pre-shuffle is paid
    once at write time (the scale answer for repeatedly-joined fact
    tables; see test_bucketed_join_avoids_shuffle for the plan proof).

    Bucketing metadata lives in the session catalog, so this writes a
    TABLE (spark.sql.warehouse.dir), not a bare path.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    *,
    target_file_mb: int = 128,
    sort_cols: Sequence[str] | None = None,
) -> int:
    """Small-file compaction — the canonical 100 TB operational fix for
    sinks that accumulated many tiny files (streaming micro-batches,
    over-parallel writes; the reference relays thousands of per-chunk
    files between its three jobs, SparkGA1.scala:1050-1081, which is
    exactly this problem). Sizes the output by the INPUT's real bytes
    (Hadoop FS listing — no data scan), rewrites with `repartition(n)`;
    optional `sort_cols` re-establish within-file clustering so min/max
    row-group pruning works on the compacted output. Returns n."""
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    out = df.repartition(n)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(out_path)
    return n


def merge_upsert(
    base: DataFrame, updates: DataFrame, *, keys: Sequence[str]
) -> DataFrame:
    """MERGE semantics on plain DataFrames (updates win on key match,
    inserts otherwise): anti-join the base against the update keys, then
    union. Both shuffles are keyed on `keys`; nothing wider than the
    update set is broadcast. The lakehouse connectors do this natively
    (MERGE INTO) when their jars are present — this is the
    format-agnostic fallback with identical row-level results."""
    survivors = base.join(updates.select(*keys).distinct(), list(keys), "left_anti")
    return survivors.unionByName(updates)


def upsert_parquet(
    spark,
    base_path: str,
    updates: DataFrame,
    *,
    keys: Sequence[str],
) -> None:
    """Read-merge-rewrite upsert for a parquet table. Parquet cannot be
    overwritten while being read (the scan is lazy), so the merge result
    is checkpointed to a sibling temp dir first, then rewritten — the
    classic two-phase commit-by-rename pattern for file tables."""
    base = spark.read.parquet(base_path)
    merged = merge_upsert(base, updates, keys=keys)
    tmp = base_path.rstrip("/") + "__tmp_upsert"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(base_path)
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(tmp)
    p.getFileSystem(spark._jsc.hadoopConfiguration()).delete(p, True)
