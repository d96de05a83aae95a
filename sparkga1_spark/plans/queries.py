"""Named queries — one per operator row of SURVEY.md §2, with DuckDB oracles.

Each query is a function (spark, sf_dir) -> DataFrame built from the
engine's operator modules; its oracle is ANSI SQL over the same parquet
views (tables pre-registered by the driver; fixture CTEs from
sources/fixtures.py). Aggregate/computed columns are aliased identically
on both sides — the driver's compare sorts columns by name before
hashing.

Float policy: every double-valued output is rounded (2dp for money-ish
sums, 6dp for ratios) on BOTH sides so IEEE summation-order differences
between engines cannot flip the value hash (SURVEY.md §7.4 hard part b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparkga1_spark.operators import binning, filters
from sparkga1_spark.plans.registry import query
from sparkga1_spark.sources import fixtures
from sparkga1_spark.sources.catalog import load_table

# Shared oracle preamble: fixture CTE definitions (mirrored DataFrame
# builders live in sources/fixtures.py).
FIXTURE_CTES = f"""WITH alignments AS ({fixtures.ALIGNMENTS_SQL}),
sequence_dict AS ({fixtures.SEQUENCE_DICT_SQL}),
exome_intervals AS ({fixtures.EXOME_INTERVALS_SQL}),
known_sites AS ({fixtures.KNOWN_SITES_SQL}),
variants AS ({fixtures.VARIANTS_SQL})"""


def _alignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fixtures.alignments(load_table(spark, sf_dir, "lineitem"))


def _seq_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fixtures.sequence_dict(load_table(spark, sf_dir, "nation"))


# --------------------------------------------------------------------------
# Flagship (SURVEY.md §7.2): scan → bitmask filter (F-2) → broadcast dim
# join (J-1) → range bin (F-7) → partial+final agg (A-1/A-4) → global
# sort (O-2). The reference computes exactly this keyed aggregate across
# Part 1+2 (SamRegionsParser.scala:42-65 → SparkGA1.scala:236-246).
# --------------------------------------------------------------------------


@query(
    "flagship_region_stats",
    oracle=FIXTURE_CTES
    + """
SELECT chr_index, reg,
       count(*)            AS n_reads,
       min(pos)            AS min_pos,
       max(pos)            AS max_pos,
       round(sum(weight), 2) AS sum_weight
FROM (
  SELECT a.*, CAST(floor(CAST(a.pos AS DOUBLE) / d.region_size) AS INTEGER) AS reg
  FROM alignments a
  JOIN sequence_dict d USING (chr_index)
  WHERE (a.flags & 4) = 0
)
GROUP BY chr_index, reg
ORDER BY chr_index, reg
""",
)
def flagship_region_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(chr, region) stats of mapped reads — the reference's Part 1
    manifest (SparkGA1.scala:1110-1114) as one declarative plan."""
    al = filters.filter_unmapped(_alignments(spark, sf_dir))
    binned = binning.bin_by_region(al, _seq_dict(spark, sf_dir))
    return (
        binned.groupBy("chr_index", "reg")
        .agg(
            F.count("*").alias("n_reads"),
            F.min("pos").alias("min_pos"),
            F.max("pos").alias("max_pos"),
            F.round(F.sum("weight"), 2).alias("sum_weight"),
        )
        .orderBy("chr_index", "reg")
    )
