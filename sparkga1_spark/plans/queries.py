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


# --------------------------------------------------------------------------
# M1 core relational (SURVEY.md §7.3 M1): filters, projections, casts,
# aggregations, global sort, unions.
# --------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                  AS sum_qty,
       round(sum(l_extendedprice), 2)                             AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6)                                  AS avg_qty,
       round(avg(l_extendedprice), 6)                             AS avg_price,
       round(avg(l_discount), 6)                                  AS avg_disc,
       count(*)                                                   AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark, sf_dir):
    """A-1/A-4 on real columns — the classic partial+final agg shape
    (whole-stage-codegen'd HashAggregate, no Python in the loop)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "f_mapped_clean_projection",
    oracle=FIXTURE_CTES
    + """
SELECT read_name, chr_index, pos, mapq,
       CAST(flags AS BIGINT) * 2 AS flags2
FROM alignments
WHERE (flags & 4) = 0 AND (flags & 8) = 0
  AND chr_index NOT IN (22, 23, 24)
  AND mapq >= 20
""",
)
def f_mapped_clean_projection(spark, sf_dir):
    """F-2 (multi-bit bitmask) + F-4 (ignore list) + F-5/F-8
    (projection & cast) composed; all predicates push into the scan."""
    al = _alignments(spark, sf_dir)
    al = filters.filter_unmapped(al, mask=4)
    al = filters.filter_unmapped(al, mask=8)
    al = filters.filter_ignore_list(al, "chr_index", [22, 23, 24])
    return al.filter(F.col("mapq") >= 20).select(
        "read_name", "chr_index", "pos", "mapq",
        (F.col("flags").cast("long") * 2).alias("flags2"),
    )


@query(
    "f_regex_readgroup",
    oracle=FIXTURE_CTES
    + """
SELECT CAST(regexp_extract(read_name, '^r([0-9]+)_([0-9]+)$', 1) AS BIGINT) % 10
           AS ord_mod,
       CAST(regexp_extract(read_name, '^r([0-9]+)_([0-9]+)$', 2) AS INTEGER)
           AS line_no,
       split_part(read_name, '_', 1) AS ord_token,
       count(*) AS n
FROM alignments
GROUP BY 1, 2, 3
""",
)
def f_regex_readgroup(spark, sf_dir):
    """F-10/F-11: regex field extraction + delimiter munging
    (Configuration.java:277-283 RGID-substring analog)."""
    al = _alignments(spark, sf_dir)
    pat = r"^r([0-9]+)_([0-9]+)$"
    return (
        al.select(
            (F.regexp_extract("read_name", pat, 1).cast("long") % 10).alias("ord_mod"),
            F.regexp_extract("read_name", pat, 2).cast("int").alias("line_no"),
            F.substring_index("read_name", "_", 1).alias("ord_token"),
        )
        .groupBy("ord_mod", "line_no", "ord_token")
        .agg(F.count("*").alias("n"))
    )


@query(
    "f_interval_sanity_fix",
    oracle=FIXTURE_CTES
    + """
SELECT chr_index, start,
       CASE WHEN start = "end" THEN "end" + 1 ELSE "end" END AS end_fixed
FROM exome_intervals
WHERE start >= 0 AND "end" >= start
""",
)
def f_interval_sanity_fix(spark, sf_dir):
    """F-9: zero-length interval fix (SparkGA1.scala:692-694)."""
    ivl = fixtures.exome_intervals(load_table(spark, sf_dir, "part"))
    return filters.fix_intervals(ivl).select(
        "chr_index", "start", F.col("end").alias("end_fixed")
    )


@query(
    "a_global_totals",
    oracle=FIXTURE_CTES
    + """
SELECT count(*) AS total_reads,
       count(DISTINCT chr_index * 1000000 + reg) AS n_regions,
       round(CAST(count(*) AS DOUBLE)
             / count(DISTINCT chr_index * 1000000 + reg), 6) AS avg_reads_per_region
FROM (
  SELECT a.chr_index,
         CAST(floor(CAST(a.pos AS DOUBLE) / d.region_size) AS INTEGER) AS reg
  FROM alignments a JOIN sequence_dict d USING (chr_index)
  WHERE (a.flags & 4) = 0
)
""",
)
def a_global_totals(spark, sf_dir):
    """A-2/A-3: global sum + distinct-region count + average
    (SparkGA1.scala:1138,1144-1147) in one pass."""
    al = filters.filter_unmapped(_alignments(spark, sf_dir))
    binned = binning.bin_by_region(al, _seq_dict(spark, sf_dir))
    key = F.col("chr_index").cast("long") * 1000000 + F.col("reg")
    return binned.agg(
        F.count("*").alias("total_reads"),
        F.countDistinct(key).alias("n_regions"),
        F.round(
            F.count("*").cast("double") / F.countDistinct(key), 6
        ).alias("avg_reads_per_region"),
    )


@query(
    "a_lpt_schedule",
    oracle=FIXTURE_CTES
    + """
SELECT chr_index, reg, n_reads,
       row_number() OVER (ORDER BY n_reads DESC, chr_index, reg) AS schedule_order
FROM (
  SELECT a.chr_index,
         CAST(floor(CAST(a.pos AS DOUBLE) / d.region_size) AS INTEGER) AS reg,
         count(*) AS n_reads
  FROM alignments a JOIN sequence_dict d USING (chr_index)
  GROUP BY 1, 2
)
""",
)
def a_lpt_schedule(spark, sf_dir):
    """A-5 + O-4: per-region weights, heaviest-first schedule order
    (SparkGA1.scala:1153-1162 LPT heuristic, rank materialized)."""
    from pyspark.sql import Window

    binned = binning.bin_by_region(_alignments(spark, sf_dir), _seq_dict(spark, sf_dir))
    weights = binned.groupBy("chr_index", "reg").agg(F.count("*").alias("n_reads"))
    w = Window.orderBy(F.desc("n_reads"), "chr_index", "reg")
    return weights.withColumn("schedule_order", F.row_number().over(w))


@query(
    "a_dedup_keep_best",
    oracle=FIXTURE_CTES
    + """
SELECT chr_index, count(*) AS n_unique_loci, CAST(sum(mapq) AS BIGINT) AS sum_best_mapq
FROM (
  SELECT chr_index, pos, mapq,
         row_number() OVER (PARTITION BY chr_index, pos
                            ORDER BY mapq DESC, read_name) AS rn
  FROM alignments
)
WHERE rn = 1
GROUP BY chr_index
""",
)
def a_dedup_keep_best(spark, sf_dir):
    """A-7: MarkDuplicates keep-best-quality-per-locus
    (SparkGA1.scala:837-839 semantics) then per-chr rollup."""
    from sparkga1_spark.operators.dedup import keep_best

    al = _alignments(spark, sf_dir)
    best = keep_best(
        al, keys=["chr_index", "pos"], order_cols=[F.desc("mapq"), "read_name"]
    )
    return best.groupBy("chr_index").agg(
        F.count("*").alias("n_unique_loci"),
        F.sum("mapq").cast("long").alias("sum_best_mapq"),
    )


# --------------------------------------------------------------------------
# M2 joins (SURVEY.md §7.3 M2): broadcast dim, multiway star,
# semi/anti known-sites, interval range join.
# --------------------------------------------------------------------------


@query(
    "j_star_revenue",
    oracle="""
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def j_star_revenue(spark, sf_dir):
    """Multiway equi-join over the star schema (SURVEY.md §2.4 'free'
    generalization of J-1): dims broadcast, fact never shuffled for the
    joins — only the final groupBy exchanges (partial aggs first)."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "j_semi_known_sites",
    oracle=FIXTURE_CTES
    + """
SELECT chr_index, count(*) AS n_at_known, CAST(sum(mapq) AS BIGINT) AS sum_mapq
FROM alignments a
WHERE EXISTS (SELECT 1 FROM known_sites k
              WHERE k.chr_index = a.chr_index AND k.pos = a.pos)
GROUP BY chr_index
""",
)
def j_semi_known_sites(spark, sf_dir):
    """J-3 semi form: reads AT known sites (broadcast left_semi)."""
    from sparkga1_spark.operators.joins import semi_join_sites

    al = _alignments(spark, sf_dir)
    ks = fixtures.known_sites(load_table(spark, sf_dir, "lineitem"))
    return (
        semi_join_sites(al, ks)
        .groupBy("chr_index")
        .agg(F.count("*").alias("n_at_known"),
             F.sum("mapq").cast("long").alias("sum_mapq"))
    )


@query(
    "j_anti_known_sites",
    oracle=FIXTURE_CTES
    + """
SELECT chr_index, count(*) AS n_novel
FROM alignments a
WHERE NOT EXISTS (SELECT 1 FROM known_sites k
                  WHERE k.chr_index = a.chr_index AND k.pos = a.pos)
GROUP BY chr_index
""",
)
def j_anti_known_sites(spark, sf_dir):
    """J-3 anti form: the BQSR -knownSites exclusion
    (SparkGA1.scala:898-905)."""
    from sparkga1_spark.operators.joins import anti_join_sites

    al = _alignments(spark, sf_dir)
    ks = fixtures.known_sites(load_table(spark, sf_dir, "lineitem"))
    return anti_join_sites(al, ks).groupBy("chr_index").agg(
        F.count("*").alias("n_novel")
    )


@query(
    "j_range_exome_overlap",
    oracle=FIXTURE_CTES
    + """
SELECT a.chr_index,
       count(*) AS n_pairs,
       CAST(sum(least(a.end_pos, i.end_fixed) - greatest(a.pos, i.start)) AS BIGINT)
           AS total_overlap
FROM alignments a
JOIN (SELECT chr_index, start,
             CASE WHEN start = "end" THEN "end" + 1 ELSE "end" END AS end_fixed
      FROM exome_intervals WHERE start >= 0 AND "end" >= start) i
  ON a.chr_index = i.chr_index
 AND a.pos < i.end_fixed AND i.start < a.end_pos
GROUP BY a.chr_index
""",
)
def j_range_exome_overlap(spark, sf_dir):
    """J-2: interval-overlap range join (bedtools intersect semantics,
    SparkGA1.scala:703-732) via the bin-bucket equi+range rewrite —
    DuckDB's oracle does the plain theta join; the engine's plan is a
    shuffled equi-join on (chr, bin) that AQE can balance at scale."""
    from sparkga1_spark.operators.joins import interval_overlap_join

    al = _alignments(spark, sf_dir)
    ivl = filters.fix_intervals(
        fixtures.exome_intervals(load_table(spark, sf_dir, "part"))
    )
    joined = interval_overlap_join(al, ivl, broadcast_intervals=True)
    overlap = F.least(F.col("end_pos"), F.col("end")) - F.greatest(
        F.col("pos"), F.col("start")
    )
    return joined.groupBy("chr_index").agg(
        F.count("*").alias("n_pairs"),
        F.sum(overlap).cast("long").alias("total_overlap"),
    )


# --------------------------------------------------------------------------
# M3 windows (SURVEY.md §7.3 M3) + M4 set ops.
# --------------------------------------------------------------------------


@query(
    "p2_interval_coalesce",
    oracle=FIXTURE_CTES
    + """
SELECT chr_index, min(pos) AS island_start, max(end_pos) AS island_end,
       count(*) AS n_records
FROM (
  SELECT chr_index, pos, end_pos,
         sum(ni) OVER (PARTITION BY chr_index
                       ORDER BY pos, end_pos, read_name
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM (
    SELECT *, CASE WHEN prev_max IS NULL OR pos > prev_max + 51
                   THEN 1 ELSE 0 END AS ni
    FROM (
      SELECT chr_index, pos, end_pos, read_name,
             max(end_pos) OVER (PARTITION BY chr_index
                                ORDER BY pos, end_pos, read_name
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max
      FROM alignments
    )
  )
)
GROUP BY chr_index, island
""",
)
def p2_interval_coalesce(spark, sf_dir):
    """P2-6: gaps-and-islands interval coalescing with 51-bp slack
    (RegionIterator.java:101-132, INTERVAL_OVERLAP at :59)."""
    from sparkga1_spark.operators.windows import coalesce_intervals

    al = _alignments(spark, sf_dir)
    return coalesce_intervals(
        al, partition_cols=("chr_index",), slack=51, order_tiebreak=("read_name",)
    ).select("chr_index", "island_start", "island_end", "n_records")


@query(
    "p2_equal_freq_buckets",
    oracle=FIXTURE_CTES
    + """
SELECT chr_index, bucket, count(*) AS n, min(pos) AS lo, max(pos) AS hi
FROM (
  SELECT chr_index, pos,
         ntile(8) OVER (PARTITION BY chr_index ORDER BY pos, read_name) AS bucket
  FROM alignments
)
GROUP BY chr_index, bucket
""",
)
def p2_equal_freq_buckets(spark, sf_dir):
    """P2-4: equal-frequency re-split of a region's positions
    (SparkGA1.scala:304-418 gather-sort-cut, as ntile). At scale the
    physical form is repartitionByRange; this materializes the exact
    bucket semantics."""
    from sparkga1_spark.operators.windows import equal_frequency_buckets

    al = _alignments(spark, sf_dir)
    b = equal_frequency_buckets(
        al,
        partition_cols=("chr_index",),
        order_cols=("pos", "read_name"),
        n_buckets=8,
    )
    return b.groupBy("chr_index", "bucket").agg(
        F.count("*").alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi")
    )


@query(
    "p2_skew_detect",
    oracle=FIXTURE_CTES
    + """
SELECT chr_index, reg, n_reads,
       CAST(floor(n_reads * 4.0 / avg_reads + 0.5) AS INTEGER) AS segments
FROM (
  SELECT chr_index, reg, n_reads,
         avg(n_reads) OVER () AS avg_reads
  FROM (
    SELECT a.chr_index,
           CAST(floor(CAST(a.pos AS DOUBLE) / d.region_size) AS INTEGER) AS reg,
           count(*) AS n_reads
    FROM alignments a JOIN sequence_dict d USING (chr_index)
    GROUP BY 1, 2
  )
)
WHERE floor(n_reads * 4.0 / avg_reads + 0.5) > 1
""",
)
def p2_skew_detect(spark, sf_dir):
    """P2-3: skew detection — segments = round(reads × regionsFactor /
    avgReadsPerRegion) with regionsFactor=4 (SparkGA1.scala:241-242);
    rounding via floor(x+0.5) so both engines agree on .5 ties."""
    binned = binning.bin_by_region(_alignments(spark, sf_dir), _seq_dict(spark, sf_dir))
    weights = binned.groupBy("chr_index", "reg").agg(F.count("*").alias("n_reads"))
    from pyspark.sql import Window

    avg = F.avg("n_reads").over(Window.partitionBy())
    seg = F.floor(F.col("n_reads") * 4.0 / avg + 0.5)
    return (
        weights.withColumn("segments", seg.cast("int"))
        .filter(F.col("segments") > 1)
        .select("chr_index", "reg", "n_reads", "segments")
    )


@query(
    "o_global_sort_vcf",
    oracle=FIXTURE_CTES
    + """
SELECT chr_index, pos, id, qual, filter,
       row_number() OVER (ORDER BY chr_index, pos, id) AS global_rank
FROM (
  SELECT -1 AS chr_index, CAST(r_regionkey AS INTEGER) AS pos,
         r_name AS id, 0.0 AS qual, 'header' AS filter
  FROM region
  UNION ALL
  SELECT chr_index, pos, id, qual, filter FROM variants
)
""",
)
def o_global_sort_vcf(spark, sf_dir):
    """O-2 + U-2: header rows (chr_index=-1) unioned with the variant
    body, globally ordered by composite key — the reference's final
    sortByKey merge (SparkGA1.scala:1190-1192, 1241), with the rank
    materialized so ordering is oracle-checkable."""
    from pyspark.sql import Window

    va = fixtures.variants(load_table(spark, sf_dir, "orders")).select(
        "chr_index", "pos", "id", "qual", "filter"
    )
    hdr = load_table(spark, sf_dir, "region").select(
        F.lit(-1).alias("chr_index"),
        F.col("r_regionkey").cast("int").alias("pos"),
        F.col("r_name").alias("id"),
        F.lit(0.0).alias("qual"),
        F.lit("header").alias("filter"),
    )
    unioned = hdr.unionByName(va)
    w = Window.orderBy("chr_index", "pos", "id")
    return unioned.withColumn("global_rank", F.row_number().over(w))


@query(
    "u_distinct_variants",
    oracle=FIXTURE_CTES
    + """
SELECT chr_index, pos, id, ref, alt, qual, filter
FROM (
  SELECT chr_index, pos, id, ref, alt, qual, filter FROM variants
  UNION ALL
  SELECT chr_index, pos, id, ref, alt, qual, filter FROM variants
  WHERE CAST(id AS BIGINT) % 7 = 0
)
GROUP BY ALL
""",
)
def u_distinct_variants(spark, sf_dir):
    """U-3: duplicate VCF lines from overlapping region boundaries
    removed by distinct (SparkGA1.scala:1241)."""
    va = fixtures.variants(load_table(spark, sf_dir, "orders")).select(
        "chr_index", "pos", "id", "ref", "alt", "qual", "filter"
    )
    dup = va.filter(F.col("id").cast("long") % 7 == 0)
    return va.unionByName(dup).distinct()


@query(
    "u_intersect_except",
    oracle="""
SELECT 'both' AS tag, k FROM (
  SELECT DISTINCT o_custkey AS k FROM orders
  INTERSECT
  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
)
UNION ALL
SELECT 'only_orders' AS tag, k FROM (
  SELECT DISTINCT o_custkey AS k FROM orders
  EXCEPT
  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
)
""",
)
def u_intersect_except(spark, sf_dir):
    """Relational intersect/except (SURVEY.md §2.6: interval-only in the
    reference, free in the engine)."""
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("k")
    )
    both = od.intersect(cu).select(F.lit("both").alias("tag"), "k")
    only = od.exceptAll(cu.distinct()).select(F.lit("only_orders").alias("tag"), "k")
    return both.unionByName(only)


@query(
    "o_secondary_sort_first",
    oracle=FIXTURE_CTES
    + """
SELECT chr_index, reg, read_name AS first_read, pos AS first_pos
FROM (
  SELECT a.chr_index,
         CAST(floor(CAST(a.pos AS DOUBLE) / d.region_size) AS INTEGER) AS reg,
         a.read_name, a.pos,
         row_number() OVER (
           PARTITION BY a.chr_index,
                        CAST(floor(CAST(a.pos AS DOUBLE) / d.region_size) AS INTEGER)
           ORDER BY a.pos, a.read_name) AS rn
  FROM alignments a JOIN sequence_dict d USING (chr_index)
)
WHERE rn = 1
""",
)
def o_secondary_sort_first(spark, sf_dir):
    """O-1: per-region coordinate sort (SparkGA1.scala:741-747) made
    observable — the first record of each (chr, reg) under the sort."""
    from sparkga1_spark.operators.windows import rank_in_group

    binned = binning.bin_by_region(_alignments(spark, sf_dir), _seq_dict(spark, sf_dir))
    ranked = rank_in_group(
        binned, partition_cols=("chr_index", "reg"), order_cols=("pos", "read_name")
    )
    return ranked.filter(F.col("rn") == 1).select(
        "chr_index", "reg",
        F.col("read_name").alias("first_read"), F.col("pos").alias("first_pos"),
    )


@query(
    "o_topk_per_chr",
    oracle=FIXTURE_CTES
    + """
SELECT chr_index, read_name, mapq
FROM (
  SELECT chr_index, read_name, mapq,
         row_number() OVER (PARTITION BY chr_index
                            ORDER BY mapq DESC, read_name) AS rn
  FROM alignments
)
WHERE rn <= 3
""",
)
def o_topk_per_chr(spark, sf_dir):
    """Top-k per group (SURVEY.md §2.5 addition): best 3 reads per chr."""
    from sparkga1_spark.operators.windows import top_k_per_group

    al = _alignments(spark, sf_dir)
    return top_k_per_group(
        al,
        partition_cols=("chr_index",),
        order_cols=(F.desc("mapq"), "read_name"),
        k=3,
    ).select("chr_index", "read_name", "mapq")


@query(
    "w_running_revenue",
    oracle="""
SELECT o_orderkey, o_custkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW), 2) AS running_total,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
""",
)
def w_running_revenue(spark, sf_dir):
    """Analytic frame (running total per customer) — the cumulative
    window family the reference lacks but any engine user expects."""
    from pyspark.sql import Window

    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return od.select(
        "o_orderkey", "o_custkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )
