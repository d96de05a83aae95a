"""Genomics-shaped fixtures derived deterministically from the star schema.

FIXTURES.md defines the record kinds of the reference (SAM alignments,
sequence dictionary, BED intervals, known-sites VCF, variants); the
testdata only ships the star schema, so each fixture is DERIVED from a
star table with exact integer arithmetic. Every derivation exists in two
mirrored forms:

- a DataFrame builder (Spark side of a query), and
- a SQL CTE fragment (DuckDB oracle side),

kept textually adjacent so drift is visible in review. Only integer ops
(`*`, `+`, `%`, string concat of ints) are used — both engines compute
them exactly, so oracle value-hashes match.

Reference semantics being modeled:
- alignments = SAM rows keyed (chr, pos) with bitmask flags
  (SamRegionsParser.scala:42-60)
- sequence_dict = .dict file → (name, index, len, region_size)
  (DictParser.java:108-154, 80-96)
- exome_intervals = BED rows incl. zero-length start==end rows
  (SparkGA1.scala:684-697)
- known_sites = known SNP/indel positions for semi/anti joins
  (SparkGA1.scala:898-905)
- variants = VCF rows keyed (chr_index, pos) with header rows at
  chr_index=-1 (SparkGA1.scala:968-985)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------- alignments

ALIGNMENTS_SQL = """
  SELECT
    'r' || CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)
        AS read_name,
    CAST(l_suppkey % 16 AS INTEGER)        AS flags,
    CAST(l_partkey % 25 AS INTEGER)        AS chr_index,
    CAST((l_orderkey * 37 + l_linenumber * 101) % 1000000 + 1 AS INTEGER) AS pos,
    CAST((l_orderkey * 37 + l_linenumber * 101) % 1000000 + 101
         + CAST(l_partkey % 51 AS INTEGER) AS INTEGER) AS end_pos,
    CAST((l_orderkey * 7 + l_linenumber * 13) % 61 AS INTEGER) AS mapq,
    l_returnflag                           AS rg,
    l_quantity                             AS weight,
    MAP {'RG': l_returnflag,
         'NM': CAST((l_orderkey + l_linenumber) % 10 AS VARCHAR),
         'AS': CAST((l_orderkey * 7) % 100 AS VARCHAR)} AS attrs
  FROM lineitem
"""


def alignments(lineitem: DataFrame) -> DataFrame:
    """SAM-shaped fact table (FIXTURES.md §2) derived from lineitem."""
    pos = (F.col("l_orderkey") * 37 + F.col("l_linenumber") * 101) % 1000000 + 1
    return lineitem.select(
        F.concat(
            F.lit("r"), F.col("l_orderkey").cast("string"),
            F.lit("_"), F.col("l_linenumber").cast("string"),
        ).alias("read_name"),
        (F.col("l_suppkey") % 16).cast("int").alias("flags"),
        (F.col("l_partkey") % 25).cast("int").alias("chr_index"),
        pos.cast("int").alias("pos"),
        (pos + 100 + (F.col("l_partkey") % 51).cast("int")).cast("int").alias("end_pos"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 61)
            .cast("int").alias("mapq"),
        F.col("l_returnflag").alias("rg"),
        F.col("l_quantity").alias("weight"),
        # SAM optional attributes as map<string,string> — the htsjdk
        # attr surface (SamRecsReader.scala:110; RG tagging
        # SparkGA1.scala:621-628). Values derived with integer ops so
        # the DuckDB MAP mirror is exact.
        F.create_map(
            F.lit("RG"), F.col("l_returnflag"),
            F.lit("NM"),
            ((F.col("l_orderkey") + F.col("l_linenumber")) % 10).cast("string"),
            F.lit("AS"), ((F.col("l_orderkey") * 7) % 100).cast("string"),
        ).alias("attrs"),
    )


# ------------------------------------------------------------- sequence_dict

SEQUENCE_DICT_SQL = """
  SELECT
    n_name                                    AS chr_name,
    CAST(n_nationkey AS INTEGER)              AS chr_index,
    CAST(1000000 AS BIGINT)                   AS chr_len,
    CAST(20000 + n_nationkey * 1000 AS INTEGER) AS region_size
  FROM nation
"""


def sequence_dict(nation: DataFrame) -> DataFrame:
    """Sequence-dictionary dimension (FIXTURES.md §1): 25 'chromosomes'
    with per-chr bin width, mirroring DictParser.java:80-96."""
    return nation.select(
        F.col("n_name").alias("chr_name"),
        F.col("n_nationkey").cast("int").alias("chr_index"),
        F.lit(1000000).cast("long").alias("chr_len"),
        (F.lit(20000) + F.col("n_nationkey") * 1000).cast("int").alias("region_size"),
    )


# ----------------------------------------------------------- exome_intervals

EXOME_INTERVALS_SQL = """
  SELECT
    CAST(p_partkey % 25 AS INTEGER)            AS chr_index,
    CAST((p_partkey * 7919) % 1000000 AS BIGINT) AS start,
    CAST((p_partkey * 7919) % 1000000
         + CASE WHEN p_partkey % 10 = 0 THEN 0
                ELSE (p_partkey % 7 + 1) * 800 END AS BIGINT) AS "end"
  FROM part
"""


def exome_intervals(part: DataFrame) -> DataFrame:
    """BED-shaped interval table (FIXTURES.md §3). Every 10th row is
    zero-length (start==end) to exercise the sanity fix of
    SparkGA1.scala:692-694."""
    start = (F.col("p_partkey") * 7919) % 1000000
    length = F.when(F.col("p_partkey") % 10 == 0, F.lit(0)).otherwise(
        (F.col("p_partkey") % 7 + 1) * 800
    )
    return part.select(
        (F.col("p_partkey") % 25).cast("int").alias("chr_index"),
        start.cast("long").alias("start"),
        (start + length).cast("long").alias("end"),
    )


# --------------------------------------------------------------- known_sites

KNOWN_SITES_SQL = """
  SELECT DISTINCT
    CAST(l_partkey % 25 AS INTEGER) AS chr_index,
    CAST((l_orderkey * 37 + l_linenumber * 101) % 1000000 + 1 AS INTEGER) AS pos
  FROM lineitem
  WHERE l_orderkey % 11 = 0
"""


def known_sites(lineitem: DataFrame) -> DataFrame:
    """Known-sites lookup table (FIXTURES.md §4): a deterministic subset
    of alignment loci, so semi/anti joins (J-3) have real hit rates."""
    return (
        alignments(lineitem.filter(F.col("l_orderkey") % 11 == 0))
        .select("chr_index", "pos")
        .distinct()
    )


# ------------------------------------------------- embeddings with near-dups
#
# The raw embeddings table has no cosine pair above ~0.51 at small SF, so
# a near-dup query at a meaningful τ (0.8+) returns 0 rows on both engines
# — a vacuous gate. This derivation plants deterministic near-duplicates:
# every 25th vector gets a copy (vec_id + 1_000_000) perturbed additively
# by 0.01·(((vec_id + j) mod 5) − 2) per component j (cosine ≈ 0.9937 —
# measured at sf0.01). Integer ops + one double literal, so both engines
# compute bit-identical vectors.

EMB_NEARDUP_SQL = """
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         [CAST(embedding[j] AS DOUBLE) + 0.01 * (((vec_id + j - 1) % 5) - 2)
          for j in generate_series(1, len(embedding))] AS embedding
  FROM embeddings
  WHERE vec_id % 25 = 0
"""


def embeddings_with_neardups(emb: DataFrame) -> DataFrame:
    """Embeddings plus planted near-duplicate copies (see EMB_NEARDUP_SQL;
    j is 0-based here, 1-based in DuckDB — the (vec_id + j) terms align)."""
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, j: x
            + F.lit(0.01) * ((F.col("vec_id") + j) % 5 - 2).cast("double"),
        ).alias("embedding"),
    )
    return base.unionAll(pert)


# ------------------------------------------------ documents with planted PII
#
# The synthetic documents are clean word-salad, so PII/URL scrubbing
# over the raw table is vacuous (0 == 0 rows proves nothing — same
# lesson as EMB_NEARDUP_SQL). Every 7th document gets a deterministic
# contact tail: an email, a URL and a phone-shaped token derived from
# doc_id with integer arithmetic + lpad, identical on both engines.

DOCS_PII_SQL = """
  SELECT doc_id, lang, source,
         CASE WHEN doc_id % 7 = 0 THEN
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.example.com'
                || ' visit http://site' || CAST(doc_id % 13 AS VARCHAR)
                || '.example.org/p/' || CAST(doc_id % 3 AS VARCHAR)
                || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE text END AS text
  FROM documents
"""


def documents_with_pii(docs: DataFrame) -> DataFrame:
    """Documents plus planted contact strings (mirror of DOCS_PII_SQL)."""
    k = F.col("doc_id")
    tail = F.concat(
        F.col("text"),
        F.lit(" contact user"), k.cast("string"),
        F.lit("@mail"), (k % 5).cast("string"), F.lit(".example.com"),
        F.lit(" visit http://site"), (k % 13).cast("string"),
        F.lit(".example.org/p/"), (k % 3).cast("string"),
        F.lit(" call 555-"), F.lpad((k % 10000).cast("string"), 4, "0"),
    )
    return docs.select(
        "doc_id", "lang", "source",
        F.when(k % 7 == 0, tail).otherwise(F.col("text")).alias("text"),
    )


# Near-twin documents: every 25th doc gets a SECOND copy (doc_id +
# 2,000,000) whose text differs only by an appended marker word — a
# tiny edit in shingle space, so a sound near-dup pipeline MUST pair
# twin with original (non-vacuous gate for fingerprint pairing; same
# planted-signal lesson as EMB_NEARDUP_SQL / DOCS_PII_SQL).

DOCS_NEARTWIN_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         text || ' twinmark' || CAST(doc_id % 7 AS VARCHAR) AS text
  FROM documents WHERE doc_id % 25 = 0
"""


def documents_with_neartwins(docs: DataFrame) -> DataFrame:
    """Documents plus planted near-twin copies (mirror of
    DOCS_NEARTWIN_SQL)."""
    twins = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(
            F.col("text"),
            F.lit(" twinmark"),
            (F.col("doc_id") % 7).cast("string"),
        ).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(twins)


# Long documents with planted twins: 8 consecutive docs concatenate
# into one ~400-token document (doc_id div 8, texts joined in doc_id
# order — deterministic on both engines), and every 5th long doc gets
# a twin (ldoc_id + 3,000,000) differing by ONE appended word. A
# one-word edit in a long document shifts <1% of its shingles — the
# regime where the public 64-bit / Hamming≤3 SimHash recipe (Manku et
# al. 2007) applies; contrast DOCS_NEARTWIN_SQL, whose ~55-token docs
# flip enough bits that pairing needs d≤6 at 48 bits.

DOCS_LONGDOC_SQL = """
  SELECT ldoc_id, text FROM (
    SELECT doc_id // 8 AS ldoc_id,
           string_agg(text, ' ' ORDER BY doc_id) AS text
    FROM documents GROUP BY doc_id // 8
  )
  UNION ALL
  SELECT ldoc_id + 3000000 AS ldoc_id,
         text || ' longtwinmark' || CAST(ldoc_id % 11 AS VARCHAR) AS text
  FROM (
    SELECT doc_id // 8 AS ldoc_id,
           string_agg(text, ' ' ORDER BY doc_id) AS text
    FROM documents GROUP BY doc_id // 8
  )
  WHERE ldoc_id % 5 = 0
"""


def documents_longdoc_twins(docs: DataFrame) -> DataFrame:
    """Long concatenated documents plus planted one-word-edit twins
    (mirror of DOCS_LONGDOC_SQL). The collect_list is sorted by
    (doc_id, text) struct order before joining, so the concatenation
    is deterministic under any partitioning."""
    base = (
        docs.groupBy(F.expr("doc_id div 8").alias("ldoc_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "text"))
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text")
        )
    )
    twins = base.filter(F.col("ldoc_id") % 5 == 0).select(
        (F.col("ldoc_id") + 3_000_000).alias("ldoc_id"),
        F.concat(
            F.col("text"),
            F.lit(" longtwinmark"),
            (F.col("ldoc_id") % 11).cast("string"),
        ).alias("text"),
    )
    return base.unionByName(twins)


# ------------------------------------------------------------------ variants

VARIANTS_SQL = """
  SELECT
    CAST(o_orderkey % 25 AS INTEGER)                  AS chr_index,
    CAST((o_orderkey * 53) % 1000000 + 1 AS INTEGER)  AS pos,
    CAST(o_orderkey AS VARCHAR)                       AS id,
    CASE o_orderkey % 4 WHEN 0 THEN 'A' WHEN 1 THEN 'C'
                        WHEN 2 THEN 'G' ELSE 'T' END  AS ref,
    CASE o_orderkey % 3 WHEN 0 THEN 'A' WHEN 1 THEN 'G'
                        ELSE 'T' END                  AS alt,
    CAST(o_orderkey % 1000 AS DOUBLE) / 10.0          AS qual,
    CASE WHEN o_orderkey % 5 = 0 THEN '.'
         ELSE 'PASS' END                              AS filter,
    CAST(o_orderkey % 40 AS INTEGER)                  AS region_id
  FROM orders
"""


def variants(orders: DataFrame) -> DataFrame:
    """VCF-shaped output table (FIXTURES.md §5), keyed (chr_index, pos)
    for the global composite-key sort (O-2) and distinct-dedup (U-3)."""
    k = F.col("o_orderkey")
    return orders.select(
        (k % 25).cast("int").alias("chr_index"),
        ((k * 53) % 1000000 + 1).cast("int").alias("pos"),
        k.cast("string").alias("id"),
        F.element_at(F.array(F.lit("A"), F.lit("C"), F.lit("G"), F.lit("T")),
                     (k % 4).cast("int") + 1).alias("ref"),
        F.element_at(F.array(F.lit("A"), F.lit("G"), F.lit("T")),
                     (k % 3).cast("int") + 1).alias("alt"),
        ((k % 1000).cast("double") / 10.0).alias("qual"),
        F.when(k % 5 == 0, F.lit(".")).otherwise(F.lit("PASS")).alias("filter"),
        (k % 40).cast("int").alias("region_id"),
    )
