"""BPE tokenizer training (Sennrich et al. 2016) as Spark plans.

x_bpe_pair_counts computes ONE round of pair statistics; this module
runs the actual iterative trainer: k rounds of (count adjacent symbol
pairs weighted by word frequency) → (argmax pair, deterministic
tiebreak) → (merge that pair everywhere) — the algorithm every
public BPE implementation runs on the word-frequency table.

Scale shape (why trainers survive 100 TB): the corpus is touched
EXACTLY ONCE (the word-frequency aggregate, the same shuffle
x_vocab_topk pays); every merge round then runs over the vocabulary
table only — millions of rows, not the corpus — and the driver pulls
ONE row per round (the argmax), the k-means-precedent collect size.
Symbols are kept as a space-joined string and merges applied with
literal replace(), matching the left-to-right non-overlapping merge
of the reference implementations; pair occurrences count overlaps
(zip of consecutive symbols), also matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparkga1_spark.operators.cache import tracked_persist


def _bpe_rounds(word_freq: DataFrame, rounds: int):
    """Shared merge loop: (w, f) word-frequency table → (final vocab
    DataFrame (w, s, f) with all merges applied, merges list of
    (rnd, pair, merged, wcount)). The trainer returns the merges; the
    encoder returns the segmented vocab — same loop, so the two can
    never disagree about what the learned merges do."""
    wf = word_freq.select(
        "w", F.array_join(F.split("w", ""), " ").alias("s"), F.col("f")
    )
    # the vocab table feeds every round — persist the base once; each
    # round's replace() is a narrow op over the cached rows
    wf = tracked_persist(wf)
    merges = []
    for rnd in range(1, rounds + 1):
        pairs = (
            wf.select("f", F.split("s", " ").alias("l"))
            .filter(F.size("l") >= 2)
            .select(
                "f",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(l) - 1),"
                        " i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"
                    )
                ).alias("pr"),
            )
            .groupBy("pr")
            .agg(F.sum("f").cast("long").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "pr").limit(1).collect()
        if not top:
            break  # vocabulary fully merged — nothing adjacent remains
        pr, cnt = top[0].pr, int(top[0].cnt)
        merged = pr.replace(" ", "")
        merges.append((rnd, pr, merged, cnt))
        # literal (non-regex) replace via column args — pair text comes
        # from corpus data, so never interpolate it into an expr string
        wf = wf.withColumn("s", F.replace("s", F.lit(pr), F.lit(merged)))
    return wf, merges


def bpe_train_merges(
    spark: SparkSession, word_freq: DataFrame, rounds: int = 5
) -> DataFrame:
    """(w, f) word-frequency table → one row per learned merge:
    (rnd, pair, merged, wcount). wcount is the weighted pair count
    that JUSTIFIED the merge (measured before applying it), so the
    output pins every round's full count-argmax-merge cycle."""
    _, merges = _bpe_rounds(word_freq, rounds)
    return spark.createDataFrame(
        merges, "rnd int, pair string, merged string, wcount long"
    )


def bpe_segment_vocab(
    spark: SparkSession, word_freq: DataFrame, rounds: int = 5
) -> DataFrame:
    """(w, f) word-frequency table → (w, n_tok): token count per
    vocabulary word AFTER the learned merges — the ENCODE side of BPE.
    Tokenizing a corpus never touches document text a second time:
    the vocab table (corpus-bounded, millions of rows at 100 TB, not
    trillions) carries the segmentation, and per-doc token counts are
    one join of the word-occurrence stream against it."""
    wf, _ = _bpe_rounds(word_freq, rounds)
    return wf.select(
        "w", F.size(F.split("s", " ")).cast("long").alias("n_tok")
    )
