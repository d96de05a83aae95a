"""Event-time windowing (SURVEY.md §2.9 engine additions).

The reference has no event-time semantics (chunks are independent); the
engine adds the standard Structured Streaming window family over the
`events` fixture: tumbling / sliding / session windows + watermark
late-data handling + within-watermark dedup. Each helper works on BOTH
a batch DataFrame and a streaming one (same Column expressions), which
is how the batch oracles validate the streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from sparkga1_spark.functions.numeric import davg, dsum, hround


def tumbling_counts(
    events: DataFrame, *, width_s: int = 300, watermark: str | None = None
) -> DataFrame:
    """Tumbling event-time windows; output keyed by window-start epoch
    seconds (bigint — oracle-safe, no timestamp hashing)."""
    df = events
    if watermark is not None:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", f"{width_s} seconds"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_avg(
    events: DataFrame, *, width_s: int = 600, slide_s: int = 300,
    watermark: str | None = None,
) -> DataFrame:
    """Sliding windows (each event lands in width/slide windows)."""
    df = events
    if watermark is not None:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", f"{width_s} seconds", f"{slide_s} seconds"))
        .agg(F.count("*").alias("n"), davg("value").alias("avg_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "n",
            "avg_value",
        )
    )


def session_windows(
    events: DataFrame, *, gap_s: int = 1800, by: str = "user_id"
) -> DataFrame:
    """Per-key session windows with a fixed inactivity gap. Batch path
    uses the gaps-and-islands construction (same operator family as the
    genomics interval coalescing, operators/windows.py); the streaming
    path uses F.session_window — semantics identical BECAUSE the gap
    test here is microsecond-precision and half-open (diff >= gap
    starts a new session), exactly native session_window's
    [start, start+gap) rule. Whole-second unix_timestamp with a strict
    '>' would truncate sub-second gaps and merge a 1800.5s-apart pair
    the native operator splits (and split/merge an exact-1800s pair
    differently) — a latent divergence on any boundary data."""
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_sess = F.when(
        prev_us.isNull() | (us - prev_us >= F.lit(gap_s) * 1_000_000),
        1,
    ).otherwise(0)
    sess = (
        events.withColumn("_new", new_sess)
        .withColumn(
            "_sess",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return sess.groupBy(by, "_sess").agg(
        F.unix_timestamp(F.min("ts")).alias("session_start"),
        F.unix_timestamp(F.max("ts")).alias("session_end"),
        F.count("*").alias("n_events"),
        dsum("value").alias("sum_value"),
    ).drop("_sess")
