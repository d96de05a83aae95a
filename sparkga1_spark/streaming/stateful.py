"""Custom stateful streaming operators (SURVEY.md §2.9 engine
additions): applyInPandasWithState — the streaming analog of the batch
black-box transform surface (operators/transform.py).

The reference has no stateful streaming (chunks are independent,
aggregation deferred to batch Part 2); a modern pipeline needs running
per-key state (counters, dedup sets, session accumulators) that
survives across micro-batches. State is partitioned by key → scales
with executor count; the state store checkpoints with the query.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running event count + value sum, updated every
    micro-batch, emitted as one row per (user, batch) — the canonical
    keyed-state shape."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_finalize_on_timeout(events: DataFrame, *, gap_minutes: int = 10) -> DataFrame:
    """Session accumulator with EVENT-TIME TIMEOUT: state absorbs a
    user's events; when the watermark passes last_seen + gap, the state
    times out and the CLOSED session is emitted exactly once (n_events,
    last epoch-second). The emit-on-close contract is what downstream
    exactly-once sinks want — nothing is emitted while a session is
    still open. Timeout timestamps ride the checkpoint, so close events
    fire correctly across query restarts (tested with a two-phase
    availableNow drain)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            n, last_s = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "last_epoch_s": [last_s]}
            )
            return
        n, last_s = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # ts arrives as pandas timestamps (UTC session); epoch seconds
            last_s = max(last_s, int(pdf["ts"].max().timestamp()))
        state.update((n, last_s))
        state.setTimeoutTimestamp((last_s + gap_minutes * 60) * 1000)
        yield pd.DataFrame(
            {"user_id": [], "n_events": [], "last_epoch_s": []}
        ).astype({"user_id": "int64", "n_events": "int64", "last_epoch_s": "int64"})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, last_epoch_s long",
        stateStructType="n long, last_s long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
