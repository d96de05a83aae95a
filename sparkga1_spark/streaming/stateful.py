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
