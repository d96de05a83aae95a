"""Exactly-once streaming sinks (SURVEY.md §2.9 + S-4 manifest
checkpoint).

Structured Streaming's foreachBatch gives at-least-once delivery: after
a crash between "sink wrote" and "checkpoint advanced", the SAME
micro-batch is redelivered with the SAME batch_id. The standard
exactly-once recipe (Spark docs, "foreachBatch — reusing existing batch
data sources") is therefore (a) an idempotent keyed write, plus (b) a
batch-id ledger so a replayed batch is recognized and skipped. The
reference's streaming part-1 loop gets this from its upload-marker
protocol (SparkGA1.scala:1050-1081 — a chunk is processed once because
its marker file is consumed); the ledger is that marker, re-expressed
as commit files next to the table.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from sparkga1_spark.sources.sinks import upsert_parquet


def _require_local_path(base_path: str) -> None:
    """The ledger/existence checks in this module run through the
    driver's LOCAL filesystem (os.path / os.listdir). On a URI-scheme
    path (hdfs://, s3a://…) those checks would silently report
    "missing table, empty ledger" and the bootstrap branch would
    OVERWRITE an existing remote table — so refuse loudly. Porting to
    remote storage means re-expressing the ledger with the Hadoop
    FileSystem API (exists/listStatus/rename), the same handle
    upsert_parquet already uses for its commit renames."""
    import re

    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", base_path):
        raise NotImplementedError(
            f"foreach_batch_upsert ledger is driver-local-filesystem "
            f"only; got URI-scheme path {base_path!r} — port the ledger "
            "to the Hadoop FileSystem API for remote tables"
        )


def _ledger_dir(base_path: str) -> str:
    return base_path.rstrip("/") + "__batches"


def committed_batches(base_path: str) -> set[int]:
    """Batch ids already merged into the table at base_path."""
    d = _ledger_dir(base_path)
    if not os.path.isdir(d):
        return set()
    return {
        int(name)
        for name in os.listdir(d)
        if name.isdigit() and os.path.isfile(os.path.join(d, name))
    }


def foreach_batch_upsert(base_path: str, *, keys: Sequence[str]):
    """Build a foreachBatch function that MERGEs each micro-batch into
    the parquet table at `base_path`, exactly-once under replay:

    - The upsert itself is keyed MERGE (updates win per key), so
      re-applying the same rows is a no-op on table CONTENT even
      without the ledger.
    - The ledger (one empty commit file per batch_id, written AFTER the
      upsert's commit-by-rename) makes replay a cheap skip and — the
      part idempotence alone can't give — keeps a replayed old batch
      from clobbering a NEWER version of a key written by a later
      batch: redelivery of batch N after batch N+1 committed is
      detected and dropped instead of re-merged.

    Crash windows: before the upsert's rename commit → base table
    untouched, replay re-runs cleanly. Between upsert commit and ledger
    write → replay re-merges the same rows; content is unchanged
    because no later batch can have committed in between (foreachBatch
    is sequential per query). Between upsert_parquet's TWO renames →
    no dir at base_path, but the merged table is stranded at a
    __tmp_<token> sibling: replay first runs
    recover_interrupted_upsert, then re-merges. The BOOTSTRAP
    overwrite therefore requires table-missing AND ledger-empty — with
    committed batches on record, a missing table is an interrupted
    swap (recoverable) or external damage (raise), never a license to
    overwrite history with one batch's rows. The ledger write is a
    create-then-rename so a torn file never counts as committed.

    Use: `stream.writeStream.foreachBatch(foreach_batch_upsert(path,
    keys=[...])).option("checkpointLocation", ...).start()`.
    """
    _require_local_path(base_path)

    def apply(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if int(batch_id) in committed_batches(base_path):
            return  # redelivered batch: already merged, skip
        if not os.path.isdir(base_path) and committed_batches(base_path):
            from sparkga1_spark.sources.sinks import recover_interrupted_upsert

            if not recover_interrupted_upsert(spark, base_path):
                raise RuntimeError(
                    f"foreach_batch_upsert: ledger records committed "
                    f"batches but no table exists at {base_path} and no "
                    "stranded upsert dir is recoverable — refusing to "
                    "re-bootstrap over committed history"
                )
        if not os.path.isdir(base_path):
            batch_df.write.mode("overwrite").parquet(base_path)
        else:
            upsert_parquet(spark, base_path, batch_df, keys=list(keys))
        d = _ledger_dir(base_path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{batch_id}.tmp")
        with open(tmp, "w"):
            pass
        os.replace(tmp, os.path.join(d, str(int(batch_id))))

    return apply
