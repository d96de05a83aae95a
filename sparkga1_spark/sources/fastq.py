"""FASTQ chunk ingestion (the reference's actual input format).

The reference consumes gzipped FASTQ chunks one-file-per-task
(SparkGA1.scala:1084-1098; 4-line records: @name / sequence / + /
quality, pairs interleaved per README.md:130). The Spark-first form:

- `binaryFile` source: one row per chunk file (path, bytes) — the
  file-granular unit the chunker produced, with Spark handling
  distribution instead of a hand-rolled downloader;
- an Arrow-batched mapInPandas flatMap decompresses and parses each
  chunk into typed read records (the X-1 1→N shape; gunzip = X-6).

A 60 MB gzip chunk (the reference's tuning) decodes to ~250 MB of
records per task — the same memory envelope the reference's bwa tasks
had. For bigger chunks, split upstream or switch to the `text` source
with record re-assembly.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

READ_SCHEMA = (
    "chunk string, read_idx long, read_name string, sequence string, "
    "quality string, read_len int"
)


def parse_fastq_bytes(data: bytes, chunk: str) -> pd.DataFrame:
    """Parse one (possibly gzipped) FASTQ payload into read records.
    Tolerant of trailing blank lines; malformed tails are dropped (the
    reference's badLines posture, SamRegionsParser.scala:71-74)."""
    empty = pd.DataFrame(
        columns=["chunk", "read_idx", "read_name", "sequence", "quality", "read_len"]
    )
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError, zlib.error):
            # corrupted chunk: skip it, don't abort the job (the
            # reference's badLines tolerance, SamRegionsParser.scala:71-74
            # — surface counts via observe() on the result if needed)
            return empty
    lines = data.decode("utf-8", errors="replace").split("\n")
    out = []
    i, idx = 0, 0
    while i + 3 < len(lines):
        name, seq, plus, qual = lines[i : i + 4]
        if name.startswith("@") and plus.startswith("+"):
            out.append((chunk, idx, name[1:], seq, qual, len(seq)))
            idx += 1
        i += 4
    return pd.DataFrame(
        out,
        columns=["chunk", "read_idx", "read_name", "sequence", "quality", "read_len"],
    )


def read_fastq_chunks(spark: SparkSession, path: str) -> DataFrame:
    """Chunk files → typed `reads` DataFrame. One input row per file
    (binaryFile source), fanned out to records via mapInPandas."""
    files = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                yield parse_fastq_bytes(bytes(content), p.rsplit("/", 1)[-1])

    return files.select("path", "content").mapInPandas(decode, schema=READ_SCHEMA)
