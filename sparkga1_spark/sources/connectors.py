"""Optional table-format connectors (Delta Lake / Iceberg / Hudi) behind
import-guards.

The v1 image ships no lakehouse jars; these helpers detect availability
at call time and fail with an actionable message instead of a Py4J
stack. When the jars are present (cluster deployments), the same calls
work unchanged — the engine's operators are format-agnostic because
they only see DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _has_format(spark: SparkSession, fmt: str, probe_path: str = "/nonexistent") -> bool:
    try:
        spark.read.format(fmt).load(probe_path)
        return True  # pragma: no cover - jars present
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # Polarity: only the MISSING-DATA-SOURCE error means "no jars";
        # any OTHER failure (missing path, NoSuchTable, catalog errors)
        # proves the format class resolved and the connector is usable.
        # Allow-listing path errors instead would misclassify connectors
        # whose missing-path message differs (e.g. Iceberg's
        # NoSuchTableException) as absent and block working deployments.
        return not (
            "Failed to find data source" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
            or "ClassNotFoundException" in msg
        )


def read_table(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    """Read a delta/iceberg/hudi/avro table if the connector is on the
    classpath; raise a clear error otherwise. avro is in the guarded
    set because Spark ships it as an EXTERNAL built-in module
    (spark-avro jar, absent from this image — probed at session
    startup, not assumed)."""
    if fmt not in ("delta", "iceberg", "hudi", "avro"):
        return spark.read.format(fmt).load(path)
    if not _has_format(spark, fmt):
        raise NotImplementedError(
            f"{fmt} connector jars are not on the classpath in this "
            f"environment; add the spark-{fmt} package at spark-submit "
            "time — no engine code changes needed"
        )
    return spark.read.format(fmt).load(path)  # pragma: no cover
