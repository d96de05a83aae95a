"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``sparkga1_spark`` package; this file is the
thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.2) on /root/testdata/sf0.001."""
    from sparkga1_spark.plans.registry import get
    from sparkga1_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    fn, _ = get("flagship_region_stats")
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from sparkga1_spark.plans.registry import all_queries
    from sparkga1_spark.session import apply_runtime_confs

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from sparkga1_spark.operators.cache import release_tracked

            apply_runtime_confs(spark)
            # free the previous query's tracked caches (its action has
            # already run by the time the driver builds the next query),
            # so a full-registry gate run holds at most one query's
            # working set in executor memory
            release_tracked()
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from sparkga1_spark.plans.registry import all_oracles

    return all_oracles()
