"""The main correctness gate, run at sf0.001 for speed: every registered
query with an oracle must match DuckDB on row count, column names, and
order-insensitive values (mirrors the driver's CORRECTNESS check)."""

from __future__ import annotations

import pytest

from sparkga1_spark.plans.registry import all_oracles, all_queries
from tools.check import compare


def _cases():
    qs, os_ = all_queries(), all_oracles()
    return [(name, qs[name], os_.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, sf_dir, duck, name, fn, oracle):
    df = fn(spark, sf_dir)
    if oracle is None:
        # rows-only contract: must execute and have a stable schema
        assert df.columns, f"{name}: no columns"
        assert df.count() >= 0
        return
    verdict = compare(name, df, duck, oracle)
    assert verdict == "OK", f"{name}: {verdict}"
