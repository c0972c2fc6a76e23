"""Every registry query with an oracle must hash-match DuckDB at sf0.001.

This is a local replica of the driver's CORRECTNESS gate (row count + sorted
column names + order-insensitive value hash).  The driver runs the same
procedure at sf0.01; sf0.001 keeps the suite fast for in-loop iteration."""

from __future__ import annotations

import pytest

from tensorbase_spark.oracle import compare_query
from tensorbase_spark.queries import registry

SF0001 = "/root/testdata/sf0.001"

_REG = registry()
_WITH_ORACLE = sorted(name for name, q in _REG.items() if q.oracle is not None)
_ROWS_ONLY = sorted(name for name, q in _REG.items() if q.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    q = _REG[name]
    r = compare_query(spark, duck, name, q.fn, q.oracle, SF0001)
    assert r.spark_rows == r.oracle_rows, f"{name}: row count {r.spark_rows} != {r.oracle_rows}"
    assert r.cols_match, f"{name}: columns {r.spark_cols} != {r.oracle_cols}"
    assert r.hash_match, f"{name}: value hash mismatch"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    """Approximate operators (no SQL oracle): must run and return a stable
    schema; value-level quality bounds live in test_pipeline.py."""
    df = _REG[name].fn(spark, SF0001)
    assert df.columns, name
    assert df.count() >= 0
