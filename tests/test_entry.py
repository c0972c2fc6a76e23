"""Driver-contract smoke tests for __spark_entry__ (the interface the
per-round harness calls)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert len(qs) >= 60
    # every oracle key must be a registered query
    assert set(osql) <= set(qs)
    # the vast majority must carry a SQL oracle (driver's strong check)
    assert len(osql) >= 0.85 * len(qs)


def test_all_queries_return_dataframe(spark):
    SF0001 = "/root/testdata/sf0.001"

    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, SF0001)
        assert df.columns, f"{name} returned no columns"


def test_read_avro_missing_path_error(spark):
    """The pure-Python Avro fallback (no spark-avro jar in this build) must
    fail fast driver-side on a missing path, not ship a doomed job."""
    import pytest
    from tensorbase_spark.sources import external

    with pytest.raises(FileNotFoundError):
        external.read_avro(spark, "/tmp/nonexistent.avro")
