"""Shared fixtures: one tuned local SparkSession per test session, plus the
driver's fixture dirs (TESTDATA.md).  Mirrors the reference's test shape —
spin the engine once, run many SQL assertions against it
(crates/tests_integ/tests/sanity_checks.rs)."""

from __future__ import annotations

import pytest

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from tensorbase_spark.session import get_spark

    s = get_spark("tensorbase_tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    from tensorbase_spark.oracle import duckdb_connection

    return duckdb_connection(SF0001)
