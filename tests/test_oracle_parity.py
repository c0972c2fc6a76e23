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


def test_oracle_gate_rejects_array_outputs(spark, duck):
    """The driver's pandas canonicalizer cannot hash ARRAY/MAP cells
    (TypeError: unhashable type 'numpy.ndarray' — cost 4 driver slots in
    BOTH r3 and r4).  The local gate must be driver-faithful: compare_query
    rejects any oracle-backed query whose output schema has an
    ArrayType/MapType column, BEFORE collecting.  Because
    test_oracle_parity sweeps the full registry through compare_query,
    this guard makes an unhashable output schema un-shippable."""

    def bad_fn(s, _sf):
        return s.sql("select array(1, 2) as a, 1 as b")

    with pytest.raises(TypeError, match="ArrayType/MapType"):
        compare_query(spark, duck, "bad", bad_fn, "SELECT 1 AS b", SF0001)

    def bad_map(s, _sf):
        return s.sql("select map('k', 1) as m")

    with pytest.raises(TypeError, match="ArrayType/MapType"):
        compare_query(spark, duck, "badmap", bad_map, "SELECT 1 AS m", SF0001)


def test_oracle_gate_rejects_decimal_outputs(spark, duck):
    """The driver str()s Decimal cells and engines render scales
    differently (Spark Decimal('24900') vs DuckDB Decimal('24900.0') —
    caught pre-ship on ch_everyday_funcs5): DecimalType output columns are
    rejected before collecting, like containers."""

    def f(s, _sf):
        return s.sql("select cast(1.5 as decimal(10, 2)) as d")

    with pytest.raises(TypeError, match="DecimalType"):
        compare_query(spark, duck, "dec", f, "SELECT 1.5 AS d", SF0001)


def test_oracle_gate_rejects_dtype_skew(spark, duck):
    """DuckDB's integer sum returns HUGEINT, which pandas (the driver's
    canonicalization path) materializes as float64 — against Spark's int64
    that hashes 499.0 vs 499 with rows and schema matching (the exact
    ch_everyday_funcs3 r4+r5 driver failures).  fetchall() hides the skew
    (Python ints both sides), so compare_query pulls the oracle's pandas
    dtypes and rejects any int-vs-float kind mismatch BEFORE hashing;
    an explicit CAST(... AS BIGINT) in the oracle passes."""

    def f(s, _sf):
        return s.sql("select cast(3 as bigint) as n")

    with pytest.raises(TypeError, match="HUGEINT"):
        compare_query(
            spark, duck, "skew", f,
            "SELECT sum(CAST(x AS TINYINT)) AS n FROM (VALUES (1),(1),(1)) t(x)",
            SF0001,
        )
    r = compare_query(
        spark, duck, "cast_ok", f,
        "SELECT CAST(sum(CAST(x AS TINYINT)) AS BIGINT) AS n "
        "FROM (VALUES (1),(1),(1)) t(x)",
        SF0001,
    )
    assert r.ok


def test_norm_cell_rejects_containers():
    """value_hash must also crash on container cells coming from the DuckDB
    side (lists in fetchall rows), exactly like the driver would."""
    from tensorbase_spark.oracle import value_hash

    with pytest.raises(TypeError, match="unhashable container"):
        value_hash([(1, [1, 2])], ["a", "b"])


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    """Approximate operators (no SQL oracle): must run and return a stable
    schema; value-level quality bounds live in test_pipeline.py."""
    df = _REG[name].fn(spark, SF0001)
    assert df.columns, name
    assert df.count() >= 0
