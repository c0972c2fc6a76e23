"""Every registry query with an oracle must hash-match DuckDB at sf0.001.

This is a local replica of the driver's CORRECTNESS gate (row count + sorted
column names + order-insensitive value hash).  The driver runs the same
procedure at sf0.01; sf0.001 keeps the suite fast for in-loop iteration.

r15 (VERDICT r14 #2 — the 43-minute suite outran the driver's window, so
tests_ok read false with zero failures): the sweep now runs STATELESS
queries (pure reads of the fixture parquet — dialect scalars, TPC-H,
text/dedup/similarity/corpus transforms) through a small thread pool,
chunked so failures still name the query.  Spark's scheduler runs
concurrent jobs from driver threads natively (optimization guide §2.6) and
each worker thread holds its own DuckDB connection.  Queries with shared
mutable state (engine DDL/catalog, wire doors, streaming checkpoints,
source-file fixtures: tags engine/sources/wire/streaming) keep the
sequential one-test-per-query form — concurrency there could race on
catalog or filesystem state and manufacture flakes.  Coverage is
IDENTICAL: every oracle-backed query still passes through compare_query."""

from __future__ import annotations

import pytest

from tensorbase_spark.oracle import compare_query, duckdb_connection
from tensorbase_spark.queries import registry

SF0001 = "/root/testdata/sf0.001"

_REG = registry()
_WITH_ORACLE = sorted(name for name, q in _REG.items() if q.oracle is not None)
_ROWS_ONLY = sorted(name for name, q in _REG.items() if q.oracle is None)

# tags whose queries mutate shared state (engine catalog/warehouse, wire
# servers, streaming checkpoints, written source files) — never threaded
_STATEFUL_TAGS = {"engine", "sources", "wire", "streaming"}
_SEQ = [n for n in _WITH_ORACLE if set(_REG[n].tags) & _STATEFUL_TAGS]
_PAR = [n for n in _WITH_ORACLE if not (set(_REG[n].tags) & _STATEFUL_TAGS)]
_N_CHUNKS = 8
_N_THREADS = 4


def _check_one(spark, con, name: str) -> list[str]:
    q = _REG[name]
    r = compare_query(spark, con, name, q.fn, q.oracle, SF0001)
    errs = []
    if r.spark_rows != r.oracle_rows:
        errs.append(f"row count {r.spark_rows} != {r.oracle_rows}")
    if not r.cols_match:
        errs.append(f"columns {r.spark_cols} != {r.oracle_cols}")
    if not r.hash_match:
        errs.append("value hash mismatch")
    return errs


def _run_chunk(spark, chunk: int) -> list[str]:
    con = duckdb_connection(SF0001)
    bad = []
    for name in _PAR[chunk::_N_CHUNKS]:
        try:
            errs = _check_one(spark, con, name)
        except Exception as e:  # build/compare error — report, don't hang
            errs = [f"{type(e).__name__}: {e}"]
        if errs:
            bad.append(f"{name}: " + "; ".join(errs))
    return bad


_sweep: dict = {}


@pytest.fixture(scope="module", autouse=True)
def _background_sweep(spark):
    """Launch the stateless-query sweep on a small thread pool as soon as
    this module starts, so it overlaps the sequential stateful tests below
    (guide §2.6: concurrent jobs from driver threads back-fill each
    other's stage tails; most of these single-job queries leave almost
    every core idle).  The PAR set touches no engine/wire/streaming state,
    so it cannot race the sequential set; each worker owns a private
    DuckDB connection.  test_oracle_parity_parallel joins and asserts."""
    from concurrent.futures import ThreadPoolExecutor

    ex = ThreadPoolExecutor(max_workers=_N_THREADS)
    _sweep["futures"] = {
        chunk: ex.submit(_run_chunk, spark, chunk) for chunk in range(_N_CHUNKS)
    }
    yield
    ex.shutdown(wait=False, cancel_futures=True)


@pytest.mark.parametrize("name", _SEQ)
def test_oracle_parity(spark, duck, name):
    errs = _check_one(spark, duck, name)
    assert not errs, f"{name}: " + "; ".join(errs)


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


@pytest.mark.parametrize("chunk", range(_N_CHUNKS))
def test_oracle_parity_parallel(chunk):
    """Join one background chunk of the stateless sweep (chunk c holds
    every _N_CHUNKS-th name of the PAR set); failures name the query.
    Defined LAST in the module so every earlier test in this file overlaps
    the pool's wall time."""
    bad = _sweep["futures"][chunk].result(timeout=1800)
    assert not bad, "\n".join(bad)
