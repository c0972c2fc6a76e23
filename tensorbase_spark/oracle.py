"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a query's Spark form and its DuckDB oracle on the same parquet tables,
then compares row count, column names, and an order-insensitive value hash —
the same procedure CORRECTNESS_r{N}.json records.  Used by tests/ and by
`python -m tensorbase_spark.oracle` for a fast full sweep while iterating.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass

import duckdb

from tensorbase_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v) -> str:
    """Driver-faithful cell normalizer.

    The driver canonicalizes with pandas ``sort_values`` + ``factorize``,
    which CANNOT hash list/array/dict cells (``TypeError: unhashable type:
    'numpy.ndarray'`` — cost 4 driver slots in r3 AND r4).  This replica
    therefore REJECTS container cells instead of leniently serializing
    them: an oracle-backed query with an ARRAY/MAP output must stringify
    it (arrayStringConcat ↔ array_to_string; 1e6-scaled ints for floats)."""
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple, dict, set)):
        raise TypeError(
            "unhashable container cell — the driver's pandas canonicalizer "
            "cannot hash ARRAY/MAP outputs; serialize to a string in both "
            f"the Spark query and the oracle (got {type(v).__name__}: {v!r})"
        )
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(round(v, 9))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    return str(v)


def _norm_cell_lenient(v) -> str:
    """diff_sample-only variant that serializes containers for debugging."""
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell_lenient(x) for x in v) + "]"
    return _norm_cell(v)


def assert_driver_hashable(schema, name: str) -> None:
    """Fail fast on any output column the driver canonicalizer cannot hash
    (ArrayType/MapType — numpy arrays / dicts in pandas).  Applied to every
    oracle-backed query by compare_query, which tests/test_oracle_parity.py
    sweeps over the full registry — so an unhashable output schema can
    never reach the driver again."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType))
    ]
    dec = [
        f.name for f in schema.fields if isinstance(f.dataType, T.DecimalType)
    ]
    if dec:
        # the driver canonicalizer str()s Decimal cells, and cross-engine
        # scale renderings differ (Spark Decimal('24900') vs DuckDB
        # Decimal('24900.0') — found pre-ship on ch_everyday_funcs5 r6):
        # cast the output to DOUBLE (+ round) or BIGINT in BOTH forms
        raise TypeError(
            f"{name}: columns {dec} are DecimalType — the driver str()s "
            "Decimals and engines render scales differently; cast to "
            "DOUBLE (+round) or BIGINT in both the Spark query and oracle"
        )
    if bad:
        raise TypeError(
            f"{name}: columns {bad} are ArrayType/MapType — the driver's "
            "pandas canonicalizer cannot hash them; serialize to strings "
            "(arrayStringConcat / array_to_string, 1e6-scaled ints for floats)"
        )


def value_hash(rows: list[tuple], col_names: list[str]) -> str:
    """Order-insensitive hash with columns sorted by name."""
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    lines = sorted(
        "\x1f".join(_norm_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int
    cols_match: bool
    hash_match: bool
    spark_cols: tuple
    oracle_cols: tuple

    @property
    def ok(self) -> bool:
        return self.spark_rows == self.oracle_rows and self.cols_match and self.hash_match


def _spark_numeric_kind(dt) -> str | None:
    """'i' for integer-family Spark types, 'f' for float-family, else None."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "i"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "f"
    return None


def assert_dtype_faithful(sdf_schema, con, oracle: str, name: str) -> None:
    """Fail on any cross-side int-vs-float dtype skew the DRIVER would see.

    The driver canonicalizes both sides through pandas.  DuckDB's integer
    ``sum`` returns HUGEINT, which pandas materializes as **float64** —
    against Spark's int64 that hashes ``499.0`` vs ``499`` (the exact
    `ch_everyday_funcs3` r4+r5 failure).  ``fetchall()`` hides this (Python
    ints both sides), so this check pulls the oracle's dtypes via
    ``con.execute(oracle).df()`` — the driver's own path — and rejects any
    column that is integer-kind on one side and float-kind on the other.
    Columns containing NULLs are skipped (pandas degrades nullable ints to
    float64 on BOTH sides, which is not a skew)."""
    odf = con.execute(oracle).df()
    spark_kind = {f.name: _spark_numeric_kind(f.dataType) for f in sdf_schema.fields}
    for col in odf.columns:
        sk = spark_kind.get(col)
        if sk is None:
            continue
        k = odf[col].dtype.kind  # 'i'/'u' int, 'f' float, else skip
        ok = "i" if k in ("i", "u") else ("f" if k == "f" else None)
        if ok is None or ok == sk:
            continue
        if odf[col].isna().any():
            continue  # nullable-int degradation, same on both sides
        raise TypeError(
            f"{name}: column '{col}' is {'int' if sk == 'i' else 'float'}-kind "
            f"in Spark but {odf[col].dtype} in DuckDB-via-pandas (the driver's "
            "path) — cast the oracle (e.g. CAST(sum(...) AS BIGINT); DuckDB "
            "integer sums are HUGEINT -> pandas float64) so dtypes agree"
        )


def compare_query(spark, con, name: str, fn, oracle: str, sf_dir: str) -> CompareResult:
    sdf = fn(spark, sf_dir)
    assert_driver_hashable(sdf.schema, name)
    assert_dtype_faithful(sdf.schema, con, oracle, name)
    spark_cols = [f.name for f in sdf.schema.fields]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = con.execute(oracle)
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()

    cols_match = sorted(spark_cols) == sorted(oracle_cols)
    hm = cols_match and value_hash(spark_rows, spark_cols) == value_hash(
        oracle_rows, oracle_cols
    )
    return CompareResult(
        name, len(spark_rows), len(oracle_rows), cols_match, hm,
        tuple(spark_cols), tuple(oracle_cols),
    )


def diff_sample(spark, con, name: str, fn, oracle: str, sf_dir: str, limit: int = 6):
    """Debug helper: first differing normalized lines from each side."""
    sdf = fn(spark, sf_dir)
    spark_cols = [f.name for f in sdf.schema.fields]
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()

    def lines(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(
            "\x1f".join(_norm_cell_lenient(r[i]) for i in order) for r in rows
        )

    sl, ol = lines(s_rows, spark_cols), lines(o_rows, o_cols)
    only_s = [l for l in sl if l not in set(ol)][:limit]
    only_o = [l for l in ol if l not in set(sl)][:limit]
    return only_s, only_o


def main() -> int:
    import argparse
    import time

    from tensorbase_spark.queries import registry
    from tensorbase_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"))
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--diff", action="store_true", help="print diff sample for failures")
    args = ap.parse_args()

    spark = get_spark("oracle_parity")
    con = duckdb_connection(args.sf_dir)
    reg = registry()
    failures = 0
    for name, q in reg.items():
        if args.only and name not in args.only:
            continue
        t0 = time.time()
        if q.oracle is None:
            n = q.fn(spark, args.sf_dir).count()
            print(f"  {name:28s} rows-only  rows={n}  ({time.time()-t0:.1f}s)")
            continue
        try:
            r = compare_query(spark, con, name, q.fn, q.oracle, args.sf_dir)
        except Exception as e:
            print(f"✗ {name:28s} ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        status = "✓" if r.ok else "✗"
        print(
            f"{status} {name:28s} rows={r.spark_rows}/{r.oracle_rows} "
            f"cols={'ok' if r.cols_match else f'{r.spark_cols}!={r.oracle_cols}'} "
            f"hash={'ok' if r.hash_match else 'MISMATCH'}  ({time.time()-t0:.1f}s)"
        )
        if not r.ok:
            failures += 1
            if args.diff:
                s, o = diff_sample(spark, con, name, q.fn, q.oracle, args.sf_dir)
                print("   spark-only:", s)
                print("   oracle-only:", o)
    print(f"{'PASS' if failures == 0 else 'FAIL'} ({failures} failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
