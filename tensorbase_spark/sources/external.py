"""Table functions and external sources (SURVEY §2.2).

- numbers(N): the reference parses a numbers() table function but never wires
  it, creating a real system.numbers table instead (crates/lang/src/bql.pest:349-353,
  crates/runtime/src/mgmt.rs:237-242).  Spark's native equivalent is range().
- remote('addr', db.table, 'user', 'pass'): federated read over ClickHouse or
  MySQL (grammar bql.pest:133-139; exec crates/runtime/src/read.rs:151-228,
  crates/engine/src/remote.rs:8,49).  Spark-native: the JDBC datasource, which
  also pushes filters/projections down to the remote — more than the
  reference's full-scatter-then-concat.  Exercised genuinely against embedded
  Derby (`jdbc:derby:` — a real JDBC database that ships inside Spark's own
  classpath); ClickHouse/MySQL URLs work the same way once their driver jar
  is on spark.jars.  `local:` is a loopback scheme that serves the same call
  path from the session catalog for tests.
- read_csv / read_ndjson: explicit-BQL-schema file ingestion — the Spark
  counterpart of the fork's CsvExec/NdJsonExec file sources the reference
  never routes to (physical_plan/file_format/{csv,json}.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tensorbase_spark.types import parse_bql_type


def numbers(spark: SparkSession, n: int) -> DataFrame:
    """numbers(N): one column `number`, 0..N-1.  spark.range is a parallel
    synthetic scan (splittable by range), matching system.numbers semantics."""
    return spark.range(n).select(F.col("id").alias("number"))


def bql_schema(cols: list[tuple[str, str]]) -> T.StructType:
    """[(name, BqlType)] -> StructType via the §1.2 type mapping."""
    fields = []
    for name, bt in cols:
        p = parse_bql_type(bt)
        fields.append(T.StructField(name, p.spark_type, p.nullable))
    return T.StructType(fields)


def read_csv(
    spark: SparkSession, path: str, cols: list[tuple[str, str]], **options
) -> DataFrame:
    """CSV ingestion with an explicit declared schema — never inferred,
    mirroring the reference's fixed-schema model (SURVEY §1.1)."""
    return spark.read.options(**options).csv(path, schema=bql_schema(cols))


def read_ndjson(
    spark: SparkSession, path: str, cols: list[tuple[str, str]], **options
) -> DataFrame:
    return spark.read.options(**options).json(path, schema=bql_schema(cols))


def remote(
    spark: SparkSession,
    addr: str,
    table: str,
    user: str = "",
    password: str = "",
    driver: str | None = None,
) -> DataFrame:
    """remote('addr', db.table, 'user', 'pass') — federated table read.

    addr forms:
      'jdbc:mysql://host:3306/db'        -> JDBC (needs a driver jar on the
                                            classpath; raises a clear error
                                            otherwise)
      'jdbc:clickhouse://host:8123/db'   -> JDBC via the ClickHouse driver
      'local:'                           -> loopback: serves spark.table(table),
                                            exercising the same call path
                                            without a network (test mode)
    """
    if addr.startswith("local:"):
        return spark.table(table)
    if not addr.startswith("jdbc:"):
        raise ValueError(f"unsupported remote address: {addr!r}")
    reader = (
        spark.read.format("jdbc")
        .option("url", addr)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
    )
    if driver:
        reader = reader.option("driver", driver)
    try:
        return reader.load()
    except Exception as e:  # driver jar missing in this container
        raise RuntimeError(
            f"remote({addr!r}) needs the JDBC driver jar on spark.jars: {e}"
        ) from e


def read_avro(spark: SparkSession, path: str, cols: list[tuple[str, str]] | None = None):
    """Avro ingestion (the fork's AvroExec, physical_plan/file_format/avro.rs:39
    — which the reference never routes to either).  Spark's avro datasource is
    an external module; this container ships no spark-avro jar, so the reader
    raises a clear error until one is on spark.jars.packages."""
    reader = spark.read
    if cols is not None:
        reader = reader.schema(bql_schema(cols))
    try:
        return reader.format("avro").load(path)
    except Exception as e:
        raise RuntimeError(
            "read_avro needs the spark-avro module on the classpath "
            "(spark.jars.packages=org.apache.spark:spark-avro_2.13:<version>)"
        ) from e
