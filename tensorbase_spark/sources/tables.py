"""Loaders for the driver's synthetic TPC-H-ish tables (TESTDATA.md).

The reference's scan path mmaps only the referenced (column, partition) files
and registers them as an in-memory table (crates/engine/src/datafusions.rs:58-188).
Spark's equivalent — and the reason no custom scan code exists here — is the
vectorized Parquet reader + Catalyst column pruning + predicate pushdown:
only referenced columns and row-groups passing min/max are read.  At 100 TB
these tables would be directory-partitioned (see catalog.py); the flat
single-file layout is the driver's fixture format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast when joined against a
# fact table.  At sf1 TPC-H proportions: region 5, nation 25, supplier 100/sf,
# part 20k/sf, customer 15k/sf rows — all << the 10 MB default broadcast
# threshold until very large sf; lineitem/orders/events/documents are fact-side.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def parquet_num_rows(sf_dir: str, name: str) -> int:
    """Exact row count from the parquet FOOTER — a metadata read, no Spark
    job.  This is the fixture-layout stand-in for catalog statistics: at
    100 TB the corpus size that parameter auto-scaling needs (ANN centroid
    counts, LSH widths) comes from table stats, never a count scan."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):  # Spark-written layout: a directory of parts
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def parquet_array_dim(sf_dir: str, name: str, col: str) -> int:
    """Element count of an array column's first non-null cell, read
    driver-side with pyarrow — the fixture stand-in for catalog schema
    metadata (embedding width), replacing a per-query Spark first() job
    (r14)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        # every part file is probed before giving up: the first (sorted)
        # part's column can legitimately be all-null while later parts
        # hold real cells (ADVICE r14)
        parts = [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
    else:
        parts = [path]
    for part in parts:
        for batch in pq.ParquetFile(part).iter_batches(
            columns=[col], batch_size=64
        ):
            for cell in batch.column(0):
                if cell.is_valid:
                    return len(cell)
    raise ValueError(f"{name}.{col}: no non-null array cell found")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Fixture generations vary: ts has been parquet TIMESTAMP(NANOS)
        # (read as a nanos long under spark.sql.legacy.parquet.nanosAsLong)
        # and timestamp[us] with isAdjustedToUTC=false (read as
        # TIMESTAMP_NTZ).  Normalize both to TIMESTAMP; session TZ is pinned
        # UTC so the NTZ cast preserves the stored wall-clock instant and
        # matches DuckDB's reading of the same file.
        from pyspark.sql import functions as F, types as T

        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (idempotent) and return the dict.

    SQL-form queries use these views; DataFrame-form queries use the dict.
    """
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
