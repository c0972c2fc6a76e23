"""Measured reproduction of the reference's INGEST benchmark shape.

Reference harness: crates/tests_integ/benches/bench_ingestion.rs:6-40 —
512 inserts of a 256Ki-row block (a = 0..262143, b = 2a) into
``test_tab(a UInt64, b UInt64) partition by rem(a,100)`` over a
12-connection LZ4 native-block pool, then ``sum(a), sum(b)`` verifies no
block was lost.  README's headline claims ~2x ClickHouse on this shape.

Spark mapping, two honest grains:
- BLOCK-FAITHFUL: engine.insert_df of the same 256Ki-row block, N times —
  the reference's arrival pattern.  Spark pays JVM job-submission + 100
  dynamic partition dirs per block, a per-block overhead the native
  engine does not have; measured on a 32-block sample.
- BULK: ONE ``insert into ... select id, id*2 from range(134217728)`` —
  Spark's natural ingest grain for the same 134M logical rows (the shape
  a Spark user actually runs; at 100 TB ingest arrives as files/streams,
  not 256Ki-row RPCs).

Both verify the reference's own sum check.  Results recorded in
PLANS.md §10.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from tensorbase_spark.engine import TensorBaseEngine
from tensorbase_spark.session import get_spark

NROWS_BLK = 256 * 1024
NUM_INS = 512  # reference total: 512 blocks = 134,217,728 rows
SAMPLE_BLOCKS = 32


def main() -> None:
    spark = get_spark("ingest_shape")
    eng = TensorBaseEngine(spark)
    eng.sql("create database if not exists ing_db")
    eng.sql("use ing_db")

    # --- block-faithful sample -------------------------------------------
    eng.sql("drop table if exists test_tab")
    eng.sql(
        "CREATE TABLE test_tab(a UInt64, b UInt64) PARTITION BY rem(a,100)"
    )
    block = spark.range(NROWS_BLK).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    )
    block.count()  # warm the plan
    t0 = time.perf_counter()
    for _ in range(SAMPLE_BLOCKS):
        eng.insert_df("ing_db.test_tab", block)
    block_elapsed = time.perf_counter() - t0
    per_block = block_elapsed / SAMPLE_BLOCKS
    got = eng.sql("select sum(a) as sa, sum(b) as sb, count(*) as n from test_tab").collect()[0]
    exp_a = NROWS_BLK * (NROWS_BLK - 1) // 2 * SAMPLE_BLOCKS
    assert (int(got.sa), int(got.sb), got.n) == (
        exp_a, 2 * exp_a, NROWS_BLK * SAMPLE_BLOCKS
    ), got
    print(
        f"block-faithful: {SAMPLE_BLOCKS} x {NROWS_BLK} rows in "
        f"{block_elapsed:.1f}s = {per_block*1000:.0f} ms/block, "
        f"{NROWS_BLK*SAMPLE_BLOCKS/block_elapsed/1e6:.2f} Mrows/s "
        f"(512-block extrapolation: {per_block*NUM_INS:.0f}s)"
    )

    # --- block-faithful THROUGH the Buffer engine ------------------------
    # The reference's arrival pattern (256Ki-row RPC blocks) lands in a CH
    # Buffer table in any real deployment; the engine's Buffer alias parks
    # blocks in memory and flushes num_layers of them as ONE partitioned
    # write — amortizing the per-block JVM job + dynamic-partition commit
    # that dominates the unbuffered number above.
    eng.sql("drop table if exists test_buf")
    eng.sql(
        "CREATE TABLE test_buf(a UInt64, b UInt64) ENGINE = "
        "Buffer(currentDatabase(), test_tab, 8, 10, 100, 10000, 1000000, "
        "10000000, 100000000)"
    )
    t0 = time.perf_counter()
    for _ in range(SAMPLE_BLOCKS):
        eng.insert_df("ing_db.test_buf", block)
    eng.sql("optimize table test_buf")  # flush the tail
    buf_elapsed = time.perf_counter() - t0
    per_block_buf = buf_elapsed / SAMPLE_BLOCKS
    got = eng.sql(
        "select sum(a) as sa, count(*) as n from test_tab"
    ).collect()[0]
    exp_a2 = NROWS_BLK * (NROWS_BLK - 1) // 2 * SAMPLE_BLOCKS * 2
    assert (int(got.sa), got.n) == (exp_a2, NROWS_BLK * SAMPLE_BLOCKS * 2), got
    print(
        f"block via Buffer(8 layers): {SAMPLE_BLOCKS} x {NROWS_BLK} rows in "
        f"{buf_elapsed:.1f}s = {per_block_buf*1000:.0f} ms/block amortized, "
        f"{NROWS_BLK*SAMPLE_BLOCKS/buf_elapsed/1e6:.2f} Mrows/s"
    )
    eng.sql("drop table test_buf")

    # --- bulk grain, same 134M logical rows ------------------------------
    eng.sql("drop table if exists test_tab")
    eng.sql(
        "CREATE TABLE test_tab(a UInt64, b UInt64) PARTITION BY rem(a,100)"
    )
    total = NROWS_BLK * NUM_INS
    t0 = time.perf_counter()
    eng.sql(
        f"insert into test_tab select id % {NROWS_BLK} as a, "
        f"(id % {NROWS_BLK}) * 2 as b from range({total})"
    )
    bulk_elapsed = time.perf_counter() - t0
    got = eng.sql(
        "select sum(a) as sa, sum(b) as sb, count(*) as n from test_tab"
    ).collect()[0]
    exp_a = NROWS_BLK * (NROWS_BLK - 1) // 2 * NUM_INS
    assert (int(got.sa), int(got.sb), got.n) == (exp_a, 2 * exp_a, total), got
    print(
        f"bulk: {total} rows in {bulk_elapsed:.1f}s = "
        f"{total/bulk_elapsed/1e6:.2f} Mrows/s"
    )

    # --- bulk grain under the reinterpret storage mode --------------------
    # SET uint64_storage='reinterpret' stores UInt64 as Int64 two's-
    # complement (types.ParsedType.reinterp): same logical rows, plain
    # INT64 parquet encode — measures how much of the UInt64 tax the mode
    # recovers vs the Int64 floor below.
    eng.sql("drop table if exists test_tab")
    eng.sql("set uint64_storage = 'reinterpret'")
    eng.sql(
        "CREATE TABLE test_tab(a UInt64, b UInt64) PARTITION BY rem(a,100)"
    )
    eng.sql("set uint64_storage = 'decimal'")
    t0 = time.perf_counter()
    eng.sql(
        f"insert into test_tab select id % {NROWS_BLK} as a, "
        f"(id % {NROWS_BLK}) * 2 as b from range({total})"
    )
    ri_elapsed = time.perf_counter() - t0
    got = eng.sql(
        "select sum(a) as sa, sum(b) as sb, count(*) as n from test_tab"
    ).collect()[0]
    assert (int(got.sa), int(got.sb), got.n) == (exp_a, 2 * exp_a, total), got
    print(
        f"bulk reinterpret: {total} rows in {ri_elapsed:.1f}s = "
        f"{total/ri_elapsed/1e6:.2f} Mrows/s"
    )

    # --- Int64 floor (the encode-tax denominator, PLANS.md §10) -----------
    eng.sql("drop table if exists test_tab")
    eng.sql(
        "CREATE TABLE test_tab(a Int64, b Int64) PARTITION BY rem(a,100)"
    )
    t0 = time.perf_counter()
    eng.sql(
        f"insert into test_tab select id % {NROWS_BLK} as a, "
        f"(id % {NROWS_BLK}) * 2 as b from range({total})"
    )
    i64_elapsed = time.perf_counter() - t0
    print(
        f"bulk int64 floor: {total} rows in {i64_elapsed:.1f}s = "
        f"{total/i64_elapsed/1e6:.2f} Mrows/s; "
        f"reinterp/int64 = {ri_elapsed/i64_elapsed:.2f}x, "
        f"decimal/int64 = {bulk_elapsed/i64_elapsed:.2f}x"
    )
    eng.sql("drop database if exists ing_db")


if __name__ == "__main__":
    main()
