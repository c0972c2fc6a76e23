"""Dev: pooled-vs-single native-wire ingest slope (PLANS §24).

Mirrors the reference's ingest benchmark harness
(crates/tests_integ/benches/bench_ingestion.rs:6-40: 12 pooled
connections, LZ4 native blocks, `partition by rem(a, 100)`), measuring
rows/s into an ENGINE=Buffer alias over the threaded native server at
1 vs 12 connections, plus a count+checksum oracle afterwards.

Run: python scripts_dev_ingest_pool.py [rows_per_block [n_blocks]]
"""
import sys
import time

from pyspark.sql import SparkSession


def main() -> int:
    rows_per = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tensorbase_spark.engine import TensorBaseEngine
    from tensorbase_spark.sources.chnative import (
        NativeClientPool, serve_native,
    )

    eng = TensorBaseEngine(spark)
    # a previous run's catalog may be gone while its managed-table dirs
    # remain — clear the location physically (the _fresh_engine pattern)
    import shutil

    spark.sql("DROP DATABASE IF EXISTS ingest_pool_db CASCADE")
    shutil.rmtree("spark-warehouse/ingest_pool_db.db", ignore_errors=True)
    eng.sql("create database ingest_pool_db")
    eng.sql("use ingest_pool_db")
    srv, port = serve_native(eng)
    total = rows_per * n_blocks

    def batches():
        out = []
        for b in range(n_blocks):
            base = b * rows_per
            out.append([
                ("a", "Int64", list(range(base, base + rows_per))),
                ("b", "Int64", [(base + i) % 100
                                for i in range(rows_per)]),
            ])
        return out

    results = {}
    try:
        for n_conn, comp in ((1, True), (12, True), (1, False),
                             (12, False)):
            eng.sql("drop table if exists pt")
            eng.sql("drop table if exists pbuf")
            eng.sql(
                "create table pt (a Int64, b Int64) "
                "partition by rem(a, 100)"
            )
            eng.sql(
                "create table pbuf (a Int64, b Int64) ENGINE = Buffer("
                "currentDatabase(), pt, 16, 10, 100, 8, 4096, "
                "1000000, 10000000)"
            )
            data = batches()
            t0 = time.perf_counter()
            with NativeClientPool(
                port=port, n=n_conn, compression=comp,
            ) as pool:
                pool.insert_batches("pbuf", data)
            eng.sql("optimize table pbuf")
            dt = time.perf_counter() - t0
            got = eng.sql(
                "select count(*) as n, cast(sum(a) as bigint) as s "
                "from pt"
            ).collect()[0]
            ok = (got.n, got.s) == (total, total * (total - 1) // 2)
            results[(n_conn, comp)] = (dt, total / dt, ok)
            print(
                f"conns={n_conn:2d} lz4={int(comp)}  rows={total}  "
                f"wall={dt:.2f}s  rate={total / dt / 1e6:.3f} Mrows/s  "
                f"oracle_ok={ok}"
            )
    finally:
        srv.shutdown()
        srv.server_close()
    for comp in (True, False):
        r1, r12 = results[(1, comp)][1], results[(12, comp)][1]
        print(f"speedup 12-conn vs 1-conn (lz4={int(comp)}): "
              f"{r12 / r1:.2f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
